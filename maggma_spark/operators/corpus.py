"""Training-corpus assembly operators — deterministic sampling, sequence
packing, benchmark decontamination.

Beyond-reference capability (BASELINE.json north star): the operations a
100 TB training-data pipeline runs between cleaning/dedup and writing
training shards.

- **deterministic_sample**: content-addressed sampling — keep a row iff
  its md5 bucket falls under the fraction. Unlike `df.sample`, the
  decision is a pure function of the key: reproducible across runs,
  engines, and partitionings (an auditor can recompute membership in
  SQL), and stable under data re-layout.
- **pack_sequences**: assign docs to training-batch bins by cumulative
  token count within coarse hash buckets. The cumsum window runs PER
  BUCKET, so no global sort/single-partition bottleneck: each bucket's
  packing parallelizes independently and bin ids are (bucket, bin).
- **decontaminate**: drop/flag corpus docs sharing any word n-gram with
  a benchmark set (eval-set leakage guard). The benchmark shingle set is
  small — it broadcasts; the corpus side explodes shingles linearly and
  LEFT SEMI joins, so nothing quadratic and no driver materialization.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F


def md5_bucket(col: Column | str, buckets: int = 10_000) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of a key — the
    same expression is computable in any SQL engine. Uses the first 8
    hex chars (32 bits): with 16 bits the `% buckets` residue is visibly
    non-uniform for buckets that don't divide 65536 (~7% relative skew
    at buckets=10000); at 32 bits the skew is < 1e-5."""
    c = F.col(col) if isinstance(col, str) else col
    if not 0 < buckets <= 2 ** 32:
        raise ValueError("buckets must be in (0, 2^32]")
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10) \
        .cast("long") % buckets


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep rows whose md5 bucket < fraction * buckets. Reproducible
    sampling keyed on content, not RNG state or partition layout."""
    keep = int(round(fraction * buckets))
    return df.filter(md5_bucket(key_col, buckets) < keep)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    capacity: int,
    key_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Greedy-by-order sequence packing: within each hash bucket, docs
    (ordered by key) accumulate into bins of ~`capacity` tokens; a doc
    starts a new bin when its predecessor's cumulative total passes a
    capacity boundary. Emits (bucket, bin, key, tokens).

    Scale shape: ONE shuffle (window partitioned by bucket); bins never
    span buckets so packing parallelizes across buckets — no global
    sort. A doc longer than `capacity` overflows its bin (boundary
    binning, not strict first-fit — the next doc still starts a fresh
    bin).
    """
    from pyspark.sql import Window

    bucket = md5_bucket(key_col, num_buckets).alias("bucket")
    w = Window.partitionBy("bucket").orderBy(F.col(key_col).asc())
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.select(bucket, F.col(key_col), F.col(token_col))
        .withColumn("bin",
                    F.floor((cum - F.col(token_col)) / F.lit(capacity))
                    .cast("bigint"))
    )


def _shingle_rows(frame: DataFrame, text_col: str, kc: Optional[str],
                  n: int) -> DataFrame:
    """Arrow-batched shingle explode (shared by decontaminate and
    decontaminate_bloom): the Column-expression form (transform over
    sequence + concat_ws) is interpreted per element and measured 5x
    slower on the corpus side. Tokenize = lower().split(), identical to
    the SQL oracle's normalized split; docs shorter than one full
    shingle emit nothing."""
    cols = ([kc] if kc else []) + [text_col]
    key_t = frame.schema[kc].dataType.simpleString() if kc else None
    out_schema = (f"{kc} {key_t}, __sh string" if kc else "__sh string")

    def mapper(batches):
        import itertools

        import pandas as pd

        for pdf in batches:
            keys_out, sh_out = [], []
            key_iter = pdf[kc] if kc else itertools.repeat(None)
            for key, text in zip(key_iter, pdf[text_col]):
                toks = str(text).lower().split()
                if len(toks) < n:
                    continue
                shset = {" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)}
                if kc:
                    keys_out.extend([key] * len(shset))
                sh_out.extend(shset)
            out = {"__sh": sh_out}
            if kc:
                out = {kc: keys_out, "__sh": sh_out}
            yield pd.DataFrame(out)

    return frame.select(*cols).mapInPandas(mapper, schema=out_schema)


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_words: int = 8,
    mode: str = "drop",
) -> DataFrame:
    """Benchmark decontamination: remove (mode='drop') or flag
    (mode='flag') corpus docs sharing any `shingle_words`-gram with the
    benchmark texts. Docs shorter than one full shingle never match.

    Plan: benchmark shingles (distinct, small) broadcast; corpus
    shingles explode linearly; contaminated keys come from an equi-join
    on the shingle string; the verdict applies via LEFT SEMI/ANTI join
    on the key — no pair blow-up, nothing on the driver.
    """
    bench_sh = F.broadcast(
        _shingle_rows(benchmark, text_col, None, shingle_words).distinct())
    doc_sh = _shingle_rows(df, text_col, key_col, shingle_words)
    contaminated = doc_sh.join(bench_sh, on="__sh").select(key_col).distinct()
    if mode == "flag":
        return df.join(
            contaminated.withColumn("contaminated", F.lit(True)),
            on=key_col, how="left",
        ).fillna({"contaminated": False})
    if mode != "drop":
        raise ValueError("mode must be 'drop' or 'flag'")
    return df.join(contaminated, on=key_col, how="left_anti")


def deterministic_sample_by(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    buckets: int = 10_000,
) -> DataFrame:
    """Stratified deterministic sampling — the corpus-mixing primitive:
    keep each stratum (language, source, quality tier) at its own rate,
    e.g. {"en": 0.5, "de": 0.2}. Strata absent from `fractions` drop
    entirely. Same content-addressed membership as deterministic_sample
    (pure function of the key), so mixes are reproducible and
    per-stratum subsets nest across rates.

    Thresholds are integerized driver-side (`int(round(frac * buckets))`,
    the same rule as deterministic_sample) so the two primitives and an
    integer-threshold SQL oracle agree on membership — comparing against
    the raw double `frac * buckets` can shift the boundary by one bucket
    (0.29 * 10000 == 2899.999...)."""
    thresholds = {k: int(round(v * buckets)) for k, v in fractions.items()}
    mapping = F.create_map(
        *[F.lit(x) for kv in thresholds.items() for x in kv])
    return df.filter(
        md5_bucket(key_col, buckets)
        < F.coalesce(mapping[F.col(strata_col)], F.lit(0)))


def chunk_documents(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into training-window chunks of at most
    `max_tokens` whitespace tokens, with `overlap` tokens carried
    between consecutive chunks (the standard long-document -> context-
    window preparation step).

    Pure JVM plan: tokenize once, generate chunk-start offsets with
    `sequence`, slice with `slice`, explode — no Python, no shuffle at
    all (chunking is embarrassingly row-local; output partitioning
    inherits the scan, which is exactly what a 100 TB chunk-then-write
    job wants). Empty/whitespace docs produce zero chunks.

    Output: (key, chunk_id, chunk_text, n_tokens) with chunk_id counting
    from 0 per document.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    df = (df.select(F.col(key_col).alias("key"), toks.alias("__toks"))
          .withColumn("__n", F.when(F.trim(F.concat_ws(" ", "__toks")) == "",
                                    F.lit(0)).otherwise(F.size("__toks")))
          .filter(F.col("__n") > 0))
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
    return (
        df.select(
            "key", "__toks", "__n",
            F.posexplode(starts).alias("chunk_id", "__start"))
        # drop a trailing window that would be pure overlap of the
        # previous chunk (start >= n means sequence overshoot can't
        # happen; start > 0 and start + overlap >= n means no NEW tokens)
        .filter((F.col("__start") == 0)
                | (F.col("__start") + F.lit(overlap) < F.col("__n")))
        .select(
            "key", "chunk_id",
            F.concat_ws(
                " ", F.slice("__toks", F.col("__start") + 1,
                             F.lit(max_tokens))).alias("chunk_text"),
            F.least(F.lit(max_tokens),
                    F.col("__n") - F.col("__start")).alias("n_tokens"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = 10,
    min_line_chars: int = 1,
) -> DataFrame:
    """Corpus-frequency line filtering (the C4/RefinedWeb boilerplate
    pass): a LINE that appears (normalized) in more than `max_doc_freq`
    DISTINCT documents is boilerplate (cookie banners, nav bars,
    license footers) and is dropped from every document; document
    structure is otherwise preserved (line order kept, line numbering
    via posexplode).

    Scale shape: explode lines (linear), one groupBy on the normalized
    line hash counting DISTINCT docs (map-side partial agg), broadcast-
    friendly anti-join of the (tiny) boilerplate line set back onto the
    exploded frame, re-assemble with an order-preserving
    sort_array(collect_list(struct(pos, line))). Two shuffles total
    (line-hash agg + per-doc regroup); nothing quadratic.

    Output: (key, text, n_lines_kept, n_lines_dropped).
    """
    lines = (
        df.select(F.col(key_col).alias("key"),
                  F.posexplode(F.split(F.col(text_col), "\n"))
                  .alias("pos", "line"))
        .withColumn("__norm", F.trim(F.lower(F.col("line"))))
    )
    eligible = lines.filter(F.length("__norm") >= min_line_chars)
    boiler = (
        eligible.groupBy("__norm")
        .agg(F.countDistinct("key").alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("__norm")
    )
    flagged = lines.join(F.broadcast(boiler.withColumn("__drop", F.lit(True))),
                         on="__norm", how="left")
    kept = flagged.withColumn(
        "__keep", F.col("__drop").isNull() | (F.length("__norm") < min_line_chars))
    return (
        kept.groupBy("key")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(
                        F.when(F.col("__keep"),
                               F.struct("pos", "line")))),
                    lambda s: s["line"])).alias("text"),
            F.sum(F.col("__keep").cast("long")).alias("n_lines_kept"),
            F.sum((~F.col("__keep")).cast("long")).alias("n_lines_dropped"))
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams by DOCUMENT frequency (the
    vocabulary / tokenizer-merge statistic; shingles are per-doc
    distinct). Arrow-batched shingle kernel (the Column higher-order
    expression is interpreted per element and measured ~5x slower, same
    finding as operators/dedup.py), one partial-agg groupBy on the
    gram, then a TakeOrdered top-k (per-partition heap + driver merge —
    no global sort shuffle). Ties break on the gram string so the cut
    is deterministic. Semantics match functions.text.word_shingles
    (docs shorter than n contribute their whole text as one gram; empty
    docs contribute nothing). Output: (ngram, n_docs).
    """
    def mapper(batches):
        import pandas as pd

        for pdf in batches:
            out: list[str] = []
            for text in pdf[text_col]:
                toks = str(text).lower().split()
                if not toks:
                    continue
                if len(toks) < n:
                    out.append(" ".join(toks))
                    continue
                out.extend({" ".join(toks[i:i + n])
                            for i in range(len(toks) - n + 1)})
            yield pd.DataFrame({"ngram": out})

    grams = df.select(text_col).mapInPandas(mapper, schema="ngram string")
    return (grams.groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.col("n_docs").desc(), F.col("ngram").asc())
            .limit(k))


def mix_by_temperature(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    buckets: int = 10_000,
    max_strata: int = 10_000,
):
    """Temperature-based corpus mixing (the multilingual re-balancing
    rule from mBERT/XLM-R: sampling share ~ (n_s/N)^alpha): each
    stratum keeps rate n_s^(alpha-1) normalized so the most-boosted
    stratum stays complete — alpha < 1 up-weights low-resource strata,
    alpha = 1 keeps everything.

    One count aggregate computes the per-stratum rates driver-side
    (scalars); membership is the same content-addressed md5-bucket rule
    as deterministic_sample_by, so the mix is reproducible and
    auditable in SQL. Returns (sampled_df, rates) — rates exposed so
    the mix is loggable/verifiable.

    The per-stratum count collect is bounded by `max_strata` (default
    10k): strata are languages/sources/tiers, inherently low-cardinality
    — a high-cardinality column passed by mistake raises instead of
    silently pulling an unbounded frame onto the driver (same policy as
    the block-size caps in operators/dedup.py).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("need 0 < alpha <= 1")
    # null strata never join the mix — exclude them BEFORE the
    # cardinality check so a column with exactly max_strata real strata
    # plus incidental nulls doesn't spuriously raise
    rows = (df.filter(F.col(strata_col).isNotNull())
            .groupBy(strata_col).count().limit(max_strata + 1).collect())
    if len(rows) > max_strata:
        raise ValueError(
            f"{strata_col!r} has more than max_strata={max_strata} "
            "distinct values — temperature mixing is for low-cardinality "
            "strata (language/source/tier); pick a coarser column or "
            "raise max_strata explicitly")
    counts = {r[0]: r[1] for r in rows}
    if not counts:
        return df.limit(0), {}
    weights = {s: c ** (alpha - 1.0) for s, c in counts.items()}
    mx = max(weights.values())
    rates = {s: w / mx for s, w in weights.items()}
    return deterministic_sample_by(df, key_col, strata_col, rates,
                                   buckets=buckets), rates


def decontaminate_bloom(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_words: int = 8,
    mode: str = "drop",
    bits_per_shingle: int = 16,
    num_probe_hashes: int = 5,
    max_bits: int = 1 << 24,
) -> DataFrame:
    """Bloom-filter decontamination — the ZERO-SHUFFLE scale path.

    `decontaminate` equi-joins corpus shingles against broadcast
    benchmark shingles: correct and exact, but the corpus shingle frame
    still flows through a join. Here the benchmark shingles fold into a
    bit array embedded in the plan as a literal, so the corpus side is
    a single mapInPandas + filter scan — at 100 TB the contamination
    test runs inside the same stage as the read, no exchange at all.

    Guarantees: NO false negatives (every truly contaminated doc is
    flagged — Bloom filters never miss an inserted element); false
    positives at rate ~(1 - e^(-k*n/m))^k, about 0.05% at the default
    16 bits/shingle with k=5. Use mode='flag' + the exact join on the
    flagged subset when FPs must be zero (two-phase: bloom cheap-pass,
    exact join over the tiny flagged set).

    The bit array is `bits_per_shingle * n_shingles` bits (rounded up
    to whole 64-bit words), built driver-side from hashes computed
    SPARK-side (identical `xxhash64` expressions build and probe, so
    there is no Python/JVM hash mismatch). Raises if the benchmark
    would need more than `max_bits` (default 16M bits = 2 MB plan
    literal) — use the join-based decontaminate for huge benchmarks.
    """
    bench_sh = _shingle_rows(benchmark, text_col, None,
                             shingle_words).distinct()
    n_sh = bench_sh.count()
    if n_sh == 0:
        if mode == "flag":
            return df.withColumn("contaminated", F.lit(False))
        return df
    m = ((max(64, n_sh * bits_per_shingle) + 63) // 64) * 64
    if m > max_bits:
        raise ValueError(
            f"benchmark needs {m} bloom bits > max_bits={max_bits}; "
            "use decontaminate() (join-based) for benchmarks this large")

    def idx_sql(i: int) -> str:
        return f"pmod(xxhash64(__sh, {i}), {m}L)"

    # build: the SAME expression text that probes — collected per seed
    probe_rows = bench_sh.select(*[
        F.expr(idx_sql(i)).alias(f"h{i}") for i in range(num_probe_hashes)
    ]).collect()
    words = [0] * (m // 64)
    for r in probe_rows:
        for i in range(num_probe_hashes):
            idx = r[f"h{i}"]
            words[idx >> 6] |= 1 << (idx & 63)
    # two's-complement fold back into signed int64 for the array<bigint>
    # literal (bit 63 set would overflow a Java long otherwise)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    member = " AND ".join(
        f"((shiftright(element_at(__bloom, cast(({idx_sql(i)}) div 64 "
        f"as int) + 1), cast(pmod({idx_sql(i)}, 64) as int)) & 1) = 1)"
        for i in range(num_probe_hashes)
    )
    doc_sh = _shingle_rows(df, text_col, key_col, shingle_words)
    contaminated = (
        doc_sh.withColumn("__bloom", F.lit(words))
        .filter(F.expr(member))
        .select(key_col)
        .distinct()
    )
    if mode == "flag":
        return df.join(
            contaminated.withColumn("contaminated", F.lit(True)),
            on=key_col, how="left",
        ).fillna({"contaminated": False})
    if mode != "drop":
        raise ValueError("mode must be 'drop' or 'flag'")
    return df.join(contaminated, on=key_col, how="left_anti")


def shard_hash(col: Column | str, seed: int = 0) -> Column:
    """60-bit deterministic order hash: md5 of ``seed || ':' || key``,
    first 15 hex chars parsed base-16. 15 chars (not 16) keeps the value
    inside a non-negative BIGINT in every engine — the same expression is
    replayable in ANSI SQL, so shard membership AND order are auditable.
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{seed}:"), c.cast("string"))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global training shuffle + shard assignment.

    Training runs need the corpus globally shuffled (no long runs of one
    source/domain) and split into fixed shards — and RERUNNABLE: the
    mapping must be a pure function of (key, seed), not RNG or partition
    layout, or a resumed/backfilled export produces a different corpus.

    Shape: ``shard = shard_hash % num_shards``; within-shard order is the
    hash itself (hash order IS the shuffle). Adds columns ``shard`` and
    ``pos`` (1-based rank in shard). ONE shuffle — the rank window
    repartitions by shard; there is no global sort. Re-seeding gives a
    fresh epoch-level permutation without touching the data.

    At 100 TB: num_shards is O(total/shard_target_bytes); each shard's
    window sort is independent, so skew is bounded by the hash (uniform).
    """
    from pyspark.sql import Window

    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    h = shard_hash(key_col, seed)
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(),
                                            F.col(key_col).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % num_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .drop("__h")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    num_shards: int,
    seed: int = 0,
    max_records_per_file: int = 0,
    fmt: str = "parquet",
) -> None:
    """Materialize the deterministic shuffle as ``shard=N/`` parquet
    directories, rows inside each file in shuffle order.

    One shuffle total: `repartition(num_shards, "shard")` feeds both the
    in-partition sort and the partitionBy writer (hash-partitioning on
    the same column means each task writes exactly one shard directory —
    no writer-side fan-out). `max_records_per_file` caps file size so a
    1000-executor trainer streams many small files per shard.
    """
    sharded = shuffle_shards(df, key_col, num_shards, seed)
    writer = (
        sharded.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.format(fmt).save(path)


def dedup_paragraphs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Sub-document exact dedup (the MassiveText/Dolma paragraph pass):
    only the FIRST global occurrence of each normalized paragraph
    survives; every later occurrence — in other documents or repeated
    within one — is dropped. "First" is the deterministic (key,
    position) order, not scan order, so the result is stable across
    re-layouts.

    Scale shape: posexplode paragraphs (linear), ONE window over the
    normalized paragraph ordered by (key, pos) — rank 1 is the keeper —
    then the per-doc regroup. Two shuffles; the paragraph-hash
    partitioning is uniform so no skew (a pathological corpus where one
    paragraph dominates shows up as one big window partition — exactly
    the boilerplate `remove_boilerplate_lines` removes first in a real
    pipeline). Paragraphs shorter than `min_chars` (normalized) are
    exempt — never deduped.

    Output: (key, text, n_paras_kept, n_paras_dropped).
    """
    import re as _re

    from pyspark.sql import Window

    paras = (
        df.select(F.col(key_col).alias("key"),
                  F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
                  .alias("pos", "para"))
        .withColumn("__norm", F.trim(F.lower(F.col("para"))))
    )
    w = Window.partitionBy("__norm").orderBy(F.col("key").asc(),
                                             F.col("pos").asc())
    flagged = paras.withColumn(
        "__keep",
        (F.row_number().over(w) == 1) | (F.length("__norm") < min_chars))
    return (
        flagged.groupBy("key")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.sort_array(F.collect_list(
                        F.when(F.col("__keep"), F.struct("pos", "para")))),
                    lambda s: s["para"])).alias("text"),
            F.sum(F.col("__keep").cast("long")).alias("n_paras_kept"),
            F.sum((~F.col("__keep")).cast("long")).alias("n_paras_dropped"))
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    score_col: str,
    token_col: str,
    key_col: str = "doc_id",
    num_ranges: Optional[int] = None,
) -> DataFrame:
    """Token-budget corpus selection: greedily keep the highest-score
    rows (ties broken by `key_col` ascending) until the cumulative
    `token_col` sum would exceed `budget_tokens` — "give me the best
    documents that fit a 10B-token training budget".

    Scale shape: the textbook cumsum (`SUM() OVER (ORDER BY score)`)
    is a SINGLE-PARTITION window — a non-starter at 100 TB. Instead:
    stamp a DETERMINISTIC score-range id (boundaries computed once and
    baked in as literals — functions/partitioning.py explains why
    spark_partition_id over repartitionByRange is NOT sound for this:
    its boundary sample reseeds per job, so the offsets fold under one
    partition assignment and apply under another); one tiny aggregate
    computes per-range token sums (one row per range); prefix OFFSETS
    over those scalars are folded driver-side and joined back on the
    range id (a broadcast of N rows); the cumsum window then runs PER
    RANGE. The only driver materialization is the boundary scalars and
    N range sums, so the plan is identical at sf0.01 and at 100 TB.

    Adds `cum_tokens` (running total including the row itself) and
    keeps rows with `cum_tokens <= budget_tokens`.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    from pyspark.sql import Window

    from maggma_spark.functions.partitioning import \
        with_deterministic_range_pid

    spark = df.sparkSession
    n = num_ranges or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = with_deterministic_range_pid(
        df, score_col, "__pid", n, descending=True)
    part_sums = sorted(
        ranged.groupBy("__pid").agg(F.sum(token_col).alias("__s")).collect())
    offsets, acc = [], 0
    for pid, s in part_sums:
        offsets.append((pid, acc))
        acc += int(s or 0)
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "__pid int, __offset long"))
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(score_col).desc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(off_df, on="__pid")
        .withColumn("cum_tokens",
                    (F.col("__offset") + F.sum(token_col).over(w))
                    .cast("long"))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .drop("__pid", "__offset")
    )


def quality_percentile_filter(
    df: DataFrame,
    score_col: str,
    group_col: str,
    quantile: float = 0.2,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-group adaptive quality floor: drop the bottom `quantile`
    fraction of rows WITHIN each group (e.g. per language), instead of
    one global threshold that would gut low-resource groups.

    The rank is `percent_rank` over (score asc, key asc) — the key
    tiebreak makes membership deterministic under re-runs and
    re-layouts. One partitioned window (shuffle on `group_col` only);
    no global sort, no driver state — group cardinality bounds the
    window partition, so the plan survives 100x data growth as long as
    groups do.

    Adds `quality_pr` (the row's percent_rank within its group) and
    keeps rows with `quality_pr >= quantile`.
    """
    if not 0.0 <= quantile < 1.0:
        raise ValueError("need 0 <= quantile < 1")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(key_col).asc())
    return (
        df.withColumn("quality_pr", F.percent_rank().over(w))
        .filter(F.col("quality_pr") >= quantile)
    )


def sample_fixed_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Exactly-k-per-group deterministic sample (eval holdouts, per-
    language probe sets): rank rows within each group by the md5 of
    (seed, key) and keep the first k. Content-addressed like
    deterministic_sample — membership is a pure function of the key, so
    re-runs, re-layouts, and other engines agree — but with an EXACT
    size guarantee per group, which a Bernoulli rate cannot give.

    One partitioned window (shuffle on group_col); groups smaller than
    k are kept whole. Adds no columns.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    h = F.md5(F.concat_ws("\x1f", F.lit(str(seed)),
                          F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(),
                                              F.col(key_col).asc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def assign_splits(
    df: DataFrame,
    key_col: str,
    fractions: dict,
    buckets: int = 10_000,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's md5 bucket
    of (seed, key) falls into contiguous fraction ranges — e.g.
    {"train": .98, "val": .01, "test": .01}. Content-addressed: a doc
    keeps its split across runs, engines, and corpus growth (new docs
    never move old ones between splits — the property random splits
    lose). Pure projection, zero shuffle.
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = md5_bucket(
        F.concat_ws("\x1f", F.lit(str(seed)),
                    F.col(key_col).cast("string")), buckets)
    expr = F.lit(None).cast("string")
    hi = buckets
    items = list(fractions.items())
    # build the WHEN chain from the LAST range backwards; the FIRST
    # fraction absorbs any rounding remainder by owning [0, hi) so no
    # bucket is ever left unassigned
    for i, (name, frac) in reversed(list(enumerate(items))):
        lo = 0 if i == 0 else hi - int(round(frac * buckets))
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
        hi = lo
    return df.withColumn(split_col, expr)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted bottom-k sample: priority = h / w where
    h is the 32-bit md5 hash of (seed, key) and w the INTEGER weight —
    the k smallest priorities win, so doubling a row's weight halves
    its priority and roughly doubles its selection odds (hash-based
    priority sampling). All-integer arithmetic: membership replays
    bit-for-bit in any SQL engine (no pow/ln float divergence), and is
    a pure function of (seed, key, weight) — stable across runs and
    layouts.

    Plan: priority is a projection; selection is a global top-k on it
    (TakeOrdered — per-partition heaps of k, no full sort). Weights
    must be positive integers (cast yours with round/ceil first).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = F.conv(F.substring(
        F.md5(F.concat_ws("\x1f", F.lit(str(seed)),
                          F.col(key_col).cast("string"))), 1, 8), 16, 10) \
        .cast("long")
    w = F.col(weight_col).cast("long")
    guard = F.when(w <= 0, F.lit(None)).otherwise(w)
    # explicit floor, NOT cast(double as long): Spark's cast truncates
    # but other engines (DuckDB) round-half-even, so only floor() makes
    # the priority replay bit-for-bit cross-engine
    pri = F.floor(h / guard)
    # nulls LAST: a non-positive weight nulls the priority and must
    # never outrank a valid row (plain asc puts nulls first)
    return (
        df.withColumn("__pri", pri)
        .orderBy(F.col("__pri").asc_nulls_last(), F.col(key_col).asc())
        .limit(k)
        .drop("__pri")
    )


def assign_global_ids(
    df: DataFrame,
    order_cols,
    id_col: str = "global_id",
    num_ranges: Optional[int] = None,
) -> DataFrame:
    """Contiguous 0-based global row numbers in `order_cols` order —
    the "stable example index" a training run wants — WITHOUT the
    single-partition window `row_number() OVER (ORDER BY ...)` plans.

    Same distributed decomposition as select_token_budget: stamp a
    deterministic range id on the first order column (boundaries baked
    in as literals — functions/partitioning.py explains why
    spark_partition_id over repartitionByRange mis-stitches the
    offsets across jobs), count rows per range (one row each), fold
    prefix offsets driver-side, then a per-range row_number plus the
    broadcast offset. Ties in `order_cols` make numbering
    nondeterministic — include a unique key as the last order column.
    """
    from pyspark.sql import Window

    from maggma_spark.functions.partitioning import \
        with_deterministic_range_pid

    cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    spark = df.sparkSession
    n = num_ranges or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = with_deterministic_range_pid(df, cols[0], "__pid", n)
    counts = sorted(ranged.groupBy("__pid").count().collect())
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = F.broadcast(
        spark.createDataFrame(offsets, "__pid int, __off long"))
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in cols])
    return (
        ranged.join(off, on="__pid")
        .withColumn(id_col,
                    (F.col("__off") + F.row_number().over(w) - 1)
                    .cast("long"))
        .drop("__pid", "__off")
    )
