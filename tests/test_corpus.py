"""Training-corpus assembly operators: deterministic sampling, sequence
packing, benchmark decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from maggma_spark.operators.corpus import (
    decontaminate,
    deterministic_sample,
    md5_bucket,
    pack_sequences,
)


def test_deterministic_sample_stable(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(1000)])
    a = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3).collect()}
    # same membership on a re-layout of the same data
    b = {r["doc_id"] for r in deterministic_sample(
        df.repartition(7), "doc_id", 0.3).collect()}
    assert a == b
    assert 0.2 < len(a) / 1000 < 0.4  # md5 buckets are near-uniform
    # nested fractions: a 10% sample is a subset of the 30% sample
    c = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    assert c <= a


def test_pack_sequences_capacity(spark):
    rows = [Row(doc_id=i, toks=100) for i in range(100)]
    out = pack_sequences(spark.createDataFrame(rows), "toks", 250,
                         num_buckets=4).collect()
    assert len(out) == 100
    # per (bucket, bin): cumulative tokens before the last member stay
    # under capacity (boundary-binning contract), and bins are dense
    from collections import defaultdict

    bins = defaultdict(list)
    for r in out:
        bins[(r["bucket"], r["bin"])].append(r["toks"])
    for (bkt, b), toks in bins.items():
        assert b >= 0
        assert sum(toks) - toks[-1] < 250 * (b + 1)
    # every bucket's bins start at 0 and are contiguous
    by_bucket = defaultdict(set)
    for (bkt, b) in bins:
        by_bucket[bkt].add(b)
    for bkt, bs in by_bucket.items():
        assert bs == set(range(len(bs)))


def test_decontaminate_drop_and_flag(spark):
    bench = spark.createDataFrame([Row(
        doc_id=0,
        text="the quick brown fox jumps over the lazy dog every single day")])
    corpus = spark.createDataFrame([
        Row(doc_id=10,
            text="prefix words the quick brown fox jumps over the lazy dog here"),
        Row(doc_id=11, text="totally unrelated content about spark shuffles "
                            "and catalyst optimizer internals today"),
        Row(doc_id=12, text="short doc"),  # < 8 tokens: never contaminated
    ])
    kept = decontaminate(corpus, bench)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 12]
    flagged = {r["doc_id"]: r["contaminated"]
               for r in decontaminate(corpus, bench, mode="flag").collect()}
    assert flagged == {10: True, 11: False, 12: False}
    with pytest.raises(ValueError):
        decontaminate(corpus, bench, mode="bogus")


def test_md5_bucket_sql_parity(spark):
    """The bucket expression must equal the documented SQL recomputation
    — that's the whole auditability claim."""
    import duckdb

    df = spark.createDataFrame([Row(k=i) for i in range(200)])
    got = {r["k"]: r["b"] for r in df.select(
        "k", md5_bucket("k", 97).alias("b")).collect()}
    want = dict(duckdb.sql(
        "SELECT i, CAST(CONCAT('0x', substring(md5(CAST(i AS VARCHAR)), 1, 8))"
        " AS BIGINT) % 97 FROM range(200) t(i)").fetchall())
    assert got == want


def test_md5_bucket_uniform_at_10000(spark):
    """The 32-bit bucket fixes the 16-bit bias: at buckets=10000 a 20%
    threshold must keep ~20%, not ~21.4% (the 16-bit residue skew)."""
    df = spark.createDataFrame([Row(k=i) for i in range(20000)])
    kept = df.filter(md5_bucket("k", 10_000) < 2000).count()
    assert abs(kept / 20000 - 0.2) < 0.02


def test_deterministic_sample_by_integer_threshold(spark):
    """Stratified and unstratified sampling agree for the same fraction
    — both integerize the threshold driver-side, so a binary-float
    0.29*10000=2899.999... cannot shift the boundary bucket."""
    from maggma_spark.operators.corpus import deterministic_sample_by

    rows = [Row(doc_id=i, lang="en") for i in range(3000)]
    df = spark.createDataFrame(rows)
    flat = {r["doc_id"] for r in
            deterministic_sample(df, "doc_id", 0.29).collect()}
    strat = {r["doc_id"] for r in deterministic_sample_by(
        df, "doc_id", "lang", {"en": 0.29}).collect()}
    assert flat == strat


def test_deterministic_sample_by_strata(spark):
    from maggma_spark.operators.corpus import deterministic_sample_by

    rows = [Row(doc_id=i, lang=("en" if i % 2 else "de")) for i in range(2000)]
    df = spark.createDataFrame(rows)
    out = deterministic_sample_by(df, "doc_id", "lang",
                                  {"en": 0.4, "de": 0.1}).collect()
    by_lang = {"en": 0, "de": 0}
    for r in out:
        by_lang[r["lang"]] += 1
    assert 0.3 < by_lang["en"] / 1000 < 0.5
    assert 0.05 < by_lang["de"] / 1000 < 0.16
    # unlisted strata drop entirely
    df2 = df.withColumn("lang", F.lit("xx"))
    assert deterministic_sample_by(df2, "doc_id", "lang",
                                   {"en": 0.4}).count() == 0
    # membership nests: the 10% en sample is inside the 40% en sample
    a = {r["doc_id"] for r in deterministic_sample_by(
        df, "doc_id", "lang", {"en": 0.4}).collect()}
    b = {r["doc_id"] for r in deterministic_sample_by(
        df, "doc_id", "lang", {"en": 0.1}).collect()}
    assert b <= a


def test_chunk_documents_windows(spark):
    from maggma_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))),
         (2, "solo"),
         (3, "   "),
         (4, "a b c d")],
        "doc_id long, text string")
    out = chunk_documents(df, max_tokens=4, overlap=2)
    rows = {(r["key"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
            for r in out.collect()}
    # doc 1: stride 2 -> starts 0,2,4,6 (8 dropped: 8+2 >= 10)
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w2 w3 w4 w5", 4)
    assert rows[(1, 3)] == ("w6 w7 w8 w9", 4)
    assert (1, 4) not in rows
    assert rows[(2, 0)] == ("solo", 1)
    assert all(k != 3 for k, _ in rows)  # whitespace doc -> no chunks
    assert rows[(4, 0)] == ("a b c d", 4)
    assert (4, 1) not in rows
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_remove_boilerplate_lines(spark):
    from maggma_spark.operators.corpus import remove_boilerplate_lines

    rows = [(i, f"unique content {i}\nSubscribe to our newsletter\n"
                f"more text {i}") for i in range(8)]
    rows.append((99, "standalone doc\nrare footer"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["key"]: r for r in
           remove_boilerplate_lines(df, max_doc_freq=5).collect()}
    # the subscribe line (8 docs > 5) is gone from every doc, order kept
    assert out[0]["text"] == "unique content 0\nmore text 0"
    assert out[0]["n_lines_dropped"] == 1 and out[0]["n_lines_kept"] == 2
    # rare footer (1 doc) survives
    assert out[99]["text"] == "standalone doc\nrare footer"
    assert out[99]["n_lines_dropped"] == 0


def test_top_ngrams_doc_frequency(spark):
    from maggma_spark.operators.corpus import top_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c d"), (4, "")],
        "doc_id long, text string")
    out = [(r["ngram"], r["n_docs"]) for r in top_ngrams(df, n=2, k=3).collect()]
    # "a b" in docs 1+2 (distinct per doc), ties broken alphabetically
    assert out == [("a b", 2), ("b a", 1), ("b c", 1)]


def test_mix_by_temperature_rebalances(spark):
    from maggma_spark.operators.corpus import mix_by_temperature

    rows = ([(i, "en") for i in range(1600)]
            + [(10000 + i, "sw") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out, rates = mix_by_temperature(df, "doc_id", "lang", alpha=0.5)
    # rarest stratum keeps rate 1.0; en downsampled by sqrt(100/1600)=0.25
    assert rates["sw"] == 1.0
    assert abs(rates["en"] - 0.25) < 1e-12
    got = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["lang"]] += 1
    assert got["sw"] == 100                  # complete
    assert 300 < got["en"] < 500             # ~400 expected
    # alpha=1 keeps everything
    full, rates1 = mix_by_temperature(df, "doc_id", "lang", alpha=1.0)
    assert full.count() == 1700 and set(rates1.values()) == {1.0}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mix_by_temperature(df, "doc_id", "lang", alpha=0)


def test_decontaminate_bloom_matches_exact_join(spark):
    from maggma_spark.operators.corpus import decontaminate_bloom

    bench = spark.createDataFrame([Row(
        doc_id=0,
        text="the quick brown fox jumps over the lazy dog every single day")])
    corpus = spark.createDataFrame([
        Row(doc_id=10,
            text="prefix words the quick brown fox jumps over the lazy dog here"),
        Row(doc_id=11, text="totally unrelated content about spark shuffles "
                            "and catalyst optimizer internals today"),
        Row(doc_id=12, text="short doc"),  # < 8 tokens: never contaminated
    ])
    kept = decontaminate_bloom(corpus, bench)
    # no false negatives: 10 must drop; at 16 bits/shingle FPs on a
    # 3-doc corpus are ~impossible, so the exact verdict should match
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 12]
    flagged = {r["doc_id"]: r["contaminated"]
               for r in decontaminate_bloom(corpus, bench,
                                            mode="flag").collect()}
    assert flagged == {10: True, 11: False, 12: False}


def test_decontaminate_bloom_edge_cases(spark):
    from maggma_spark.operators.corpus import decontaminate_bloom

    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="eight tokens are needed for one full shingle ok")])
    # empty benchmark (no shingles): nothing contaminated
    empty_bench = spark.createDataFrame([Row(doc_id=0, text="too short")])
    assert decontaminate_bloom(corpus, empty_bench).count() == 1
    out = decontaminate_bloom(corpus, empty_bench, mode="flag").collect()
    assert out[0]["contaminated"] is False
    # max_bits guard
    big_bench = spark.createDataFrame(
        [Row(doc_id=0, text=" ".join(f"w{i}" for i in range(200)))])
    with pytest.raises(ValueError, match="max_bits"):
        decontaminate_bloom(corpus, big_bench, max_bits=64)


def test_shuffle_shards_deterministic_and_partition_invariant(spark):
    from maggma_spark.operators.corpus import shuffle_shards

    df = spark.createDataFrame([Row(doc_id=i, text=f"d{i}") for i in range(500)])
    a = shuffle_shards(df, "doc_id", 4, seed=7).collect()
    b = shuffle_shards(df.repartition(13), "doc_id", 4, seed=7).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)
    assert key(a) == key(b)  # pure function of (key, seed)
    shards = {r["shard"] for r in a}
    assert shards == {0, 1, 2, 3}
    # pos is a dense 1..n rank within each shard
    from collections import defaultdict

    per = defaultdict(list)
    for r in a:
        per[r["shard"]].append(r["pos"])
    for positions in per.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # a different seed is a different permutation
    c = shuffle_shards(df, "doc_id", 4, seed=8).collect()
    assert key(a) != key(c)


def test_write_training_shards_layout(spark, tmp_path):
    import os

    from maggma_spark.operators.corpus import write_training_shards

    df = spark.createDataFrame([Row(doc_id=i, text=f"d{i}") for i in range(300)])
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", num_shards=3,
                          max_records_per_file=40)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == ["shard=0", "shard=1", "shard=2"]
    back = spark.read.parquet(path)
    assert back.count() == 300
    # file cap respected: every physical file holds <= 40 rows
    per_file = (back.groupBy(F.input_file_name().alias("f")).count()
                .agg(F.max("count")).first()[0])
    assert per_file <= 40
    # rows inside each physical file are in shuffle (pos) order
    from collections import defaultdict

    by_file = defaultdict(list)
    for r in back.select(F.input_file_name().alias("f"), "pos").collect():
        by_file[r["f"]].append(r["pos"])
    for positions in by_file.values():
        assert positions == sorted(positions)


def test_dedup_paragraphs_first_occurrence_wins(spark):
    from maggma_spark.operators.corpus import dedup_paragraphs

    rows = [
        Row(doc_id=1, text="alpha beta\n\nshared para\n\ngamma"),
        Row(doc_id=2, text="shared para\n\ndelta\n\nshared para"),
        Row(doc_id=3, text="Shared Para\n\nepsilon"),  # case-insensitive dup
    ]
    out = {r["key"]: r for r in dedup_paragraphs(
        spark.createDataFrame(rows)).collect()}
    assert out[1]["text"] == "alpha beta\n\nshared para\n\ngamma"
    assert out[1]["n_paras_dropped"] == 0
    # both copies in doc 2 drop (cross-doc + within-doc repeat)
    assert out[2]["text"] == "delta"
    assert out[2]["n_paras_dropped"] == 2
    # normalized match drops despite different casing
    assert out[3]["text"] == "epsilon"
    assert out[3]["n_paras_dropped"] == 1


def test_select_token_budget_matches_sequential(spark):
    from maggma_spark.operators.corpus import select_token_budget

    rows = [Row(doc_id=i, score=(i * 37) % 100, toks=10 + (i % 13))
            for i in range(500)]
    df = spark.createDataFrame(rows)
    # sequential greedy reference
    seq = sorted(rows, key=lambda r: (-r.score, r.doc_id))
    cum, expect = 0, {}
    for r in seq:
        cum += r.toks
        if cum > 3000:
            break
        expect[r.doc_id] = cum
    # num_ranges=7 forces the prefix-offset fold across partitions
    out = {r["doc_id"]: r["cum_tokens"]
           for r in select_token_budget(
               df, 3000, "score", "toks", num_ranges=7).collect()}
    assert out == expect


def test_select_token_budget_keeps_all_under_budget(spark):
    from maggma_spark.operators.corpus import select_token_budget

    df = spark.createDataFrame([Row(doc_id=i, s=i, toks=5)
                                for i in range(20)])
    assert select_token_budget(df, 10_000, "s", "toks").count() == 20
    with pytest.raises(ValueError):
        select_token_budget(df, 0, "s", "toks")


def test_quality_percentile_filter_per_group(spark):
    from maggma_spark.operators.corpus import quality_percentile_filter

    rows = [Row(doc_id=i, grp="a" if i < 10 else "b", score=i)
            for i in range(30)]
    out = quality_percentile_filter(
        spark.createDataFrame(rows), "score", "grp",
        quantile=0.5, key_col="doc_id").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], set()).add(r["doc_id"])
    # group a: ids 0-9, percent_rank >= .5 -> top half kept
    assert by_grp["a"] == set(range(5, 10))
    # group b: ids 10-29 -> ranks (i-10)/19 >= .5 -> i >= 20 (ceil)
    assert by_grp["b"] == set(range(20, 30))
    with pytest.raises(ValueError):
        quality_percentile_filter(
            spark.createDataFrame(rows), "score", "grp", quantile=1.0)


def test_sample_fixed_per_group_exact_k(spark):
    from maggma_spark.operators.corpus import sample_fixed_per_group

    rows = [Row(doc_id=i, grp="a" if i % 3 else "b") for i in range(90)]
    df = spark.createDataFrame(rows)
    out = sample_fixed_per_group(df, "doc_id", "grp", k=10).collect()
    from collections import Counter

    c = Counter(r["grp"] for r in out)
    assert c == {"a": 10, "b": 10}
    # membership stable under re-layout; small groups kept whole
    out2 = sample_fixed_per_group(df.repartition(13), "doc_id", "grp",
                                  k=10).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in out2}
    tiny = spark.createDataFrame([Row(doc_id=1, grp="z")])
    assert sample_fixed_per_group(tiny, "doc_id", "grp", k=5).count() == 1
    with pytest.raises(ValueError):
        sample_fixed_per_group(df, "doc_id", "grp", k=0)


def test_assign_splits_total_and_stability(spark):
    from maggma_spark.operators.corpus import assign_splits

    df = spark.createDataFrame([Row(doc_id=i) for i in range(2000)])
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r["doc_id"]: r["split"] for r in
           assign_splits(df, "doc_id", fr).collect()}
    assert len(out) == 2000 and None not in out.values()
    from collections import Counter

    c = Counter(out.values())
    assert 0.75 < c["train"] / 2000 < 0.85
    # growing the corpus never reassigns existing docs
    bigger = spark.createDataFrame([Row(doc_id=i) for i in range(4000)])
    out2 = {r["doc_id"]: r["split"] for r in
            assign_splits(bigger, "doc_id", fr).collect()}
    assert all(out2[k] == v for k, v in out.items())
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {"a": 0.5, "b": 0.2})


def test_weighted_sample_bias_and_determinism(spark):
    from maggma_spark.operators.corpus import weighted_sample

    rows = ([Row(doc_id=i, w=100) for i in range(500)]
            + [Row(doc_id=i, w=1) for i in range(500, 1000)])
    df = spark.createDataFrame(rows)
    got = {r["doc_id"] for r in
           weighted_sample(df, "doc_id", "w", k=200).collect()}
    heavy = sum(1 for d in got if d < 500)
    assert len(got) == 200
    assert heavy > 150                # 100x weight dominates selection
    got2 = {r["doc_id"] for r in weighted_sample(
        df.repartition(7), "doc_id", "w", k=200).collect()}
    assert got == got2                # layout-independent
    with pytest.raises(ValueError):
        weighted_sample(df, "doc_id", "w", k=0)


def test_assign_global_ids_contiguous_and_ordered(spark):
    from maggma_spark.operators.corpus import assign_global_ids

    rows = [Row(k=i, v=(i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(rows)
    out = assign_global_ids(df, ["v", "k"], num_ranges=7).collect()
    assert sorted(r["global_id"] for r in out) == list(range(500))
    by_id = sorted(out, key=lambda r: r["global_id"])
    keys = [(r["v"], r["k"]) for r in by_id]
    assert keys == sorted(keys)          # ids follow the order exactly
    # layout independence
    out2 = assign_global_ids(df.repartition(13), ["v", "k"],
                             num_ranges=7).collect()
    assert {(r["k"], r["global_id"]) for r in out} == \
        {(r["k"], r["global_id"]) for r in out2}


def test_weighted_sample_invalid_weights_never_win(spark):
    from maggma_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, w=10) for i in range(20)]
        + [Row(doc_id=100 + i, w=0) for i in range(5)]      # invalid
        + [Row(doc_id=200, w=-3)])
    got = {r["doc_id"] for r in
           weighted_sample(df, "doc_id", "w", k=20).collect()}
    assert got == set(range(20))       # only valid-weight rows selected


def test_mix_by_temperature_max_strata_guard(spark):
    """A high-cardinality stratum column must raise, not silently
    collect unbounded per-stratum counts onto the driver."""
    import pytest

    from maggma_spark.operators.corpus import mix_by_temperature

    df = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS s")
    with pytest.raises(ValueError, match="max_strata"):
        mix_by_temperature(df, "k", "s", max_strata=10)
    out, rates = mix_by_temperature(df, "k", "s", max_strata=100)
    assert len(rates) == 100
