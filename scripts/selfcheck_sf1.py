"""sf1 catalog spot-check (round-9, r8 verdict next #9): synthesize an
sf1-scale dataset (default 10x sf0.1) and run the oracle-gate replica
(scripts/selfcheck.py) on a deterministic sample of catalog rows
against DuckDB reading the SAME synthesized parquet.

The round-8 flagship probes proved the PLANS scale; this proves
CORRECTNESS holds at 10x bench SF, where timestamp/float edge
densities, range-partition widths, and carry counts all differ.

Synthesis: each fact table is replicated `mult` times; every key
column (primary AND foreign, consistently per key domain) shifts by
copy * 10^9, so each copy is a self-consistent parallel universe —
joins land inside their copy, planted absolute-key predicates keep
their by-design sparsity, and both engines read identical bytes.
Non-key payloads (timestamps, texts, prices) repeat verbatim; rows
whose semantics collapse duplicates (dedup families) stay consistent
because Spark and DuckDB see the same duplicated data. region/nation
are 5/25-row dimensions and copy as-is.

Run: python scripts/selfcheck_sf1.py [mult] [--sample=N]
[--offset=K] [--json=PATH] (defaults: mult=10, sample=20, offset=0).
`--offset` (round-10, r9 verdict next #5) rotates the deterministic
every-Nth sample so successive rounds cover DIFFERENT strata — pass
the round number. The newest CAPABILITY_ADDED rows are always
appended to the sample by name (minus SYNTH_LAYOUT_SENSITIVE).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# key domains: every column listed shifts by copy * STRIDE so FK
# relationships stay intact WITHIN a copy and never collide across
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 10 ** 9


def main():
    from pyspark.sql import functions as F

    from maggma_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mult = int(args[0]) if args else 10
    sample = next((a for a in sys.argv[1:]
                   if a.startswith("--sample=")), "--sample=20")
    offset = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                   if a.startswith("--offset=")), 0)
    json_out = next((a for a in sys.argv[1:]
                     if a.startswith("--json=")), None)
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("selfcheck-sf1-synth")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="sfsynth_")
    # basename becomes the SELFCHECK json key — make it self-labeling
    out_dir = os.path.join(tmp, f"sf1synth_x{mult}")
    os.makedirs(out_dir)
    try:
        copies = spark.range(mult).select(F.col("id").alias("__copy"))
        for t in TABLES:
            src = spark.read.parquet(f"{base}/{t}.parquet")
            dst = os.path.join(out_dir, f"{t}.parquet")
            if t not in KEYS:
                src.write.mode("overwrite").parquet(dst)
                continue
            keys = set(KEYS[t])
            cols = [
                (F.col(c) + F.col("__copy") * STRIDE).alias(c)
                if c in keys else F.col(c)
                for c in src.columns]
            (src.crossJoin(F.broadcast(copies)).select(*cols)
             .repartition(32).write.mode("overwrite").parquet(dst))
        spark.stop()

        from maggma_spark.plans.catalog import SYNTH_LAYOUT_SENSITIVE

        cmd = [sys.executable,
               os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "selfcheck.py"),
               out_dir]
        names = args[1:]  # explicit row names override the sample
        skipped = [n for n in names if n in SYNTH_LAYOUT_SENSITIVE]
        names = [n for n in names if n not in SYNTH_LAYOUT_SENSITIVE]
        for n in skipped:
            print(f"SKIP {n}: planted invariant assumes the shipped "
                  "testdata key layout (SYNTH_LAYOUT_SENSITIVE)")
        if names:
            cmd += names
        elif skipped:
            sys.exit(0)
        else:
            # sample inside selfcheck.py would not know the exclusion
            # set; resolve it here instead. --offset rotates the
            # stratum; the NEWEST capability rows always ride along
            import __spark_entry__ as e
            from maggma_spark.plans.catalog import CAPABILITY_ADDED
            all_names = sorted(n for n in e.queries()
                               if n not in SYNTH_LAYOUT_SENSITIVE)
            want = int(sample.split("=", 1)[1])
            step = max(1, len(all_names) // want)
            picked = all_names[offset % step::step][:want]
            newest = max(CAPABILITY_ADDED.values(), default=0)
            extra = [n for n, r in sorted(CAPABILITY_ADDED.items())
                     if r == newest and n in set(all_names)
                     and n not in set(picked)]
            cmd += picked + extra
        if json_out:
            cmd.append(json_out)
        rc = subprocess.call(cmd)
        sys.exit(rc)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
