"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row-count, sorted column names, and (order-insensitively) values.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out


def main():
    import json
    import os

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--json=")), None)
    sample = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                   if a.startswith("--sample=")), None)
    offset = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                   if a.startswith("--offset=")), 0)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from maggma_spark.session import get_spark

    if sample:
        # deterministic spread over the sorted catalog — every Nth
        # row starting at --offset (round-10: a round-keyed offset
        # rotates successive rounds over DIFFERENT strata; without it
        # every round re-checked the SAME every-Nth rows)
        names = sorted(e.queries())
        step = max(1, len(names) // sample)
        only = set(names[offset % step::step][:sample])

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # spark-written dataset (synth SF dirs)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        # the DRIVER's canonicalizer (pandas sort_values + hash) cannot
        # sort/hash list/map/struct cells — round-6 shipped four such
        # rows and they all errored in the hard gate. Mirror that
        # limitation here instead of tolerating it.
        bad_types = [f"{f.name}: {f.dataType.simpleString()}"
                     for f in sdf.schema.fields
                     if f.dataType.typeName() in ("array", "map",
                                                  "struct")]
        if bad_types and name in oracles:
            print(f"FAIL {name}: driver-unhashable output columns "
                  f"{bad_types} — serialize to scalars (to_json/"
                  "concat_ws) in both the query and the twin")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            a, b = canon(srows, scols), canon(drows, dcols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    print()
    checked = [q for q in qs if not only or q in only]
    if json_out:
        record = {
            "sf_dir": sf_dir,
            "n_checked": len(checked),
            "n_failed": len(failed),
            "failed": sorted(failed),
            "queries": sorted(checked),
        }
        existing = {}
        if os.path.exists(json_out):
            with open(json_out) as fh:
                existing = json.load(fh)
        existing[os.path.basename(sf_dir.rstrip("/"))] = record
        with open(json_out, "w") as fh:
            json.dump(existing, fh, indent=1, sort_keys=True)
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print(f"all {len(checked)} queries consistent")


if __name__ == "__main__":
    main()
