#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs every `__spark_entry__.queries()` entry on Spark and its
`oracle_sql()` twin on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values (exact match after
canonicalization — stricter than a hash, so passing here should pass the
driver).

Usage: python3 tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v):
    # Array cells: DuckDB's .df() yields numpy object arrays where Spark's
    # toPandas() yields Python lists — canonicalize both element-wise
    if type(v).__name__ == "ndarray":
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    # Unwrap numpy scalars so int64 stays int, bool_ stays bool, etc.
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\0NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(df) -> list[tuple]:
    # Per-COLUMN canonicalization, deliberately not iterrows(): iterrows()
    # upcasts each row to a common dtype, which masks int-vs-float drift
    # between Spark and the oracle (the exact class of mismatch the
    # driver's per-column hash catches).
    cols = sorted(df.columns)
    col_values = [[canon_cell(v) for v in df[c].tolist()] for c in cols]
    return sorted(zip(*col_values))


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry
    from kafka_dbsync_spark import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures, passes, weak = [], [], []

    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            weak.append(name)
            print(f"WEAK {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"row count {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            s_rows, o_rows = canon_rows(sdf), canon_rows(odf)
            if s_rows != o_rows:
                diff = [
                    (a, b) for a, b in zip(s_rows, o_rows) if a != b
                ][:3]
                problems.append(f"values differ; first diffs (spark,oracle): {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            passes.append((name, len(sdf)))
            print(f"PASS {name} ({len(sdf)} rows)")

    print(
        f"\n{len(passes)} pass, {len(failures)} fail, {len(weak)} weak "
        f"(rows-only) of {len(queries)} queries @ {sf_dir}"
    )
    if json_out:
        import json

        doc = {
            "sf_dir": sf_dir,
            "pass": len(passes),
            "fail": len(failures),
            "weak": len(weak),
            "total": len(queries) if not only else len(only),
            "queries": {
                **{n: {"status": "PASS", "rows": r} for n, r in passes},
                **{n: {"status": "FAIL", "detail": d} for n, d in failures},
                **{n: {"status": "WEAK"} for n in weak},
            },
        }
        with open(json_out, "w") as fh:
            json.dump(doc, fh, indent=1)
    spark.stop()  # non-daemon JVM threads otherwise outlive main()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
