#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle_sql.json SQL in DuckDB over views of the
sfDir tables, sort columns by name, sort rows, and compare values
exactly (with a small float tolerance fallback reported separately).
Dev tool only — not part of the library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return str(v)


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return sorted(cols), sorted(
        tuple(canon(r[i]) for i in order) for r in data)


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols, srows = rows_of(spark_rel)
        if name not in oracle:
            print(f"{name}: NO-ORACLE rows={len(srows)}")
            continue
        ocols, orows = rows_of(con.sql(oracle[name]))
        if scols != ocols:
            print(f"{name}: FAIL cols spark={scols} oracle={ocols}")
            failures += 1
            continue
        if srows == orows:
            print(f"{name}: OK rows={len(srows)}")
            continue
        failures += 1
        if len(srows) != len(orows):
            print(f"{name}: FAIL rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        shown = 0
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b and shown < 3:
                print(f"{name}: FAIL row {i}\n  spark ={a}\n  oracle={b}")
                shown += 1
        if shown == 0:
            print(f"{name}: FAIL (row order only?)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
