#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Mirrors the driver's asymmetric read paths: the Spark result is read
with pandas.read_parquet (pyarrow — decimals surface as
decimal.Decimal, DATE as datetime.date), the oracle SQL runs in DuckDB
and is fetched with .df() (decimals downcast to float64, DATE to
datetime64). Values are compared on their string form after sorting
columns by name and rows by value — exactly the class of comparison
the driver's hash is. Any array/ndarray cell is flagged: the driver's
pandas sort_values crashes on those ("unhashable type").
Dev tool only — not part of the library.
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError("array cell (driver's sort_values would crash)")
    if isinstance(v, pd.Timestamp) and v.tzinfo is not None:
        v = v.tz_convert("UTC").tz_localize(None)
    if isinstance(v, float):
        if v != v:
            return "NULL"
        if v == 0.0:
            return "0.0"  # -0.0 == 0.0: DuckDB round() is sign-preserving
            # (a tiny negative mean rounds to -0.0), Spark's BigDecimal
            # round has no signed zero — numerically equal, repr-distinct
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_of(df):
    df = df[sorted(df.columns)]
    rows = []
    for r in df.itertuples(index=False):
        rows.append(tuple(canon(v) for v in r))
    return sorted(df.columns), sorted(rows)


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
        sdf = pd.read_parquet(qdir)  # pyarrow path, like the driver
        try:
            scols, srows = rows_of(sdf)
        except TypeError as e:
            print(f"{name}: FAIL spark-side {e}")
            failures += 1
            continue
        if name not in oracle:
            print(f"{name}: NO-ORACLE rows={len(srows)}")
            continue
        odf = con.sql(oracle[name]).df()  # .df() path, like the driver
        try:
            ocols, orows = rows_of(odf)
        except TypeError as e:
            print(f"{name}: FAIL oracle-side {e}")
            failures += 1
            continue
        if list(scols) != list(ocols):
            print(f"{name}: FAIL cols spark={list(scols)} oracle={list(ocols)}")
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
