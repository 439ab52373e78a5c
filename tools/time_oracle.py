#!/usr/bin/env python3
"""Time the DuckDB oracle on a scale-factor directory.

Usage: python3 tools/time_oracle.py <sfDir> [oracle_sql.json] [out.json]

Runs every oracle query once (DuckDB has no JIT warm-up: cold ~= warm)
against parquet views over <sfDir> and prints per-query seconds plus
the total — the honest single-node baseline the bench total is
compared against. Materializes each result via fetchall() so the full
query executes. When an output path is given (convention:
DUCKDB_r{N}.json beside BENCH_r{N}.json), writes the FULL per-query
map with host context (loadavg, oracle-dump md5) so the
bench-vs-baseline ratio is two artifacts, not a prose claim
(VERDICT r12 ask #5). Dev/measurement tool only — not part of the
library.
"""
import hashlib
import json
import os
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, oracle_path, out_path=None):
    oracle_text = Path(oracle_path).read_text()
    oracle = json.loads(oracle_text)
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single-file tables; Spark-written replicas
        # (e.g. the bench's 10x dir) are part-file DIRECTORIES
        path = Path(sf_dir) / f"{t}.parquet"
        pattern = f"{path}/*.parquet" if path.is_dir() else str(path)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    load_before = os.getloadavg()
    timings = {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()
            timings[name] = round(time.time() - t0, 4)
        except Exception as e:  # count failures, keep timing the rest
            timings[name] = -1.0
            print(f"{name}: ERROR {e}", file=sys.stderr)
    ok = {k: v for k, v in timings.items() if v >= 0}
    for k, v in sorted(ok.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v:7.3f}  {k}")
    summary = {
        "metric": "duckdb_oracle_total", "value": round(sum(ok.values()), 3),
        "unit": "sec", "n_queries": len(ok), "sf": sf_dir,
        "failed": sorted(k for k, v in timings.items() if v < 0)}
    print(json.dumps(summary))
    if out_path:
        artifact = dict(summary)
        artifact["queries"] = timings
        artifact["host"] = {
            "loadavg_before": list(load_before),
            "loadavg_after": list(os.getloadavg()),
            "cpus": os.cpu_count()}
        artifact["oracle_dump_md5"] = hashlib.md5(
            oracle_text.encode()).hexdigest()
        Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
        print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    out = sys.argv[3] if len(sys.argv) > 3 else None
    main(sf, oracle, out)
