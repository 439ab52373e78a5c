#!/usr/bin/env python3
"""Scale-decade correctness: the DuckDB-oracle compare (tools/compare.py
semantics, same canonicalization) run against the 10x REPLICA for the
heavy-tail query list — the decade the bench sweeps lean on. The sf0.01
gate proves operator semantics; this proves the semantics SURVIVE a
decade of growth (seed derivation, budget caps, overflow are exactly
the class a small SF cannot see). DuckDB pays minutes per heavy query
at 10x, so each oracle runs under a wall-clock budget in a subprocess;
a query whose oracle exceeds it is recorded as oracle_timeout with the
elapsed time — a named reason, not a silent skip.

Usage: python3 tools/correctness_10x.py <replicaDir> <verifyOutDir> \
    [budgetSec] [outJson]
Writes CORRECTNESS_10x.json (or outJson — the r14 100x gate passes
CORRECTNESS_100x.json) next to the cwd. Dev tool only.
"""
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError("array cell")
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


# Above this many rows the oracle child ships a canonical DIGEST of
# its sorted row tuples instead of the records themselves: pickling a
# 100x output-bound result (q160 at 100x: 500k reassembled documents)
# through the mp.Queue kills the child, which used to surface as
# oracle_error. Digest compare is exactly the sorted-rows equality the
# record path checks, minus first_diff_rows debuggability.
DIGEST_ROWS = 200_000


def digest_rows(cols, rows):
    import hashlib
    h = hashlib.sha256()
    h.update(repr(list(cols)).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def big_limit_gb():
    """85% of MemAvailable — the escalation limit for oracles whose
    48GB-limit spill exceeds this host's free DISK (q149 at 10x needs
    >76GB of temp under 48GB but completes in RAM at ~100GB; measured
    boundary: 100GB ok, 89GB still ENOSPC). Not the default: a ~100GB
    limit plus pandas materialization OOM-killed q160's 100x child,
    which is fine at 48GB."""
    avail_kb = 0
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_kb = int(line.split()[1])
                    break
    except OSError:
        pass
    return max(48, int(avail_kb / 1024 / 1024 * 0.85))


def run_oracle(sf_dir, sql, q, limit_gb=48):
    # fresh process: an over-budget DuckDB query is killed, not joined
    import duckdb
    con = duckdb.connect()
    # the CHILD misdetects its memory budget (q160's 100x oracle:
    # "Failed to allocate block of 1.2MB" with 119G free, while the
    # identical query succeeds in-parent) — pin the limit explicitly;
    # insertion order is irrelevant because the compare sorts rows
    # either way, and dropping it halves large-result memory
    con.execute(f"SET memory_limit='{limit_gb}GB'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # replica tables are Spark-written DIRECTORIES of part files;
        # the original testdata is single parquet files — glob both
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    try:
        df = con.sql(sql).df()
    except Exception as e:  # surface the child's error, don't die mute
        q.put(("error", repr(e)[:300]))
        return
    if len(df) > DIGEST_ROWS:
        ocols, orows = rows_of(df)
        q.put(("digest", ocols, len(orows), digest_rows(ocols, orows)))
    else:
        q.put((list(df.columns), df.to_dict("records")))


def main(sf_dir, out_dir, budget_sec=1800, out_json="CORRECTNESS_10x.json"):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        if name not in oracle:
            results[name] = {"status": "no_oracle"}
            continue
        sdf = pd.read_parquet(qdir)
        scols, srows = rows_of(sdf)
        # the budget clock starts when the ORACLE subprocess starts —
        # engine-result read + canonicalization above are not charged
        # to the oracle's deadline (a heavy 10x output could otherwise
        # burn minutes of the oracle's 30-min budget before DuckDB
        # runs a single query)
        # spawn, not fork: the forked child inherits the parent's
        # allocator/thread state and DuckDB fails allocations there
        # that the identical query survives in-parent (q149 at 10x:
        # in-parent 487s OK, forked child dies ~540s at every limit)
        ctx = mp.get_context("spawn")

        def attempt(limit_gb, deadline_at):
            qq = ctx.Queue()
            proc = ctx.Process(target=run_oracle,
                               args=(sf_dir, oracle[name], qq, limit_gb))
            proc.start()
            payload = None
            while proc.is_alive() and time.time() < deadline_at \
                    and payload is None:
                try:
                    payload = qq.get(timeout=2)
                except Exception:
                    pass
            if payload is None:
                try:
                    payload = qq.get(timeout=2)
                except Exception:
                    pass
            if payload is None:
                proc.terminate()
            proc.join()
            return payload

        t0 = time.time()
        deadline = t0 + budget_sec
        payload = attempt(48, deadline)
        # escalate ONCE on a disk-spill failure: some oracles (q149 at
        # 10x) spill past this host's free disk under the proven 48GB
        # default but complete in RAM at the big limit
        if (payload is not None and payload[0] == "error"
                and "No space left on device" in payload[1]
                and time.time() < deadline):
            payload = attempt(big_limit_gb(), deadline)
        elapsed = round(time.time() - t0, 1)
        if payload is None:
            status = ("oracle_timeout" if elapsed >= budget_sec
                      else "oracle_error")
            results[name] = {"status": status, "elapsed_sec": elapsed,
                             "reason": f"DuckDB oracle exceeded {budget_sec}s "
                             "on the 10x replica" if status == "oracle_timeout"
                             else "oracle subprocess died"}
            print(f"{name}: {status} ({elapsed}s)", flush=True)
            continue
        if payload[0] == "error":
            results[name] = {"status": "oracle_error",
                             "elapsed_sec": elapsed, "reason": payload[1]}
            print(f"{name}: oracle_error ({elapsed}s) {payload[1]}", flush=True)
            continue
        if payload[0] == "digest":
            _, ocols, n_orows, odigest = payload
            ok = (list(scols) == list(ocols) and len(srows) == n_orows
                  and digest_rows(scols, srows) == odigest)
            results[name] = {
                "status": "ok" if ok else "mismatch",
                "rows": len(srows), "oracle_rows": n_orows,
                "cols_match": list(scols) == list(ocols),
                "compare": "digest", "elapsed_sec": elapsed}
            print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(srows)} "
                  f"(digest, {elapsed}s)", flush=True)
            continue
        odf = pd.DataFrame(payload[1], columns=payload[0])
        ocols, orows = rows_of(odf)
        ok = (list(scols) == list(ocols) and srows == orows)
        results[name] = {
            "status": "ok" if ok else "mismatch",
            "rows": len(srows), "oracle_rows": len(orows),
            "cols_match": list(scols) == list(ocols),
            "elapsed_sec": elapsed}
        if not ok and len(srows) == len(orows):
            diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            results[name]["first_diff_rows"] = diffs[:3]
        print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(srows)} "
              f"({elapsed}s)", flush=True)
    summary = {
        "sf": sf_dir, "budget_sec": budget_sec,
        "n": len(results),
        "n_ok": sum(1 for r in results.values() if r.get("status") == "ok"),
        "queries": results}
    Path(out_json).write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps({k: v for k, v in summary.items() if k != "queries"}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 1800,
         sys.argv[4] if len(sys.argv) > 4 else "CORRECTNESS_10x.json")
