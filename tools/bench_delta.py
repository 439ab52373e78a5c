#!/usr/bin/env python3
"""Cross-round bench delta adjudicator (VERDICT r12 ask #6).

Usage: python3 tools/bench_delta.py <BENCH_DETAIL_old.json> <BENCH_DETAIL_new.json> [top_n]

Compares the 1x per-query sweep between two BENCH_DETAIL artifacts and
annotates every mover with the HOST CONTEXT recorded at each sweep's
level (host.levels["1x"]: loadavg + re-measured noop floor, plus the
floor_per_job model) so "weather vs regression" is adjudicated by the
artifact, not prose:

  - ctx_ratio = median(new/old) over the common surface — the
    sweep-wide multiplicative drift (load + page-cache weather); its
    EVIDENCE is the recorded loadavg/floor pair printed beside it
  - floor_ctx = jobs_1x[q] * (floor_per_job_new - floor_per_job_old)
    (the additive part the per-job scheduling floor explains)
  - residual  = new - (old * ctx_ratio + floor_ctx - jobs*Δfpj already
    inside the ratio is fine: the two context terms are reported
    separately, the verdict uses the ratio model which dominates)
  - verdict   = "context" if |new - old*ctx_ratio| <= max(0.06s,
    15% of old*ctx_ratio), else "mover"

Prints the top-N absolute movers with both verdicts and a summary
line. Dev/measurement tool only — not part of the library.
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main(old_path, new_path, top_n=15):
    old, new = load(old_path), load(new_path)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    fpj_o = old.get("floor_per_job", 0.0) or 0.0
    fpj_n = new.get("floor_per_job", 0.0) or 0.0
    jobs = new.get("jobs_1x", {}) or old.get("jobs_1x", {}) or {}
    lvl_o = (old.get("host", {}).get("levels", {}) or {}).get("1x", {})
    lvl_n = (new.get("host", {}).get("levels", {}) or {}).get("1x", {})
    print(f"old 1x level: loadavg={lvl_o.get('loadavg','?')} "
          f"floor={lvl_o.get('floor','?')} floor_per_job={fpj_o}")
    print(f"new 1x level: loadavg={lvl_n.get('loadavg','?')} "
          f"floor={lvl_n.get('floor','?')} floor_per_job={fpj_n}")
    ratios = [qn[q] / qo[q] for q in common if qo[q] > 0]
    ctx_ratio = statistics.median(ratios) if ratios else 1.0
    print(f"context drift (median new/old over {len(common)} queries): "
          f"{ctx_ratio:.3f}")
    rows = []
    for q in common:
        a, b = qo[q], qn[q]
        delta = b - a
        nj = jobs.get(q, 1)
        floor_ctx = nj * (fpj_n - fpj_o)
        expected = a * ctx_ratio
        residual = b - expected
        tol = max(0.06, 0.15 * expected)
        verdict = "context" if abs(residual) <= tol else "mover"
        rows.append((abs(residual), q, a, b, delta, nj, floor_ctx,
                     residual, verdict))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'old':>7s} {'new':>7s} {'delta':>7s} "
          f"{'jobs':>4s} {'floor':>7s} {'resid':>7s}  verdict")
    for _, q, a, b, d, nj, e, r, v in rows[:top_n]:
        print(f"{q:34s} {a:7.3f} {b:7.3f} {d:+7.3f} {nj:4d} "
              f"{e:+7.3f} {r:+7.3f}  {v}")
    movers = [r for r in rows if r[-1] == "mover"]
    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    print(json.dumps({
        "common": len(common), "total_old": round(tot_o, 2),
        "total_new": round(tot_n, 2),
        "movers": [r[1] for r in movers[:top_n]],
        "n_movers": len(movers),
        "n_context_explained": len(rows) - len(movers)}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 15)
