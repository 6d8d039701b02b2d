#!/usr/bin/env python3
"""Per-query sf0.1 -> sf1 bench cost slopes — the superlinear-query detector
(round-11 plan item 1). Reads two graft.Bench JSON lines (same code, same
machine, 10x data) and emits BENCH_SF1_r{N}.json with the per-query ratio and
a flagged list.

Flag rule: ratio > THRESH (default 12 — 10x data plus shuffle/sort log-factor
slack) AND the sf1 time >= MIN_SF1_SEC (1.0s). Sub-second queries at BOTH
scales are fixed-overhead-dominated (scheduler + codegen + scan setup), so a
big ratio there measures the constant term, not the algorithm; they are
reported separately as overhead_dominated rather than silently dropped.

Usage: bench_slope.py <bench_sf01.json> <bench_sf1.json> <out.json> [round]
"""
import json
import os
import subprocess
import sys

THRESH = 12.0
MIN_SF1_SEC = 1.0


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    small, big, out = sys.argv[1], sys.argv[2], sys.argv[3]
    rnd = sys.argv[4] if len(sys.argv) > 4 else "11"
    a, b = load(small), load(big)
    qa, qb = a["queries"], b["queries"]
    rows = {}
    flagged, overhead, failed = [], [], []
    for q in sorted(qa):
        if q not in qb:
            continue  # skipped at sf1 (e.g. q70)
        sa, sb = qa[q], qb[q]
        if sa < 0 or sb < 0:
            failed.append(q)
            continue
        ratio = round(sb / sa, 2) if sa > 0 else None
        rows[q] = {"sf01": sa, "sf1": sb, "ratio": ratio}
        if ratio is not None and ratio > THRESH:
            if sb >= MIN_SF1_SEC:
                flagged.append(q)
            else:
                overhead.append(q)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=repo,
        capture_output=True, text=True).stdout.strip() or "unknown"
    result = {
        "round": rnd,
        "commit": commit,
        "threshold": THRESH,
        "min_sf1_sec": MIN_SF1_SEC,
        "n_compared": len(rows),
        "skipped_at_sf1": sorted(set(qa) - set(qb)),
        "failed": failed,
        "flagged_superlinear": flagged,
        "overhead_dominated": overhead,
        "totals": {
            "sf01_total": round(sum(r["sf01"] for r in rows.values()), 1),
            "sf1_total": round(sum(r["sf1"] for r in rows.values()), 1),
            "total_ratio": round(
                sum(r["sf1"] for r in rows.values())
                / max(1e-9, sum(r["sf01"] for r in rows.values())), 2),
        },
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"compared={len(rows)} total_ratio={result['totals']['total_ratio']}"
          f" flagged={flagged} overhead_dominated={overhead} failed={failed}")


if __name__ == "__main__":
    main()
