#!/usr/bin/env python3
"""Standing sf1 correctness gate (round-9 verdict #10): the full oracle
replay at 10x the bench SF, promoted from a round ritual to a recorded
artifact. Runs graft.Verify over /tmp/sfdata/sf1 (generating the dataset
with make_sf1.py if absent), oracle-compares every query with compare.py,
and writes SF1_r{N}.json next to the round's BENCH artifact.

q70 is skipped BY DESIGN at this scale: its raw id-level pair dump is
output-quadratic in dup-group size (~1.3B rows at sf1; the oracle side
needs ~1e9 single-node levenshtein calls). Its bounded twin q147 IS in the
sweep and covers the operator; q70 itself stays exact-checked at sf<=0.1.

Usage: python3 tools/sf1_gate.py <round-number> [sf1dir] [outdir]
"""
import json, os, re, subprocess, sys, time

rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdata/sf1"
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1_gate_out"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKIP = "q70"

if not os.path.exists(f"{sf1}/lineitem.parquet"):
    print(f"[sf1-gate] generating {sf1} via make_sf1.py", flush=True)
    subprocess.run([sys.executable, f"{repo}/tools/make_sf1.py", sf1], check=True)

t0 = time.time()
v = subprocess.run(
    ["sbt", "-batch", f"runMain graft.Verify {sf1} {out} - {SKIP}"],
    cwd=repo, capture_output=True, text=True)
verify_sec = time.time() - t0
crashed = sorted(set(re.findall(r"\[verify\] (\S+) failed", v.stderr + v.stdout)))
if v.returncode != 0:
    print(v.stdout[-3000:]); print(v.stderr[-3000:])
    sys.exit(f"[sf1-gate] Verify exited {v.returncode}")

t1 = time.time()
c = subprocess.run(
    [sys.executable, f"{repo}/tools/compare.py", sf1, out, "q", SKIP],
    cwd=repo, capture_output=True, text=True)
compare_sec = time.time() - t1
print(c.stdout[-4000:])
m = re.search(r"(\d+)/(\d+) oracle-checked queries OK; failures: \[(.*?)\]",
              c.stdout, re.S)
if not m:
    print(c.stderr[-2000:])
    sys.exit("[sf1-gate] compare.py summary line not found")
ok, total = int(m.group(1)), int(m.group(2))
failures = [f.strip(" '\"") for f in m.group(3).split(",") if f.strip()]

commit = subprocess.run(
    ["git", "rev-parse", "--short", "HEAD"], cwd=repo,
    capture_output=True, text=True).stdout.strip() or "unknown"

artifact = {
    "round": rnd,
    "commit": commit,
    "sf": sf1,
    "total": total,
    "ok": ok,
    "failures": sorted(set(failures) | set(crashed)),
    "skipped": [SKIP],
    "verify_sec": round(verify_sec, 1),
    "compare_sec": round(compare_sec, 1),
}
path = f"{repo}/SF1_r{rnd}.json"
with open(path, "w") as f:
    json.dump(artifact, f, indent=2, sort_keys=True)
print(f"[sf1-gate] wrote {path}: {ok}/{total} OK, "
      f"failures={artifact['failures']}")
sys.exit(0 if ok == total and not artifact["failures"] else 1)
