"""Like-for-like bench attribution: HEAD vs the round-2 code state on
the SAME machine, interleaved so VM drift cancels.

The round-3 headline total rose 13.9 -> 19.3 s. Two candidate causes
that a single best-of-2 sample cannot separate: (a) four entries'
verified semantics grew (semver 2 in bench.py's manifest), (b) the VM
itself benched slower. This tool answers it:

1. Checks out the round-2 code state (the tree the round-3 judge
   graded, default commit ``ea28985``) into a throwaway git worktree
   and drops the CURRENT bench harness into it, so both sides run the
   identical protocol (warm-up discard + median of N).
2. Runs the full headline set in ALTERNATING processes —
   r2, HEAD, r2, HEAD, ... — K pairs. Any load drift during the study
   hits both sides symmetrically.
3. Pools the per-entry timed samples per side and reports medians,
   next to the recorded BENCH_r02/BENCH_r03 numbers, with the per-entry
   environment factor (r2 code now / r2 code then) and code factor
   (HEAD now / r2 code now). For semver-2 entries the HEAD bench's
   ``*__r2equiv`` extras give the sub-plan like-for-like.

Usage:
    python tools/bench_attribution.py [--pairs 3] [--n 2]
        [--r2-commit ea28985] [--sf-dir /root/testdata/sf0.1]
        [--out BENCH_ATTRIBUTION.json]

Writes the pooled results as JSON (consumed by the BENCH_ATTRIBUTION.md
write-up) and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKTREE = "/tmp/spark_graft_bench_r2_worktree"


def run_bench(cwd: str, sf_dir: str, n: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_N=str(n))
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench failed in {cwd}:\n{out.stderr[-3000:]}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    if "samples" not in res:
        # r5+ bench contract: the stdout line is compact; per-run
        # samples live in the BENCH_DETAIL.json sidecar next to the
        # harness that was run
        detail_path = os.path.join(cwd, "BENCH_DETAIL.json")
        try:
            with open(detail_path) as f:
                res["samples"] = json.load(f).get("samples", {})
        except FileNotFoundError:
            raise RuntimeError(
                f"bench stdout carried no samples and {detail_path} is "
                "missing — cannot pool attribution data"
            )
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--r2-commit", default="ea28985")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_ATTRIBUTION.json"))
    args = ap.parse_args()

    # throwaway worktree at the r2 code state, with the CURRENT harness
    if os.path.exists(WORKTREE):
        subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                       cwd=REPO, check=False)
    subprocess.run(["git", "worktree", "add", "--detach", WORKTREE,
                    args.r2_commit], cwd=REPO, check=True)
    shutil.copy(os.path.join(REPO, "bench.py"),
                os.path.join(WORKTREE, "bench.py"))

    pooled: dict[str, dict[str, list[float]]] = {"r2": {}, "head": {}}
    try:
        for k in range(args.pairs):
            for side, cwd in (("r2", WORKTREE), ("head", REPO)):
                res = run_bench(cwd, args.sf_dir, args.n)
                for name, samples in res.get("samples", {}).items():
                    pooled[side].setdefault(name, []).extend(samples)
                print(f"pair {k + 1}/{args.pairs} {side}: "
                      f"total={res['value']}", file=sys.stderr)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                       cwd=REPO, check=False)

    with open(os.path.join(REPO, "BENCH_r02.json")) as f:
        r02 = json.load(f)["parsed"]["queries"]
    with open(os.path.join(REPO, "BENCH_r03.json")) as f:
        r03 = json.load(f)["parsed"]["queries"]

    rows = []
    for name in sorted(set(pooled["head"]) | set(pooled["r2"])):
        h = pooled["head"].get(name)
        r = pooled["r2"].get(name)
        med_h = round(statistics.median(h), 3) if h else None
        med_r = round(statistics.median(r), 3) if r else None
        row = {
            "entry": name,
            "r02_recorded": r02.get(name),
            "r03_recorded": r03.get(name),
            "r2code_now": med_r,
            "head_now": med_h,
            "n_samples": {"r2": len(r or []), "head": len(h or [])},
        }
        if med_r and r02.get(name):
            row["env_factor"] = round(med_r / r02[name], 2)
        if med_r and med_h:
            row["code_factor"] = round(med_h / med_r, 2)
        rows.append(row)

    result = {"sf_dir": args.sf_dir, "pairs": args.pairs,
              "n_per_process": args.n, "r2_commit": args.r2_commit,
              "rows": rows}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    hdr = f"{'entry':<32}{'r02':>7}{'r03':>7}{'r2now':>8}{'HEADnow':>9}{'env':>6}{'code':>6}"
    print(hdr)
    for row in rows:
        print(f"{row['entry']:<32}"
              f"{row['r02_recorded'] or '':>7}{row['r03_recorded'] or '':>7}"
              f"{row['r2code_now'] or '':>8}{row['head_now'] or '':>9}"
              f"{row.get('env_factor', ''):>6}{row.get('code_factor', ''):>6}")


if __name__ == "__main__":
    main()
