"""A/B bench attribution: re-bench a BASE commit and HEAD back-to-back,
interleaved, so code-attributed speed changes are separated from box noise
(the driver's one-shot BENCH_r{N} number is ±25% noisy round-to-round;
r5's code was measured ~23% faster while the driver one-shot read flat).

Method (the d2db00f protocol, made standing):
  - BASE is checked out into a detached git worktree under .scratch/
    (gitignored; removed afterwards) — the working tree is never touched.
  - N interleaved rounds of (BASE bench, HEAD bench), each a fresh
    subprocess with its own Spark JVM, same SPARK_GRAFT_SF_DIR.
  - Records per-variant totals per round, the per-variant MIN total and
    per-query min-over-rounds, and the head/base ratio on the min totals.

Usage:
    python tools/bench_ab.py --round 6 [--base <commit>] [--n 3]

BASE defaults to the most recent commit whose subject starts with
"round N: verdict" (the driver's round-start commit — code-identical to
the previous round's final HEAD). Writes BENCH_AB_r{round}.json at the
repo root and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args: list[str], cwd: str = REPO, check: bool = True) -> str:
    return subprocess.run(
        args, cwd=cwd, capture_output=True, text=True, check=check
    ).stdout.strip()


def default_base() -> str:
    out = sh(["git", "log", "--grep", "^round [0-9]*: verdict", "-1",
              "--format=%H"])
    if not out:
        raise SystemExit("no 'round N: verdict' commit found; pass --base")
    return out


def run_bench(cwd: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(cwd, "bench.py")],
        cwd=cwd, env=env, capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--base", default=None)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    base = args.base or default_base()
    head = sh(["git", "rev-parse", "HEAD"])
    wt = os.path.join(REPO, ".scratch", "bench_ab_base")
    if os.path.exists(wt):
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)
    os.makedirs(os.path.dirname(wt), exist_ok=True)
    sh(["git", "worktree", "add", "--detach", wt, base])
    try:
        runs: dict[str, list[dict]] = {"base": [], "head": []}
        for i in range(args.n):
            for variant, cwd in (("base", wt), ("head", REPO)):
                rec = run_bench(cwd, args.sf_dir)
                runs[variant].append(rec)
                print(json.dumps({"round": i + 1, "variant": variant,
                                  "total": rec["value"]}), flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)

    def summarize(recs: list[dict]) -> dict:
        totals = [r["value"] for r in recs]
        qmins = {q: round(min(r["queries"][q] for r in recs), 3)
                 for q in recs[0]["queries"]}
        return {"totals": totals, "min_total": min(totals),
                "queries_min": qmins}

    s_base, s_head = summarize(runs["base"]), summarize(runs["head"])
    result = {
        "metric": "bench_ab",
        "round": args.round,
        "base_commit": base,
        "head_commit": head,
        "n_interleaved": args.n,
        "sf_dir": args.sf_dir,
        "base": s_base,
        "head": s_head,
        "head_over_base_min_total": round(
            s_head["min_total"] / s_base["min_total"], 3),
    }
    out = os.path.join(REPO, f"BENCH_AB_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
