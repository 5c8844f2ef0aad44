"""Interleaved A/B replay of named bench cells against a pinned prior
checkout (VERDICT r7 #4: automate the manual regression root-cause
procedure from r5/r6).

Sub-second cells drift ±20% round-over-round with zero code changes;
the only way to attribute a move to CODE is to run both versions
interleaved on the same host within the same minutes. This tool:

1. checks the prior rev out into a throwaway git worktree
   (``.bench_ab/<rev>``, gitignored),
2. runs ``bench.py`` alternately from the current tree and the prior
   tree N times each (A B A B ...), with ``SPARK_GRAFT_ONLY_CELLS``
   restricting work to the named cells (prior revs without that filter
   simply run their full suite — slower, same numbers),
3. compares the per-run MEDIAN series and prints a verdict per cell:
   REGRESSION (>10% slower), IMPROVEMENT (>10% faster), or NOISE.

Usage:
    python tools/bench_ab.py CELL[,CELL...] PRIOR_REV [N]
e.g.
    python tools/bench_ab.py explode,assemble HEAD~5 3
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(tree: str, cells: list[str], sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_ONLY_CELLS=",".join(cells),
               SPARK_GRAFT_SKIP_SF1="1",
               SPARK_GRAFT_SF_DIR=sf_dir)
    p = subprocess.run([sys.executable, "bench.py"], cwd=tree, env=env,
                       capture_output=True, text=True, timeout=3600)
    line = next((ln for ln in reversed(p.stdout.splitlines())
                 if ln.startswith("{")), None)
    if p.returncode != 0 or line is None:
        raise RuntimeError(
            f"bench failed in {tree}: rc={p.returncode}\n"
            f"{p.stderr[-2000:]}")
    d = json.loads(line)
    # prior revs may predate the 'median' block — fall back to min
    return d.get("median") or d["queries"]


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    cells = sys.argv[1].split(",")
    rev = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sha = subprocess.check_output(
        ["git", "rev-parse", "--short", rev], cwd=REPO, text=True).strip()
    tree_b = os.path.join(REPO, ".bench_ab", sha)
    if not os.path.isdir(tree_b):
        subprocess.check_call(
            ["git", "worktree", "add", "--detach", tree_b, rev], cwd=REPO)
    try:
        series_a: dict[str, list] = {c: [] for c in cells}
        series_b: dict[str, list] = {c: [] for c in cells}
        for i in range(runs):
            # ALTERNATE the within-pair order (r12): this host's
            # delivered CPU degrades under sustained load, so a fixed
            # A-then-B order biases whichever side always runs second;
            # a same-code control run read 0.62-0.84x ("IMPROVEMENT")
            # from order + steal alone
            pair = (("A", REPO, series_a), ("B", tree_b, series_b))
            if i % 2:
                pair = pair[::-1]
            for tag, tree, series in pair:
                got = _run_bench(tree, cells, sf_dir)
                for c in cells:
                    if c in got:
                        series[c].append(got[c])
                print(f"run {i + 1}/{runs} {tag} "
                      f"{ {c: got.get(c) for c in cells} }",
                      file=sys.stderr)
        report = {}
        for c in cells:
            a, b = series_a[c], series_b[c]
            if not a or not b:
                report[c] = {"verdict": "MISSING", "a": a, "b": b}
                continue
            ma, mb = statistics.median(a), statistics.median(b)
            ratio = round(ma / mb, 3) if mb else None
            # capability (min-of-series) as the second witness: medians
            # absorb steal outliers badly at N=3
            rmin = round(min(a) / min(b), 3) if min(b) else None
            # band widened to +-25% (r12): the same-code control read
            # 0.62x/0.84x on medians — a 10% band fabricates verdicts
            # on this shared-steal host.  A verdict only when BOTH
            # witnesses clear the band on the same side.
            def side(r):
                return (1 if r and r > 1.25 else
                        -1 if r and r < 0.80 else 0)
            sm, sn = side(ratio), side(rmin)
            verdict = ("REGRESSION" if sm == sn == 1 else
                       "IMPROVEMENT" if sm == sn == -1 else
                       "NOISE")
            report[c] = {"current_median": ma, "prior_median": mb,
                         "current_over_prior": ratio,
                         "min_over_prior_min": rmin, "verdict": verdict,
                         "a_runs": a, "b_runs": b}
        print(json.dumps({"prior_rev": sha, "runs": runs,
                          "cells": report}))
    finally:
        subprocess.call(["git", "worktree", "remove", "--force", tree_b],
                        cwd=REPO)


if __name__ == "__main__":
    main()
