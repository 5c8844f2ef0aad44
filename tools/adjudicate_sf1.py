"""Fresh-session singles of one sf1 rehearsal leg (VERDICT r11 #1).

The r11 record's minhash sf1 breach (x10 = 2.34 official / 2.83 judge)
had run MINIMA matching the r10 singles while the medians were 2-3x —
evidence pointing at the in-session median-of-3 regime, not the
operator.  The decisive measurement is N FRESH-SESSION singles of the
same leg: each run gets a cold JVM (no accumulated broadcast/shuffle/
old-gen debris), so if the singles sit at the r10 level the operator
is exonerated and the regime hygiene (bench.py r12: cached-input
release + System.gc between repeats) owns the fix.

Each single runs in a SUBPROCESS so sessions share nothing.  Output:
one JSON line {"leg", "sf_dir", "runs": [sec...], "median", "min",
"load1"} on stdout.

Usage:
    python tools/adjudicate_sf1.py [leg] [N]      # default minhash 5
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SINGLE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from rasterframes_spark import create_rf_spark_session
import bench
from rasterframes_spark import pipeline as P

spark = create_rf_spark_session(app_name="adjudicate-sf1")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = {sf_dir!r}
# warm-up: JVM + Python workers (the r11 diagnosis: fresh-session
# scatter is first-run worker spawn; warm once, untimed, on foreign
# work so the leg itself still runs cold-cache)
spark.read.parquet(f"{{sf_dir}}/lineitem.parquet").limit(10).count()
docs10 = bench._docs10(spark, sf_dir)
docs10.count()
t0 = time.time()
n = bench._count_release(P.minhash_dedup_pairs(
    docs10, "doc_id", "text", num_perm=32, bands=16, threshold=0.8))
wall = time.time() - t0
spark.sparkContext.setLogLevel("OFF")
spark.stop()
sys.stdout.flush()
print(json.dumps({{"sec": round(wall, 3), "pairs": n}}))
"""


def main():
    leg = sys.argv[1] if len(sys.argv) > 1 else "minhash_dedup"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    if leg != "minhash_dedup":
        raise SystemExit("only the minhash_dedup leg is scripted so far")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    code = _SINGLE.format(repo=REPO, sf_dir=sf_dir)
    runs = []
    for i in range(n):
        p = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                           capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in reversed(p.stdout.splitlines())
                     if ln.startswith("{")), None)
        if p.returncode != 0 or line is None:
            raise RuntimeError(f"single {i} failed rc={p.returncode}\n"
                               f"{p.stderr[-1500:]}")
        got = json.loads(line)
        runs.append(got["sec"])
        print(f"single {i + 1}/{n}: {got['sec']} s "
              f"({got['pairs']} pairs)", file=sys.stderr)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    print(json.dumps({"leg": leg, "sf_dir": sf_dir, "runs": runs,
                      "median": round(statistics.median(runs), 3),
                      "min": min(runs), "load1": load1}))


if __name__ == "__main__":
    main()
