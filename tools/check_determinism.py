"""Spark-vs-Spark determinism sweep: run every queries() entry TWICE at
the given SF and compare normalized results. Catches the
monotonically_increasing_id / AQE-re-planning class of bug (see the r5
raster_join fix) that the DuckDB oracle gate can miss when it happens to
pass on one lucky evaluation — especially for queries whose oracles are
too expensive to run at larger SFs.

Run: python tools/check_determinism.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    from rasterframes_spark import create_rf_spark_session
    import __spark_entry__ as e

    spark = create_rf_spark_session(app_name="rf-determinism")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name, fn in e.queries().items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            a = norm(fn(spark, SF_DIR).toPandas())
            b = norm(fn(spark, SF_DIR).toPandas())
            ok = a.equals(b)
        except Exception as ex:  # noqa: BLE001 - report and continue
            print(f"ERROR {name}: {ex}")
            failures.append(name)
            continue
        print(f"{'PASS' if ok else 'FAIL'} {name}: rows={len(a)} "
              f"({time.time() - t0:.1f}s)")
        if not ok:
            failures.append(name)
            neq = (a != b).any(axis=1)
            print(a[neq].head(3))
            print(b[neq].head(3))
    if failures:
        print("NONDETERMINISTIC:", failures)
        sys.exit(1)
    print("ALL DETERMINISTIC")


if __name__ == "__main__":
    main()
