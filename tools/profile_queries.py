"""Per-query time breakdown: build (driver-side construction: collects,
eager checkpoints, planning) vs execute (the .count() action), min-of-N.

Usage: python tools/profile_queries.py [query,query,...] [N]
Writes nothing; prints a table to stdout. Meant for quiet-box analysis,
not the canonical record (bench.py stays that).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("CMW_CACHE", "1")

    from cm_well_spark.model.lakehouse import load_infotons, load_triples
    from cm_well_spark.registry import queries
    from cm_well_spark.session import get_spark

    import bench

    qs = queries()
    names = sys.argv[1].split(",") if len(sys.argv) > 1 and sys.argv[1] != "-" else bench.CORE_QUERIES
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("cm_well_profile")
    # warm store like bench
    load_infotons(spark, sf_dir).count()
    load_triples(spark, sf_dir).count()

    print(f"{'query':30s} {'build_s':>8s} {'exec_s':>8s} {'total_s':>8s}")
    for name in names:
        if name not in qs:
            continue
        fn = qs[name]
        best_b = best_e = best_t = float("inf")
        for _ in range(samples):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            best_b = min(best_b, t1 - t0)
            best_e = min(best_e, t2 - t1)
            best_t = min(best_t, t2 - t0)
        print(f"{name:30s} {best_b:8.3f} {best_e:8.3f} {best_t:8.3f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
