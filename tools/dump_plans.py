"""Dump .explain("formatted") for bench core queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [query,query,...]
Writes plans/<tag>/<query>_{before|after}.txt depending on CMW_PLAN_SUFFIX
(default "before"). Uses the sf0.1 store (materialized if needed).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = os.environ.get("CMW_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("CMW_CACHE", "0")  # plans against the parquet layout

    from cm_well_spark.registry import queries
    from cm_well_spark.session import get_spark

    import bench

    qs = queries()
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    else:
        names = bench.CORE_QUERIES
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("cm_well_plan_dump")
    for name in names:
        if name not in qs:
            print(f"# skip {name}: not registered", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record the failure in the file
            plan = f"ERROR building plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"# {name}: {len(plan)} bytes", file=sys.stderr)


if __name__ == "__main__":
    main()
