"""Dump .explain('formatted') for catalog queries to plans/<dir>/.

Usage: python tools/dump_plan.py <outdir> <query> [suffix]
Writes plans/<outdir>/<query>_<suffix>.txt (suffix defaults to 'after').
"""

import os
import sys


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from cloudfloe_spark.queries import all_queries
    from cloudfloe_spark.session import get_spark

    outdir, name = sys.argv[1], sys.argv[2]
    suffix = sys.argv[3] if len(sys.argv) > 3 else "after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    df = all_queries()[name].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(here, "plans", outdir, f"{name}_{suffix}.txt")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(plan)
    print(path)


if __name__ == "__main__":
    main()
