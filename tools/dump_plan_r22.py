#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r22/<q>_<tag>.txt."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    from csv_to_parquet_aws_datalake_spark import registry
    from csv_to_parquet_aws_datalake_spark.session import build_session
    registry.load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("dump-plan-r22")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        df = registry.QUERIES[n](spark, sf_dir)
        with open(os.path.join(REPO, "plans", "r22", f"{n}_{tag}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print("wrote", n, tag)
    spark.stop()

if __name__ == "__main__":
    raise SystemExit(main())
