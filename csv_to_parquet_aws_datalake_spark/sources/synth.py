"""Custom Python DataSource (Spark 4 extension point): a partitioned,
deterministic synthetic-rows source.

This is the engine's answer to "my data lives behind an API/format Spark
has no connector for": subclass DataSource/DataSourceReader in pure
Python, declare partitions, and every executor reads its slice in
parallel — the same contract JVM connectors implement, minus the JVM.
The generator is a pure function of the row index, so a SQL oracle can
recompute the identical relation from range().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "10000"))
        self.parts = int(options.get("parts", "8"))

    def partitions(self):
        step = max(1, self.n // self.parts)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [_Slice(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            # pure function of i — the oracle recomputes this from range()
            yield (i, (i * 7919) % 1000, i % 7)


class SynthRowsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthrows"

    def schema(self) -> str:
        return "id bigint, val bigint, grp bigint"

    def reader(self, schema) -> DataSourceReader:
        return _SynthReader(self.options)


@query(
    "a15_python_datasource",
    oracle="""
        SELECT i % 7 AS grp, count(*) AS n,
               CAST(sum((i * 7919) % 1000) AS BIGINT) AS sv,
               min(i) AS lo, max(i) AS hi
        FROM range(10000) t(i)
        GROUP BY 1
    """,
)
def a15_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the registered Python data source with 8 declared
    input partitions (each executor generates its slice — verified
    parallelism, not a driver-side collect), then aggregate per group.
    DuckDB's sum of BIGINT is HUGEINT, hence the explicit BIGINT cast
    discipline does not apply to count/min/max but sv must stay BIGINT
    via the Spark-side sum over bigint (Spark) vs CAST in the oracle."""
    # the DataSource class is cloudpickled to executor-side Python workers;
    # module-level classes normally serialize BY REFERENCE, which breaks
    # when the driver process runs outside the repo (workers can't import
    # the package).  Registering the module by value makes the pickle
    # self-contained — verified against a conf-free session started in /tmp.
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    try:
        spark.dataSource.register(SynthRowsSource)
    except Exception as exc:  # tolerate ONLY re-registration in a warm session
        if "already" not in str(exc).lower():
            raise
    df = (spark.read.format("synthrows")
          .option("n", "10000").option("parts", "8").load())
    return df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").alias("sv"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    )
