"""Custom Python DataSource reproducing the reference's input model:
one input split — and therefore one Spark partition / map task — per file
(mapreduce.c:173-175: ``ThreadPool_add_job(... mapper, file_names[i])``),
with the file name visible to the consumer the way the reference hands it
to the Mapper (mapreduce.h:5, distwc.c:7).

Built on Spark 4's Python DataSource V2 API, so the engine's planner
treats it like any other source (column pruning etc. at the Python
boundary). For real large files prefer ``spark.read.text`` which splits
them; this source is the *fidelity* path where file == task is the
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class MRTextDataSource(DataSource):
    """``spark.read.format("mrtext").option("paths", "a.txt,b.txt")``."""

    @classmethod
    def name(cls) -> str:
        return "mrtext"

    def schema(self) -> str:
        return "file string, line string"

    def reader(self, schema) -> "MRTextReader":
        return MRTextReader(self.options)


class MRTextReader(DataSourceReader):
    def __init__(self, options):
        paths = options.get("paths", "")
        self.paths = [p for p in paths.split(",") if p]
        if not self.paths:
            raise ValueError("mrtext: option 'paths' (comma-separated) is required")

    def partitions(self):
        # the reference's split model: exactly one partition per file
        return [InputPartition(p) for p in self.paths]

    def read(self, partition):
        path = partition.value
        with open(path) as fh:
            for line in fh:
                yield (path, line.rstrip("\n"))


def register_mrtext(spark: SparkSession) -> None:
    spark.dataSource.register(MRTextDataSource)


def read_mrtext(spark: SparkSession, paths: list[str]) -> DataFrame:
    register_mrtext(spark)
    return spark.read.format("mrtext").option("paths", ",".join(paths)).load()
