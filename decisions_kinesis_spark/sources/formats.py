"""File-format source/sink surface (SURVEY.md §2 "file formats: none in
reference" → new-engine breadth: parquet is primary; CSV/JSON/ORC are
interchange formats).

Everything goes through explicit schemas — ``inferSchema`` is a full
extra pass over the data and nondeterministic under schema drift, so
the engine never uses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WRITE_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Sink: columnar (parquet/orc) or line (json/csv) with sane defaults."""
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_table_as(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType, **options
) -> DataFrame:
    """Source with mandatory explicit schema (no inference pass)."""
    reader = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
