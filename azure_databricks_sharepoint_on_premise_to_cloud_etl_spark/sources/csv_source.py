"""CSV sources with explicit schemas (SURVEY.md 2.1 S1/S2).

The reference never infers schemas on CSV — every load passes
``inferSchema=false`` plus a hand-built StructType
(code/ukg_open_census.py:249, code/ukg_dept_bus_strctr.py:72).  Same
stance here: inference is nondeterministic across samples, and at
100 TB an inference pass is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions import last_path_segment


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    encoding: str = "UTF-8",
    multi_line: bool = False,
    quote: str = '"',
) -> DataFrame:
    """S1: schema-declared CSV scan.  ``multiLine``/``quote``/
    ``encoding`` options subsume most of the reference's byte-level
    cleansing needs (S9) for well-formed-enough files."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("inferSchema", "false")
        .option("encoding", encoding)
        .option("multiLine", str(multi_line).lower())
        .option("quote", quote)
        .csv(path)
    )


def read_csv_dir_with_filename(
    spark: SparkSession,
    directory: str,
    schema: StructType | str,
    filename_col: str = "file_nm",
) -> DataFrame:
    """S2 (code/ukg_open_census.py:366-371): directory scan capturing
    each row's source filename — the key for the processed-file ledger
    (T2) and latest-batch selection (T3)."""
    df = read_csv(spark, directory, schema)
    return df.withColumn(
        filename_col, last_path_segment(F.input_file_name())
    )
