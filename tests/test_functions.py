from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.functions import (
    char_shingles,
    filename_embedded_ts,
    last_path_segment,
    overnight_corrected_end,
    portable_hash64,
    prefix_path,
    word_tokens,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_prefix_path_levels(spark):
    path = "org/east/ny/cc12/unit3/dept9"
    df = spark.createDataFrame([(path,)], "p STRING")
    r = df.select(
        prefix_path("p", 4).alias("p4"), prefix_path("p", 5).alias("p5")
    ).first()
    # reference semantics: first 4 / 5 slash-segments
    # (code/ukg_open_census.py:183-193)
    assert r["p4"] == "org/east/ny/cc12"
    assert r["p5"] == "org/east/ny/cc12/unit3"


def test_prefix_path_short_input(spark):
    df = spark.createDataFrame([("a/b",)], "p STRING")
    assert df.select(prefix_path("p", 4).alias("x")).first()["x"] == "a/b"


def test_last_path_segment(spark):
    df = spark.createDataFrame([("dbfs:/mnt/raw/file_123.csv",)], "p STRING")
    assert df.select(last_path_segment("p").alias("x")).first()["x"] == "file_123.csv"


def test_filename_embedded_ts(spark):
    # file_nm embeds a 12-digit timestamp at chars 9-20 (FIXTURES.md 2.1)
    df = spark.createDataFrame([("RWBFILE_230412153000.csv",)], "f STRING")
    assert (
        df.select(filename_embedded_ts("f").alias("x")).first()["x"] == 230412153000
    )


def test_portable_hash64_matches_duckdb(spark):
    import duckdb

    val = spark.createDataFrame([("hello world",)], "s STRING").select(
        portable_hash64(F.col("s"), seed=3).alias("h")
    ).first()["h"]
    duck = duckdb.sql(
        "SELECT CAST(concat('0x', substr(md5('3:hello world'), 1, 15)) AS BIGINT)"
    ).fetchone()[0]
    assert val == duck


def test_overnight_corrected_end(spark):
    df = spark.createDataFrame(
        [("2023-04-12 19:00:00", "2023-04-12 07:00:00"),
         ("2023-04-12 07:00:00", "2023-04-12 19:00:00")],
        "s STRING, e STRING",
    ).select(
        F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e")
    )
    out = df.select(
        "s", overnight_corrected_end(F.col("s"), F.col("e")).alias("e2")
    ).collect()
    # end >= start always holds after correction (SURVEY 7.5 risk 4)
    assert all(r["e2"] >= r["s"] for r in out)


def test_char_shingles_count_and_short_string(spark):
    df = spark.createDataFrame([("abcdef",), ("ab",)], "t STRING")
    rows = df.select(F.col("t"), char_shingles("t", 5).alias("sh")).collect()
    by_t = {r["t"]: r["sh"] for r in rows}
    assert by_t["abcdef"] == ["abcde", "bcdef"]
    assert by_t["ab"] == ["ab"]  # shorter than k -> whole string


def test_word_tokens_drops_empties(spark):
    df = spark.createDataFrame([("  Hello   World  ",)], "t STRING")
    assert df.select(word_tokens("t").alias("tk")).first()["tk"] == ["hello", "world"]
