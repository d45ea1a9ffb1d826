"""Cleaning-pipeline golden tests: the Catalyst F1-F8 chain vs a pandas
oracle executing the reference's exact .str.replace sequence
(reference: src/crawlers/async_bs4.py:58-90, lifted as the oracle here)."""

import pandas as pd

from jobscrawler_spark.functions.cleaning import clean_jobs_df

CASES = [
    ("Senior <b>Engineer</b>", "Remote Job, Berlin {Germany}", 'desc with [brackets] and \'quotes\'"'),
    ("DataData Engineer", "Berlin Berlin Germany", "plain"),
    ("dev", "2023-01-02 London", "x"),
    ("dev", "USD100-200/yr London", "x"),
    ("dev", "New-York/Brooklyn", "x"),
    ("dev", "camelCase LocationHere", "x"),
    ("dev", "Remote Work", "x"),
    ("dev", "remote", "x"),
    ("dev", "REMOTE", "x"),
    ("dev", "  padded  ", "x"),
    ("dev", "Remote with frequent travel", "x"),
    ("a", "Remote Office and Remote Global", "b"),
]


def _pandas_oracle(df: pd.DataFrame) -> pd.DataFrame:
    """Verbatim port of the reference clean function (async_bs4.py:56-90)."""
    df = df.drop_duplicates()
    for col in df.columns:
        if col in ("title", "description"):
            df[col] = df[col].astype(str).str.replace(r'<.*?>|[{}[\]\'",]', "", regex=True)
        elif col == "location":
            df[col] = df[col].astype(str)
            df[col] = df[col].str.replace(r'<.*?>|[{}[\]\'",]', "", regex=True)
            df[col] = df[col].str.replace(r"\b(\w+)\s+\1\b", r"\1", regex=True)
            df[col] = df[col].str.replace(r"\d{4}-\d{2}-\d{2}", "", regex=True)
            df[col] = df[col].str.replace(r"(USD|GBP)\d+-\d+/yr", "", regex=True)
            df[col] = df[col].str.replace("[-/]", " ", regex=True)
            df[col] = df[col].str.replace(r"(?<=[a-z])(?=[A-Z])", " ", regex=True)
            pattern = (
                r"(?i)\bRemote Job\b|\bRemote Work\b|\bRemote Office\b"
                r"|\bRemote Global\b|\bRemote with frequent travel\b"
            )
            df[col] = df[col].str.replace(pattern, "Worldwide", regex=True)
            df[col] = df[col].replace("(?i)^remote$", "Worldwide", regex=True)
            df[col] = df[col].str.strip()
    return df


def test_clean_matches_reference_oracle(spark):
    pdf = pd.DataFrame(CASES, columns=["title", "location", "description"])
    want = _pandas_oracle(pdf.copy()).sort_values(["title", "location"]).reset_index(drop=True)
    got = (
        clean_jobs_df(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(["title", "location"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_dedupe_matches(spark):
    pdf = pd.DataFrame(
        [("a", "x", "d"), ("a", "x", "d"), ("b", "y", "e")],
        columns=["title", "location", "description"],
    )
    got = clean_jobs_df(spark.createDataFrame(pdf))
    assert got.count() == 2
    # API variant has no dedupe (reference src/crawlers/async_api.py:30-67)
    assert clean_jobs_df(spark.createDataFrame(pdf), dedupe=False).count() == 3


def test_truncate_tokens_boundary(spark):
    """F16 boundary: below / exactly-at / above max_tokens, plus empty and
    whitespace-only inputs (reference truncate_text_tokens_optimized,
    e5_base_v2_utils.py:37-56)."""
    from pyspark.sql import functions as F

    from jobscrawler_spark.functions.text import truncate_tokens

    df = spark.createDataFrame(
        [("a b c",), ("a b c d",), ("a b c d e",), ("",), ("   ",)], ["t"]
    )
    out = [r["x"] for r in df.select(truncate_tokens(F.col("t"), 4).alias("x")).collect()]
    assert out == ["a b c", "a b c d", "a b c d", "", ""]


def test_embed_prepare_truncates_wrapped_text(spark):
    """F14+F15+F16 chain: the WRAPPED text is what gets truncated."""
    from pyspark.sql import functions as F

    from jobscrawler_spark.functions.cleaning import embed_prepare

    df = spark.createDataFrame([("T (x)", "long description with many words here", "L",)],
                               ["title", "desc", "loc"])
    out = df.select(
        embed_prepare(F.col("title"), F.col("desc"), F.col("loc"), max_tokens=6).alias("e")
    ).collect()[0]["e"]
    # reference field order: title, location, description
    assert out == "<title> T x </title> <location> L"
