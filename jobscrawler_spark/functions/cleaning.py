"""The reference's cleaning pipeline (F1-F15) as Catalyst column expressions.

The reference applies a pandas ``.str.replace`` chain, duplicated ~verbatim
in three files (canonical copy: reference src/crawlers/async_bs4.py:39-94;
API variant src/crawlers/async_api.py:30-67; RSS src/crawlers/async_rss.py:
75-101). Title/description get only the HTML+punctuation strip; location
gets the full chain. Java regex supports the backreference (F2) and
lookarounds (F6), so the whole chain stays inside whole-stage codegen —
no UDF.

The literal string "NaN" is the reference's universal null (reference:
src/crawler.py:142, src/crawlers/async_bs4.py:159,171); we keep it for
byte-equality with the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# F1: strip HTML tags + brace/bracket/quote/comma punctuation.
# Java-regex-safe spelling of the reference's python pattern
# r'<.*?>|[{}[\]\'",]' — Java needs the inner '[' escaped.
RE_HTML_PUNCT = r'<.*?>|[{}\[\]\'",]'
# F2: collapse repeated words (backreference)
RE_REPEAT = r"\b(\w+)\s+\1\b"
# F3: ISO dates
RE_DATE = r"\d{4}-\d{2}-\d{2}"
# F4: salary strings
RE_SALARY = r"(USD|GBP)\d+-\d+/yr"
# F5: dash/slash to space
RE_DASH = r"[-/]"
# F6: camelCase boundary
RE_CAMEL = r"(?<=[a-z])(?=[A-Z])"
# F7: remote synonyms
RE_REMOTE = (
    r"(?i)\bRemote Job\b|\bRemote Work\b|\bRemote Office\b"
    r"|\bRemote Global\b|\bRemote with frequent travel\b"
)
RE_REMOTE_EXACT = r"(?i)^remote$"


def clean_text_col(col: Column) -> Column:
    """Title/description cleaning: F1 only (reference: async_bs4.py:62-64)."""
    return F.regexp_replace(col.cast("string"), RE_HTML_PUNCT, "")


def clean_location_col(col: Column) -> Column:
    """Full location chain F1-F8, in the reference's exact order."""
    c = F.regexp_replace(col.cast("string"), RE_HTML_PUNCT, "")
    c = F.regexp_replace(c, RE_REPEAT, "$1")
    c = F.regexp_replace(c, RE_DATE, "")
    c = F.regexp_replace(c, RE_SALARY, "")
    c = F.regexp_replace(c, RE_DASH, " ")
    c = F.regexp_replace(c, RE_CAMEL, " ")
    c = F.regexp_replace(c, RE_REMOTE, "Worldwide")
    c = F.regexp_replace(c, RE_REMOTE_EXACT, "Worldwide")
    return F.trim(c)


def clean_jobs_df(df: DataFrame, dedupe: bool = True) -> DataFrame:
    """The reference's clean function over a jobs frame: dedupe + per-column
    chains. ``dedupe=False`` mirrors the API variant, which has NO
    drop_duplicates (reference: src/crawlers/async_api.py:30-67)."""
    if dedupe:
        df = df.dropDuplicates()
    out = df
    if "title" in df.columns:
        out = out.withColumn("title", clean_text_col(F.col("title")))
    if "description" in df.columns:
        out = out.withColumn("description", clean_text_col(F.col("description")))
    if "location" in df.columns:
        out = out.withColumn("location", clean_location_col(F.col("location")))
    return out


# --- embedding-stage text prep (F14/F15, reference:
# src/embeddings/embed_latest_crawled_data.py:25-33,58-81) -----------------


def embed_text_cleanup(col: Column) -> Column:
    """Remove ( ) ' , — reference's _clean for embedding text."""
    return F.translate(col, "()',", "")


def embed_wrap_fields(title: Column, description: Column, location: Column) -> Column:
    """XML-ish field wrapping + join (reference: F15). Field ORDER is
    title, location, description — the reference's _rows_to_nested_list
    builds [title, location, description] (embed_latest_crawled_data.py:
    74-81) before the space-join."""
    return F.concat_ws(
        " ",
        F.format_string("<title> %s </title>", embed_text_cleanup(title)),
        F.format_string("<location> %s </location>", embed_text_cleanup(location)),
        F.format_string("<description> %s </description>", embed_text_cleanup(description)),
    )


def embed_prepare(
    title: Column, description: Column, location: Column, max_tokens: int = 1000
) -> Column:
    """F14+F15+F16: cleanup -> wrap -> truncate at ``max_tokens``, the full
    embedding-text prep chain (the reference truncates the WRAPPED text at
    1000 tokens, embed_latest_crawled_data.py:84-132)."""
    from .text import truncate_tokens

    return truncate_tokens(embed_wrap_fields(title, description, location), max_tokens)


def nan_fill(col: Column) -> Column:
    """F11: the literal "NaN" as universal null."""
    return F.coalesce(col, F.lit("NaN"))
