"""Handcrafted expectations for the r3 corpus-curation operators
(repetition signals, PII redaction, paragraph dedup) — the DuckDB gate
(test_entry_oracle) proves cross-engine equality; these pin the intended
values on inputs where the right answer is computable by hand."""

from pyspark.sql import functions as F

from jobscrawler_spark.functions import text as T
from jobscrawler_spark.operators.dedupe import paragraph_dup_stats


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(col.alias("v")).collect()[0]["v"]


def test_dup_line_fraction_counts_repeats(spark):
    # lines: [menu, home, menu, home] -> 2 of 4 repeat an earlier line
    assert _one(spark, "menu\nhome\n\nmenu\nhome", T.dup_line_fraction(F.col("text"))) == 0.5
    assert _one(spark, "a\nb\nc", T.dup_line_fraction(F.col("text"))) == 0.0
    assert _one(spark, "", T.dup_line_fraction(F.col("text"))) == 0.0


def test_top_ngram_fraction(spark):
    # bigrams of "x y x y x": [x y, y x, x y, y x] -> top = 2/4
    assert _one(spark, "x y x y x", T.top_ngram_fraction(F.col("text"), 2)) == 0.5
    # all-distinct bigrams -> 1/3
    v = _one(spark, "a b c d", T.top_ngram_fraction(F.col("text"), 2))
    assert abs(v - 1 / 3) < 1e-6
    # shorter than k -> 0
    assert _one(spark, "one", T.top_ngram_fraction(F.col("text"), 2)) == 0.0


def test_repetition_flag_thresholds(spark):
    spam = "buy now buy now buy now buy now buy now"
    clean = "the quick brown fox jumps over the lazy dog near a river bank"
    assert _one(spark, spam, T.repetition_flag(F.col("text"))) is True
    assert _one(spark, clean, T.repetition_flag(F.col("text"))) is False


def test_redact_pii_masks_email_and_phone(spark):
    t = "mail bob.smith+x@corp.example.org or call +1 (555) 123-4567 today"
    out = _one(spark, t, T.redact_pii(F.col("text")))
    assert out == "mail [REDACTED] or call [REDACTED] today"
    n_email, n_phone = T.pii_counts(F.col("text"))
    df = spark.createDataFrame([(t,)], ["text"]).select(
        n_email.alias("e"), n_phone.alias("p")
    )
    r = df.collect()[0]
    assert (r["e"], r["p"]) == (1, 1)


def test_redact_pii_email_digits_not_double_counted(spark):
    # the digits of an email local-part must not re-trigger the phone
    # pattern after email redaction (redact order: email first)
    t = "reach a123456789@example.com now"
    out = _one(spark, t, T.redact_pii(F.col("text")))
    assert out == "reach [REDACTED] now"
    n_email, n_phone = T.pii_counts(F.col("text"))
    df = spark.createDataFrame([(t,)], ["text"]).select(
        n_email.alias("e"), n_phone.alias("p")
    )
    r = df.collect()[0]
    assert (r["e"], r["p"]) == (1, 0)


def test_paragraph_dup_stats_shared_footer(spark):
    footer = "Copyright 2024 Example Corp"
    docs = spark.createDataFrame(
        [
            (1, f"unique body one\n\n{footer}"),
            (2, f"unique body two\n\n{footer}"),
            (3, "entirely alone"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in paragraph_dup_stats(docs).collect()}
    assert rows[1]["n_paras"] == 2 and rows[1]["n_shared_paras"] == 1
    assert rows[1]["shared_para_frac"] == 0.5
    assert rows[2]["shared_para_frac"] == 0.5
    assert rows[3]["n_paras"] == 1 and rows[3]["n_shared_paras"] == 0


def test_phash_near_dup_recall_guarantee(spark):
    """8 bands + hamming<=7: every pair within distance 7 MUST be found
    (pigeonhole), and distant pairs must not be."""
    from jobscrawler_spark.operators.similarity import phash_near_dup_pairs

    def signed(v):  # wrap to int64 (phash is a signed long)
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x123456789ABCDEF0
    spread = (1 << 63) | (1 << 40) | (1 << 17) | (1 << 3) | (1 << 9) | (1 << 30) | 1
    rows = [
        ("a", base),
        ("b", base ^ 0b1011011),  # hamming 5 from a -> must pair
        ("c", signed(base ^ spread)),  # hamming 7, bits spread across bands
        ("d", -0x7EDCBA9876543211),  # far away (negative phash exercised)
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(df).collect()
    }
    assert got[("a", "b")] == 5
    assert got[("a", "c")] == 7
    assert ("a", "d") not in got and ("b", "d") not in got


def test_paragraph_dup_normalizes_whitespace_and_case(spark):
    docs = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "HELLO\tWORLD")],
        ["doc_id", "text"],
    )
    rows = paragraph_dup_stats(docs).collect()
    assert all(r["shared_para_frac"] == 1.0 for r in rows)


# ---------------------------------------------------------- C4 line filter

def test_c4_clean_lines_per_rule(spark):
    from jobscrawler_spark.functions.text import c4_clean_lines

    doc = "\n".join(
        [
            "This line is long enough and ends well.",   # keep
            'He said "stop".',                            # keep (3 words, quote-dot)
            "Too short.",                                 # drop: < 3 words
            "no terminal punctuation on this line",       # drop: no [.!?"]
            "enable JavaScript to continue viewing.",     # drop: javascript (ci)
            "Lorem Ipsum dolor sit amet filler text.",    # drop: lorem ipsum (ci)
            "var config = { mode: 1 };",                  # drop: '{'
            "Does this survive? Yes it does!",            # keep: ends '!'
            "Trailing spaces still count.   ",            # keep: rtrim before $
        ]
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    out = df.select(c4_clean_lines(F.col("text")).alias("c")).collect()[0]["c"]
    assert out.split("\n") == [
        "This line is long enough and ends well.",
        'He said "stop".',
        "Does this survive? Yes it does!",
        "Trailing spaces still count.   ",
    ]


def test_c4_clean_lines_empty_and_min_words(spark):
    from jobscrawler_spark.functions.text import c4_clean_lines

    df = spark.createDataFrame(
        [(1, ""), (2, "one two three four."), (3, "a b.")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", c4_clean_lines(F.col("text"), min_words=4).alias("c")
        ).collect()
    }
    assert got == {1: "", 2: "one two three four.", 3: ""}


def test_c4_clean_lines_plan_is_mapside(spark):
    from jobscrawler_spark.functions.text import c4_clean_lines

    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    plan = (
        df.select(c4_clean_lines(F.col("text")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for node in ("Exchange", "Join", "Generate"):
        assert node not in plan, f"{node} in c4 plan:\n{plan}"


def test_normalize_punct_folds_typographic_variants(spark):
    """r6 CCNet-style normalizer: typographic variants of one sentence
    must collapse to IDENTICAL bytes (the dedup-killer case), and every
    fold class fires."""
    import pandas as pd
    from pyspark.sql import functions as F

    from jobscrawler_spark.functions.text import normalize_punct

    rows = [
        (1, "“Hello” — it’s fine…"),
        (2, '"Hello" - it\'s fine...'),           # ASCII twin of row 1
        (3, "a b c"),                    # NBSP + thin space
        (4, "z​w﻿q"),                    # zero-width + BOM
        (5, "«guillemets» ‚low‘ „german“ ‐‑―"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "t"]))
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_punct(F.col("t")).alias("n")).collect()
    }
    assert got[1] == got[2] == '"Hello" - it\'s fine...'
    assert got[3] == "a b c"
    assert got[4] == "zwq"
    assert got[5] == "\"guillemets\" 'low' \"german\" ---"
