"""Bigram language-model perplexity filter — the CCNet-style quality gate.

CCNet (Wenzek et al. 2020, public) filters web text by KenLM perplexity:
low-perplexity documents read like the reference corpus, high-perplexity
ones are noise. This is that gate re-expressed for cross-engine
exactness: a bigram LM with add-one smoothing trains DRIVER-SIDE on the
bounded deterministic sample (the kmeans/BPE/quality-model pattern), and
every surprisal is converted to a SCALED INTEGER at training time —
scoring is then integer lookups + integer sums + one integer division,
so Spark, DuckDB and the independent Python recompute agree bit-for-bit
(no transcendental evaluates anywhere near the data path; math.log2 runs
only on the driver over the bounded sample).

Contract (both the Spark pipeline and the oracle recompute pin this):

- sample = first ``sample_docs`` (doc_id, text) rows by doc_id; tokens =
  whitespace split, empties dropped (functions/text.tokens_col).
- V = distinct unigrams in the sample; c1[w] / c12[(w1,w2)] = counts.
- pair cost  = round(-log2((c12+1) / (c1[w1]+V)) * scale)  (observed pairs)
- backoff[w1] = round( log2(c1[w1]+V) * scale)             (unseen pair, seen w1)
- unk_cost   = round( log2(V) * scale)                     (unseen w1)
- doc score  = (sum of per-bigram costs) div n_bigrams, an integer;
  docs with < 2 tokens score unk_cost.
- keep iff score <= threshold.

Scale shape (100 TB): both tables are bounded by the SAMPLE (<= total
sample tokens), so they broadcast; the data side is one explode (the
same fan-out every gram operator here pays) + two broadcast joins + one
uniform-key groupBy on doc_id. Nothing shuffles on a skewed key.

Reference analogue: none — the reference stores raw text (src/crawler.py:
172-244); this is a north-rule training-data extension.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

SAMPLE_DOCS = 512
SCALE = 1000


def train_bigram_lm(
    rows: list[tuple[int, str]],
    sample_docs: int = SAMPLE_DOCS,
    scale: int = SCALE,
) -> tuple[dict[tuple[str, str], int], dict[str, int], int]:
    """(pair_cost, backoff_cost, unk_cost) — integer surprisal tables per
    the module contract, trained on the first ``sample_docs`` rows by id."""
    rows = sorted(rows)[:sample_docs]
    c1: dict[str, int] = {}
    c12: dict[tuple[str, str], int] = {}
    for _, text in rows:
        toks = [t for t in text.split() if t]
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    v = len(c1)
    pair = {
        (a, b): round(-math.log2((n + 1) / (c1[a] + v)) * scale)
        for (a, b), n in c12.items()
    }
    backoff = {w: round(math.log2(n + v) * scale) for w, n in c1.items()}
    unk = round(math.log2(v) * scale)
    return pair, backoff, unk


def score_perplexity(
    docs: DataFrame,
    pair: dict[tuple[str, str], int],
    backoff: dict[str, int],
    unk: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds ``ppl_scaled`` (integer mean surprisal per bigram) to every
    input row. Explode -> two broadcast lookups -> one uniform groupBy;
    docs with < 2 tokens get ``unk``."""
    spark = docs.sparkSession
    pair_df = F.broadcast(
        spark.createDataFrame(
            [(a, b, c) for (a, b), c in sorted(pair.items())],
            "w1 string, w2 string, pair_cost long",
        )
    )
    back_df = F.broadcast(
        spark.createDataFrame(
            sorted(backoff.items()), "w1 string, backoff_cost long"
        )
    )
    toks = tokens_col(F.col(text_col))
    grams = F.zip_with(
        toks, F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    exploded = (
        docs.select(F.col(id_col), F.explode(grams).alias("g"))
        .filter(F.col("g.w2").isNotNull())
        .select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    scored = (
        exploded.join(pair_df, ["w1", "w2"], "left")
        .join(back_df, "w1", "left")
        .select(
            id_col,
            F.coalesce("pair_cost", "backoff_cost", F.lit(unk)).alias("cost"),
        )
        .groupBy(id_col)
        .agg(F.expr("sum(cost) div count(*)").alias("__ppl"))
    )
    return docs.join(scored, id_col, "left").withColumn(
        "ppl_scaled", F.coalesce(F.col("__ppl"), F.lit(unk).cast("long"))
    ).drop("__ppl")
