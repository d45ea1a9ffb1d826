"""Learned quality classifier: hashed-feature logistic model, trained
driver-side on a bounded sample, scored in pure Catalyst.

The CCNet/DataComp practice the heuristic family (functions/text.py
quality_score) approximates by hand: train a cheap linear model on weak
labels and score the whole corpus with it. No model ships in this
sandbox, so the WEAK-SUPERVISION RULE is the documented deterministic
stand-in (label 1 iff the doc has >= LABEL_MIN_TOKENS whitespace tokens —
swap real labels in exactly like the e5/BPE/CLIP swap points); the
training/scoring MECHANICS are real and exact.

Everything is a bit-reproducible CONTRACT so the DuckDB oracle can verify
end-to-end (the train_bpe pattern — an independent Python pass in
oracle/expected.py re-derives the weights and must land on identical
rounded values):

- tokens: whitespace split, empties dropped (== functions/text.tokens_col)
- bucket(token) = int(md5(utf8)[:4 hex], 16) % DIM  (engine-neutral md5,
  never Python hash() or xxhash-of-the-engine)
- training: docs in ascending doc_id order, EPOCHS passes, plain SGD
  over UNNORMALIZED bag-of-buckets counts (a per-token 1/n
  normalization would make every doc's feature mass sum to 1 and erase
  the length signal the weak rule encodes — measured 66% vs 98% fit);
  per doc: z = b + Σ_j w[bucket_j] in TOKEN ORDER,
  p = 1/(1+exp(-clamp(z, ±60))) (the clamp keeps exp finite once z
  saturates; it is part of the contract), g = p - label, b -= LR*g,
  then per token in order w[bucket_j] -= LR*g. Weights and bias round
  to 6dp at the end — the rounded values ARE the model.
- scoring emits the LOGIT, not the probability: b + Σ w[bucket] uses
  only IEEE + in a specified order, so Spark's aggregate(), DuckDB's
  list_reduce() and the Python trainer agree bit-for-bit; a sigmoid here
  would hang equality on libm exp's last ulp. ml_keep = logit >= 0.

Scale shape: training is O(SAMPLE_DOCS) on the driver (the
kmeans-codebook/BPE-sample pattern); scoring is map-side only — the 2048
rounded weights ride the plan as an array literal (a few KB), no join,
no shuffle.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIM = 2048
SAMPLE_DOCS = 512
EPOCHS = 20
LR = 0.5
LABEL_MIN_TOKENS = 40


def bucket_py(token: str, dim: int = DIM) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:4], 16) % dim


def label_py(text: str) -> int:
    """The weak-supervision stand-in rule (see module docstring)."""
    return 1 if len(text.split()) >= LABEL_MIN_TOKENS else 0


def train_quality_logit(
    texts: list[str], labels: list[int], dim: int = DIM,
    epochs: int = EPOCHS, lr: float = LR,
) -> tuple[list[float], float]:
    """Train per the contract; ``texts`` must already be in ascending
    doc_id order. Returns (weights rounded 6dp, bias rounded 6dp)."""
    w = [0.0] * dim
    b = 0.0
    docs = []
    for t in texts:
        toks = [x for x in t.split() if x]
        docs.append([bucket_py(x, dim) for x in toks])
    for _ in range(epochs):
        for buckets, y in zip(docs, labels):
            if not buckets:
                continue
            z = b
            for j in buckets:
                z = z + w[j]
            p = 1.0 / (1.0 + math.exp(-max(min(z, 60.0), -60.0)))
            g = p - y
            b = b - lr * g
            for j in buckets:
                w[j] = w[j] - lr * g
    return [round(x, 6) for x in w], round(b, 6)


def train_on_sample(rows: list[tuple[int, str]]) -> tuple[list[float], float]:
    """Train on the bounded corpus sample: ``rows`` = (doc_id, text) of
    the first SAMPLE_DOCS docs by doc_id (the caller collects them — the
    one driver-side step, O(SAMPLE_DOCS) by construction)."""
    rows = sorted(rows)[:SAMPLE_DOCS]
    texts = [t for _, t in rows]
    return train_quality_logit(texts, [label_py(t) for t in texts])


def ml_logit_col(text: Column, weights: list[float], bias: float, dim: int = DIM) -> Column:
    """The scoring contract in Catalyst: token-order aggregate of
    w[bucket] plus bias, rounded to 6dp. Map-side only."""
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    warr = F.array(*[F.lit(float(x)) for x in weights])
    contrib = F.transform(
        toks,
        lambda t: F.element_at(
            warr,
            (F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int") % dim) + 1,
        ),
    )
    logit = F.lit(float(bias)) + F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x)
    return F.round(F.when(n > 0, logit).otherwise(F.lit(float(bias))), 6)


def score_quality_model(
    docs: DataFrame, weights: list[float], bias: float,
    text_col: str = "text", dim: int = DIM,
) -> DataFrame:
    """docs + (ml_logit, ml_keep) columns; keep = logit >= 0."""
    logit = ml_logit_col(F.col(text_col), weights, bias, dim)
    return docs.withColumn("ml_logit", logit).withColumn(
        "ml_keep", F.col("ml_logit") >= 0
    )
