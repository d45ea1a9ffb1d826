"""Image curation for training-data assembly: quality stats + image-text
alignment filtering over the images table (BASELINE.json input_hint shape).

The LAION/DataComp-style curation pass a 100 TB image+caption corpus runs
between crawl and training — the image-payload counterpart of the text
quality family (functions/text.py). The reference has no image pipeline at
all (its corpus is the jobs table, reference: src/crawler.py:172-244);
these are north-rule training-data extensions over the payload the graft
mandates.

Two stages, composed by :func:`curate_images`:

- **profile** (:func:`image_profile`): decode ``bytes`` per ``fmt`` and
  compute per-image statistics — luma mean/std (contrast), 256-bin
  Shannon entropy (flat/synthetic detector), aspect ratio — plus a
  deterministic pooled-luma embedding (grid area-pool of the luma plane,
  mean-centered, components rounded to 6dp so the downstream cosine is
  bit-identical across engines). One mapInPandas pass, Arrow-batched:
  pixel work is the mandated slow path, everything after it is Catalyst.
- **alignment + verdicts** (inside :func:`curate_images`): caption
  embedding via the pure-Catalyst hash embedder
  (embeddings_pipeline.synth_embedding — the model stand-in this sandbox
  uses everywhere; a real deployment swaps a CLIP text/image tower into
  the same two columns, exactly like the e5 swap point documented in
  functions/bpe.py), cosine via F.zip_with + F.aggregate (JVM-side,
  array-order summation), score scaled to an integer
  (``align_e6 = floor(cos * 1e6 + 0.5)``) so no float formatting crosses
  engines, then the curation verdicts as integer/boolean compares.

Scale shape (SCALING.md "Training-data operators at 100 TB"): the entire
curation pass is MAP-SIDE — caption and pixels live on the same row, so
alignment needs no join, and every verdict is a per-row expression. Zero
shuffles at any corpus size; decode cost is the floor and it
embarrassingly parallelizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..embeddings_pipeline import synth_embedding
from ..functions import codecs

POOL_GRID = 4  # pooled-luma embedding is POOL_GRID^2 components
DEFAULTS = {
    "min_side": 64,
    "min_aspect": 0.5,
    "max_aspect": 2.0,
    "min_entropy": 3.0,
    "min_contrast": 10.0,
    "align_threshold": 0.0,
    "max_skin_e4": 8000,
    # r6 caption-quality gates (the DataComp caption-filter slot):
    # degenerate alt text ("img"), runaway scrapes, and SEO keyword
    # stuffing (repeated-token fraction as an exact scaled integer)
    "min_cap_tokens": 2,
    "max_cap_tokens": 64,
    "max_cap_rep_e4": 5000,
    # r6 blur gate: mean |4-neighbor Laplacian| of the integer channel-sum
    # luma, x10 (see _lap_e1). Sharp fixture classes sit >= 28, smooth
    # ramps/flat fields <= ~5; production re-tunes like max_skin_e4.
    "min_lap_e1": 20,
}

PROFILE_SCHEMA = (
    "image_id string, w int, h int, aspect double, luma_mean double, "
    "luma_std double, entropy double, img_vec array<double>"
)


def _luma_stats(img: np.ndarray) -> tuple[np.ndarray, float, float, float]:
    """(luma plane, mean, std, entropy) for one decoded HxWx3 uint8 image."""
    luma = img.astype(np.float64).mean(axis=2)
    mean = float(luma.mean())
    std = float(luma.std())
    counts = np.bincount(
        np.clip(np.rint(luma), 0, 255).astype(np.int64).ravel(), minlength=256
    )
    p = counts[counts > 0] / luma.size
    # + 0.0 canonicalizes IEEE -0.0 (a flat image yields -(1*log2(1)))
    # so the oracle compare never sees '-0' vs '0'
    entropy = float(-(p * np.log2(p)).sum()) + 0.0
    return luma, mean, std, entropy


def _pool_embed(luma: np.ndarray, grid: int = POOL_GRID) -> list[float]:
    """grid x grid area-pooled luma, mean-centered, rounded to 6dp.

    Rounding is part of the CONTRACT: the cosine downstream sums in array
    order over these exact doubles in both Spark (zip_with/aggregate) and
    the sequential oracle, so the integer-scaled score is bit-identical.
    """
    h, w = luma.shape
    yi = (np.arange(h) * grid // h).astype(np.int64)
    xi = (np.arange(w) * grid // w).astype(np.int64)
    acc = np.zeros((grid, grid))
    cnt = np.zeros((grid, grid))
    np.add.at(acc, (yi[:, None], xi[None, :]), luma)
    np.add.at(cnt, (yi[:, None], xi[None, :]), 1.0)
    vec = (acc / np.maximum(cnt, 1.0)).ravel()
    vec = vec - vec.mean()
    return [float(x) for x in np.round(vec, 6)]


def image_profile(images: DataFrame, grid: int = POOL_GRID) -> DataFrame:
    """Decode + per-image stats + pooled-luma embedding (one Arrow pass)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                img = codecs.decode(bytes(r.bytes), r.fmt)
                luma, mean, std, entropy = _luma_stats(img)
                h, w = img.shape[0], img.shape[1]
                out.append(
                    {
                        "image_id": r.image_id,
                        "w": w,
                        "h": h,
                        "aspect": round(w / h, 4),
                        "luma_mean": round(mean, 4),
                        "luma_std": round(std, 4),
                        "entropy": round(entropy, 4),
                        "img_vec": _pool_embed(luma, grid),
                    }
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=PROFILE_SCHEMA)


def _skin_e4(img: np.ndarray) -> int:
    """Skin-pixel fraction x 10^4 — the NSFW-filter stand-in's statistic.
    The classic Peer et al. 2003 RGB rule, ALL integer compares (no
    summation-order hazard, so the sequential oracle is a pure-Python
    per-pixel loop): R>95, G>40, B>20, max-min>15, |R-G|>15, R>G, R>B.
    A learned NSFW classifier swaps into the same mapInPandas slot (the
    CLIP-for-alignment swap point). The default max_skin_e4=8000 is tuned
    to the synthetic palette (fetch-model images are frequently warm-toned
    and land 50-73% in-rule; the planted skin class saturates at 10000) —
    a real deployment re-tunes the threshold to its classifier."""
    r = img[:, :, 0].astype(np.int16)
    g = img[:, :, 1].astype(np.int16)
    b = img[:, :, 2].astype(np.int16)
    mx = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    m = (
        (r > 95) & (g > 40) & (b > 20) & ((mx - mn) > 15)
        & (np.abs(r - g) > 15) & (r > g) & (r > b)
    )
    return int(m.sum()) * 10000 // int(m.size)


def _lap_e1(img: np.ndarray) -> int:
    """BLUR statistic: mean absolute 4-neighbor Laplacian of the INTEGER
    channel-sum luma (r+g+b, 0..765), scaled x10 and floor-divided — all
    integer arithmetic, so the sequential oracle's per-pixel loop agrees
    bit-for-bit (the skin_e4 pattern). A smooth gradient can have high
    CONTRAST (luma_std) yet a near-zero local derivative — the defect
    low_contrast/low_entropy cannot see; classic sharpness =
    variance-of-Laplacian, here in integral form. Images thinner than 3px
    have no interior: statistic 0 (they are min_side fodder anyway)."""
    l = (
        img[:, :, 0].astype(np.int64)
        + img[:, :, 1].astype(np.int64)
        + img[:, :, 2].astype(np.int64)
    )
    if l.shape[0] < 3 or l.shape[1] < 3:
        return 0
    lap = (
        4 * l[1:-1, 1:-1]
        - l[:-2, 1:-1]
        - l[2:, 1:-1]
        - l[1:-1, :-2]
        - l[1:-1, 2:]
    )
    return int(np.abs(lap).sum()) * 10 // int(lap.size)


def _cosine_e6(a, b):
    """floor(cos(a, b) * 1e6 + 0.5) as bigint — array-order summation in
    the JVM; the sequential oracle mirrors the exact operation order."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    cos = F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
    return F.floor(cos * 1e6 + F.lit(0.5)).cast("long")


def curate_images(images: DataFrame, **thresholds) -> DataFrame:
    """Per-image curation verdicts: profile stats + caption-alignment score.

    Input needs (image_id, bytes, fmt, caption). Output: one row per image
    with stats, ``align_e6``, and boolean verdicts; ``keep`` is the
    conjunction downstream corpus builds filter on.

    MAP-SIDE ONLY: caption and pixels live on the same input row, so the
    caption is passed THROUGH the profile UDF (no join-back on image_id —
    a 10^10-row self-join would be a gratuitous co-partitioned shuffle),
    the caption embedding is pure Catalyst (synth_embedding), and the
    cosine + verdicts are per-row expressions. Zero shuffles.
    """
    t = {**DEFAULTS, **thresholds}
    thr_e6 = int(t["align_threshold"] * 1_000_000)
    dim = POOL_GRID * POOL_GRID

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                img = codecs.decode(bytes(r.bytes), r.fmt)
                luma, mean, std, entropy = _luma_stats(img)
                h, w = img.shape[0], img.shape[1]
                out.append(
                    {
                        "image_id": r.image_id,
                        "caption": r.caption,
                        "w": w,
                        "h": h,
                        "aspect": round(w / h, 4),
                        "luma_mean": round(mean, 4),
                        "luma_std": round(std, 4),
                        "entropy": round(entropy, 4),
                        "skin_e4": _skin_e4(img),
                        "lap_e1": _lap_e1(img),
                        "img_vec": _pool_embed(luma),
                    }
                )
            yield pd.DataFrame(out)

    prof = images.mapInPandas(
        run,
        schema=PROFILE_SCHEMA.replace(
            "image_id string", "image_id string, caption string"
        ).replace("entropy double", "entropy double, skin_e4 long, lap_e1 long"),
    )
    from ..functions.text import tokens_col

    cap_vec = synth_embedding(F.col("caption"), dim=dim)
    cap_toks = tokens_col(F.col("caption"))
    return (
        prof.withColumn("align_e6", _cosine_e6(F.col("img_vec"), cap_vec))
        .withColumn("cap_tokens", F.size(cap_toks).cast("int"))
        .withColumn("__cap_nd", F.size(F.array_distinct(cap_toks)))
        .withColumn(
            "cap_rep_e4",
            F.expr(
                "CAST(CASE WHEN cap_tokens <= 0 THEN 0"
                " ELSE ((cap_tokens - __cap_nd) * 10000) div cap_tokens"
                " END AS BIGINT)"
            ),
        )
        .withColumn(
            "flagged_caption",
            (F.col("cap_tokens") < F.lit(int(t["min_cap_tokens"])))
            | (F.col("cap_tokens") > F.lit(int(t["max_cap_tokens"])))
            | (F.col("cap_rep_e4") > F.lit(int(t["max_cap_rep_e4"]))),
        )
        .withColumn("too_small", (F.col("w") < t["min_side"]) | (F.col("h") < t["min_side"]))
        .withColumn(
            "bad_aspect",
            (F.col("aspect") < t["min_aspect"]) | (F.col("aspect") > t["max_aspect"]),
        )
        .withColumn("low_entropy", F.col("entropy") < t["min_entropy"])
        .withColumn("low_contrast", F.col("luma_std") < t["min_contrast"])
        .withColumn("misaligned", F.col("align_e6") < F.lit(thr_e6))
        .withColumn("flagged_nsfw", F.col("skin_e4") > F.lit(int(t["max_skin_e4"])))
        .withColumn("flagged_blurry", F.col("lap_e1") < F.lit(int(t["min_lap_e1"])))
        .withColumn(
            "keep",
            ~(
                F.col("too_small")
                | F.col("bad_aspect")
                | F.col("low_entropy")
                | F.col("low_contrast")
                | F.col("misaligned")
                | F.col("flagged_nsfw")
                | F.col("flagged_caption")
                | F.col("flagged_blurry")
            ),
        )
        .drop("img_vec", "caption", "__cap_nd")
    )


