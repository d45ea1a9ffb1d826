"""Extract/verify stage: decode landed image bytes and check invariants.

The reference's incremental embedding stage (reference:
src/embeddings/embed_latest_crawled_data.py:180-247 — watermark read ->
fetch rows newer than watermark -> batched model inference -> upsert ->
advance watermark) is re-realized for the image payload (BASELINE.json
input_hint): decode ``bytes`` per ``fmt``, verify decoded-pixel PSNR
(>=40dB for lossy formats, exact for lossless), verify caption equality,
and recompute ``phash`` — all batched numpy inside mapInPandas.

The watermark pattern (P7/A3/K3) is kept: ``extract_incremental`` processes
only rows newer than the checkpointed high-watermark and advances it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import fetch_model as FM
from ..functions import codecs

VERIFY_SCHEMA = (
    "image_id string, w int, h int, fmt string, phash long, "
    "decode_ok boolean, psnr double, psnr_ok boolean, caption_ok boolean, "
    "phash_match boolean, phash_recomputed long"
)

PSNR_MIN_DB = 40.0


def verify_images(images: DataFrame) -> DataFrame:
    """Decode every row and emit per-row invariant verdicts.

    Input: the images table (image_id, bytes, w, h, fmt, caption, phash,
    url). Ground truth comes from the shared fetch model (in a real
    deployment: the upstream content store).
    """

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                rec = {
                    "image_id": r.image_id,
                    "w": int(r.w),
                    "h": int(r.h),
                    "fmt": r.fmt,
                    "phash": int(r.phash),
                    "decode_ok": False,
                    "psnr": 0.0,
                    "psnr_ok": False,
                    "caption_ok": False,
                    "phash_match": False,
                    "phash_recomputed": 0,
                }
                try:
                    img = codecs.decode(bytes(r.bytes), r.fmt)
                    rec["decode_ok"] = img.shape == (int(r.h), int(r.w), 3)
                    truth = FM.expected_pixels(r.url)
                    p = codecs.psnr(truth, img)
                    rec["psnr"] = float(min(p, 1e9))
                    rec["psnr_ok"] = (
                        bool(np.array_equal(truth, img))
                        if r.fmt not in codecs.LOSSY_FMTS
                        else p >= PSNR_MIN_DB
                    )
                    rec["caption_ok"] = r.caption == FM.caption_for(r.url)
                    ph = codecs.phash(truth)
                    rec["phash_recomputed"] = ph
                    rec["phash_match"] = ph == int(r.phash)
                except Exception:
                    pass
                out.append(rec)
            yield pd.DataFrame(out)

    return images.mapInPandas(verify, schema=VERIFY_SCHEMA)


def extract_incremental(
    images: DataFrame, watermark_round: int | None
) -> tuple[DataFrame, int | None]:
    """P7: process only rows with round > watermark; returns (verified rows,
    new watermark = max round seen). Mirrors the reference's
    timestamp-watermark incremental embed (A3/K3)."""
    if watermark_round is not None:
        fresh = images.filter(F.col("round") > watermark_round)
    else:
        fresh = images
    new_wm_row = fresh.agg(F.max("round").alias("m")).collect()[0]
    new_wm = new_wm_row["m"] if new_wm_row["m"] is not None else watermark_round
    return verify_images(fresh), new_wm
