"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures) is real and tested; only external codec backends (JPEG/MP3/
H.264) are stubbed — those libraries are not in this container, and the
engine's own formats (raw/png/dct, jobscrawler_spark.functions.codecs)
exercise the full decode path for real.

Pattern: every op is mapInPandas over an Arrow batch iterator — binary
payloads never cross the boundary row-at-a-time, and the batch size is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs

SUPPORTED_FMTS = set(codecs._DECODERS)

FEATURES_SCHEMA = (
    "image_id string, fmt string, w int, h int, "
    "mean_r double, mean_g double, mean_b double, brightness double, phash long"
)

RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"

THUMB = 16


def _decode_or_raise(data: bytes, fmt: str) -> np.ndarray:
    if fmt not in SUPPORTED_FMTS:
        # external codec backends (jpeg/webp/mp3/h264) are not present in
        # this container; the plumbing (schema, batching, partitioning) is
        # identical — only the byte decoder would differ.
        raise NotImplementedError(f"codec backend for {fmt!r} not available")
    return codecs.decode(data, fmt)


def extract_image_features(images: DataFrame) -> DataFrame:
    """Decode + per-image feature extraction (mean channel, brightness,
    phash) — the 'feature-extract' stage of a multimodal pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                img = _decode_or_raise(bytes(r.bytes), r.fmt)
                means = img.reshape(-1, 3).mean(axis=0)
                out.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "w": img.shape[1],
                        "h": img.shape[0],
                        "mean_r": round(float(means[0]), 4),
                        "mean_g": round(float(means[1]), 4),
                        "mean_b": round(float(means[2]), 4),
                        "brightness": round(float(means.mean()), 4),
                        "phash": codecs.phash(img),
                    }
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(images: DataFrame, size: int = THUMB) -> DataFrame:
    """Decode -> area-resize to size x size -> re-encode PNG (deterministic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                img = _decode_or_raise(bytes(r.bytes), r.fmt)
                yi = (np.arange(img.shape[0]) * size // img.shape[0]).astype(np.int64)
                xi = (np.arange(img.shape[1]) * size // img.shape[1]).astype(np.int64)
                acc = np.zeros((size, size, 3))
                cnt = np.zeros((size, size, 1))
                np.add.at(acc, (yi[:, None], xi[None, :]), img.astype(np.float64))
                np.add.at(cnt, (yi[:, None], xi[None, :]), 1.0)
                thumb = np.clip(np.rint(acc / np.maximum(cnt, 1)), 0, 255).astype(np.uint8)
                out.append(
                    {
                        "image_id": r.image_id,
                        "bytes": codecs.encode(thumb, "png"),
                        "w": size,
                        "h": size,
                        "fmt": "png",
                    }
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "video_id string, frame_no int, bytes binary, w int, h int, fmt string"

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, n_samples long, duration_s double, rms double, "
    "zero_crossings long, peak int"
)


def sample_video_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling: demux the engine's own ``vraw`` container (header +
    zlib'd raw frames) and emit every ``every_n``-th frame re-encoded PNG.
    External demuxers (h264/vp9) are not in this container and raise; the
    Spark-side plumbing (one binary row in -> N frame rows out, Arrow
    batches, schema) is identical either way.

    videos: (video_id, bytes, fmt)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                if r.fmt != "vraw":
                    raise NotImplementedError(f"video demuxer for {r.fmt!r} not available")
                frames, _fps = codecs.decode_vraw(bytes(r.bytes))
                for i in range(0, len(frames), every_n):
                    out.append(
                        {
                            "video_id": r.video_id,
                            "frame_no": i,
                            "bytes": codecs.encode(frames[i], "png"),
                            "w": frames.shape[2],
                            "h": frames.shape[1],
                            "fmt": "png",
                        }
                    )
            yield pd.DataFrame(out, columns=[c.split()[0] for c in FRAMES_SCHEMA.split(", ")])

    return videos.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """Decode PCM16 payloads and compute waveform features (rms, zero
    crossings, peak) — numpy over the whole waveform, never per sample.

    audio: (audio_id, bytes, fmt)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                if r.fmt != "pcm16":
                    raise NotImplementedError(f"audio codec for {r.fmt!r} not available")
                samples, rate = codecs.decode_pcm16(bytes(r.bytes))
                x = samples.astype(np.float64)
                out.append(
                    {
                        "audio_id": r.audio_id,
                        "n_samples": len(samples),
                        "duration_s": round(len(samples) / rate, 6),
                        "rms": round(float(np.sqrt(np.mean(x**2))), 4),
                        "zero_crossings": int(np.count_nonzero(np.diff(np.signbit(x)))),
                        "peak": int(np.abs(samples.astype(np.int32)).max()) if len(samples) else 0,
                    }
                )
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in AUDIO_FEATURES_SCHEMA.split(", ")]
            )

    return audio.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_SEG_SCHEMA = (
    "audio_id string, frame_no int, seg_id int, active boolean, "
    "energy_sum long, n int"
)


def segment_audio(
    audio: DataFrame, frame_len: int = 400, threshold: int = 100_000
) -> DataFrame:
    """Energy-based voice-activity segmentation — the audio sibling of
    detect_scene_cuts (the curation step before ASR/captioning: transcribe
    the ACTIVE spans, drop the silence instead of paying the model for
    it).

    INTEGER-EXACT contract, no float crosses engines: the waveform splits
    into non-overlapping frames of ``frame_len`` samples (the trailing
    partial frame is kept), ``energy_sum`` is the frame's sum of squared
    samples (int64-exact: 400 x 32768^2 << 2^63), and a frame is
    ``active`` iff ``energy_sum > threshold * n`` — mean square per sample
    above ``threshold``. ``seg_id`` counts activity FLIPS (frame 0 opens
    segment 0), so a segment is a maximal run of same-activity frames.
    The planted fixture's silent spans sit ~65000x below its loud spans
    in mean square, so the boundary never wobbles.

    One mapInPandas pass, map-side at any corpus size (a clip's samples
    live on its own row; long-form audio is chunked into bounded clips
    upstream at demux time, like video clips and documents).

    audio: (audio_id, bytes, fmt). Non-pcm16 codecs stay honest stubs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                if r.fmt != "pcm16":
                    raise NotImplementedError(f"audio codec for {r.fmt!r} not available")
                samples, _rate = codecs.decode_pcm16(bytes(r.bytes))
                x = samples.astype(np.int64)
                prev: bool | None = None
                seg = -1
                for fno, start in enumerate(range(0, len(x), frame_len)):
                    fr = x[start : start + frame_len]
                    n = int(fr.size)
                    e = int((fr * fr).sum())
                    act = e > threshold * n
                    if prev is None or act != prev:
                        seg += 1
                    out.append(
                        {
                            "audio_id": r.audio_id,
                            "frame_no": fno,
                            "seg_id": seg,
                            "active": act,
                            "energy_sum": e,
                            "n": n,
                        }
                    )
                    prev = act
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in AUDIO_SEG_SCHEMA.split(", ")]
            )

    return audio.mapInPandas(run, schema=AUDIO_SEG_SCHEMA)


SCENE_CUT_SCHEMA = (
    "video_id string, frame_no int, scene_id int, is_cut boolean, "
    "luma_sum long, diff_sum long, phash long"
)


def detect_scene_cuts(videos: DataFrame, threshold: int = 25) -> DataFrame:
    """Scene-cut detection + keyframe attribution over vraw clips — the
    video-curation step a training pipeline runs before frame embedding
    (sample ONE representative frame per scene instead of every-Nth blind:
    filter ``is_cut`` for the keyframes, reference analogue: the
    frame-blind every-Nth sampler, sample_video_frames above).

    INTEGER-EXACT contract, no float ever crosses engines: per-pixel luma
    is the channel sum r+g+b (0..765, exact int64), ``luma_sum`` the
    frame's total, ``diff_sum`` the sum of per-pixel absolute luma
    deltas vs the previous frame (NULL on frame 0). A cut is
    ``diff_sum > threshold * n_pixels`` — i.e. mean per-pixel delta above
    ``threshold`` — or frame 0; ``scene_id`` counts cuts. The fixture's
    in-scene wobble moves each pixel by <= 6 (threshold 25 never fires);
    a scene change re-seeds every pixel (mean delta in the hundreds).
    Each frame also gets the engine's 64-bit phash so downstream keyframe
    dedup joins straight into phash_near_dup_pairs.

    One mapInPandas pass, map-side only (a clip's frames live on its own
    row — no shuffle at any corpus size; 100 TB of video parallelizes per
    clip, and long-form video is chunked into bounded clips upstream at
    demux time, exactly like documents are chunked for packing).

    videos: (video_id, bytes, fmt). External demuxers stay honest stubs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                if r.fmt != "vraw":
                    raise NotImplementedError(f"video demuxer for {r.fmt!r} not available")
                frames, _fps = codecs.decode_vraw(bytes(r.bytes))
                n_px = int(frames.shape[1] * frames.shape[2])
                prev = None
                scene = -1
                for fno in range(frames.shape[0]):
                    luma = frames[fno].astype(np.int64).sum(axis=2)
                    if prev is None:
                        diff = None
                        is_cut = True
                    else:
                        diff = int(np.abs(luma - prev).sum())
                        is_cut = diff > threshold * n_px
                    if is_cut:
                        scene += 1
                    out.append(
                        {
                            "video_id": r.video_id,
                            "frame_no": fno,
                            "scene_id": scene,
                            "is_cut": is_cut,
                            "luma_sum": int(luma.sum()),
                            "diff_sum": diff,
                            "phash": codecs.phash(frames[fno]),
                        }
                    )
                    prev = luma
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in SCENE_CUT_SCHEMA.split(", ")]
            )

    return videos.mapInPandas(run, schema=SCENE_CUT_SCHEMA)


def scene_dup_stats(
    videos: DataFrame, threshold: int = 25, max_hamming: int = 4, n_bands: int = 8
) -> DataFrame:
    """Cross-video DUPLICATE-SCENE statistics — the video analogue of
    paragraph_dup_stats (dedupe.py): detect scenes, take each scene's
    keyframe phash, pair keyframes across the corpus via the banded
    Hamming LSH, and report per video the fraction of its scenes that
    also appear in ANOTHER video. Intros, outros, ad bumpers and
    syndicated segments — the boilerplate a video-training corpus must
    down-weight exactly like repeated web paragraphs.

    Returns (video_id, n_scenes, n_shared_scenes, shared_scene_frac).
    Same-video pairs are excluded: internal repetition is scene
    STRUCTURE, not corpus boilerplate.

    Scale shape — EXACT-FIRST, the boilerplate split that keeps LSH
    buckets bounded: a real corpus's dominant duplicate-scene mode is the
    bit-identical intro shared by millions of clips, which in a naive
    scene-level LSH is ONE band bucket pairing quadratically. Here
    identical phashes are handled by a groupBy (countDistinct videos per
    phash — one counter, zero pairs, any multiplicity), and the banded
    Hamming LSH runs only over DISTINCT phash values (boilerplate
    collapses to one representative before the self-join). A scene is
    shared iff its phash value occurs in >= 2 videos (exact branch) or a
    near phash value (1 <= hamming <= max_hamming) occurs in a different
    video (near branch, decided per scene x near-partner row — no
    collect_set of video lists). Every join/agg key is uniform (phash,
    band, scene_key); pigeonhole recall is unchanged (max_hamming <=
    n_bands - 1 over the representative set). Scene-cut detection is the
    map-side pass above, and the keyframe set is already ~scene_len x
    smaller than the frame population before any shuffle.
    """
    from .similarity import phash_near_dup_pairs

    keys = (
        detect_scene_cuts(videos, threshold)
        .filter(F.col("is_cut"))
        .select(
            F.concat_ws("#", "video_id", F.col("scene_id").cast("string")).alias(
                "scene_key"
            ),
            "video_id",
            "phash",
        )
        .localCheckpoint()  # consumed by the stats groupBy AND both shared branches
    )
    stats = keys.groupBy("phash").agg(
        F.countDistinct("video_id").alias("__n_vids"),
        F.min("video_id").alias("__v0"),  # the single video when __n_vids == 1
    )
    exact_shared = (
        keys.join(stats.filter(F.col("__n_vids") >= 2).select("phash"), "phash")
        .select("scene_key")
    )
    reps = stats.select(
        F.col("phash").alias("pid"), F.col("phash").alias("ph")
    )
    rep_pairs = phash_near_dup_pairs(
        reps, max_hamming=max_hamming, id_col="pid", phash_col="ph", n_bands=n_bands
    )
    sym = rep_pairs.select(
        F.col("id_a").alias("phash"), F.col("id_b").alias("__q")
    ).unionAll(rep_pairs.select(F.col("id_b").alias("phash"), F.col("id_a").alias("__q")))
    near_shared = (
        keys.join(sym, "phash")
        .join(
            stats.select(
                F.col("phash").alias("__q"),
                F.col("__n_vids").alias("__qn"),
                F.col("__v0").alias("__qv"),
            ),
            "__q",
        )
        .filter((F.col("__qn") >= 2) | (F.col("__qv") != F.col("video_id")))
        .select("scene_key")
    )
    shared = (
        exact_shared.unionAll(near_shared).distinct().withColumn("__shared", F.lit(1))
    )
    return (
        keys.join(shared, "scene_key", "left")
        .groupBy("video_id")
        .agg(
            F.count("*").cast("int").alias("n_scenes"),
            F.sum(F.coalesce("__shared", F.lit(0))).cast("int").alias("n_shared_scenes"),
        )
        .withColumn(
            "shared_scene_frac",
            F.round(F.col("n_shared_scenes") / F.col("n_scenes"), 6),
        )
    )


WATERMARK_SCHEMA = (
    "image_id string, key_id int, w int, h int, fmt string, "
    "corr_scaled long, watermarked boolean"
)


def detect_watermarks(
    images: DataFrame,
    keys: tuple[int, ...] = (1, 2, 3),
    strength: int = codecs.WM_STRENGTH,
    scale: int = codecs.WM_SCALE,
) -> DataFrame:
    """Spread-spectrum watermark detection (Cox et al. 1997; the LAION-5B
    pipeline's watermark-filter stage re-expressed integer-exact): for
    each image x candidate key, the scaled correlation statistic
    codecs.wm_corr_scaled — ``(sum(pixel * sign(key)) * scale) // n`` —
    and the decision ``corr >= strength * scale // 2``. One row per
    (image, key); ~strength*scale for the embedding key, zero-mean
    ~255*scale/sqrt(n) noise for wrong keys and clean images.

    Integer end-to-end (order-free sums, floor division), so the DuckDB
    oracle inlines a fresh pure-Python recompute of the same contract
    (oracle/expected.py:watermark_rows) and matches bit-for-bit.

    Scale shape (100 TB): pure map-side — one mapInPandas pass, K
    correlations per image, no shuffle anywhere; the key list is a plan
    constant (a real deployment's watermark templates are a broadcast
    dimension, bounded like the IVF codebook)."""
    thr = codecs.wm_detect_threshold(strength, scale)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                img = _decode_or_raise(bytes(r.bytes), r.fmt)
                for k in keys:
                    corr = codecs.wm_corr_scaled(img, k, scale)
                    out.append(
                        {
                            "image_id": r.image_id,
                            "key_id": k,
                            "w": img.shape[1],
                            "h": img.shape[0],
                            "fmt": r.fmt,
                            "corr_scaled": corr,
                            "watermarked": corr >= thr,
                        }
                    )
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=WATERMARK_SCHEMA)
