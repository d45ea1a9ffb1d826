"""Multimodal binary-column plumbing: decode/features/resize are real for
the engine's own codecs; external codec backends raise cleanly."""

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.generators import gen_images
from jobscrawler_spark.operators.multimodal import (
    extract_image_features,
    resize_images,
    sample_video_frames,
)
from jobscrawler_spark.schemas import IMAGES
from jobscrawler_spark.functions import codecs


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(gen_images(64), IMAGES).cache()


def test_extract_features(spark, images):
    feats = extract_image_features(images).collect()
    assert len(feats) == 64
    by_id = {r["image_id"]: r for r in feats}
    for r in images.collect():
        f = by_id[r["image_id"]]
        assert (f["w"], f["h"]) == (r["w"], r["h"])
        assert 0 <= f["brightness"] <= 255
        # feature-stage phash of decoded pixels stays near the stored phash
        assert codecs.hamming64(f["phash"], r["phash"]) <= 4


def test_resize_images(spark, images):
    thumbs = resize_images(images, size=16).collect()
    assert len(thumbs) == 64
    for t in thumbs:
        assert (t["w"], t["h"], t["fmt"]) == (16, 16, "png")
        img = codecs.decode(bytes(t["bytes"]), "png")
        assert img.shape == (16, 16, 3)


def test_unknown_codec_raises(spark, images):
    jpeg = images.limit(1).withColumn("fmt", F.lit("jpeg"))
    with pytest.raises(Exception) as ei:
        extract_image_features(jpeg).collect()
    assert "NotImplementedError" in str(ei.value) or "codec backend" in str(ei.value)


def test_video_stub_raises(spark):
    vids = spark.createDataFrame([("v1", b"xx")], "video_id string, bytes binary")
    with pytest.raises(Exception):
        sample_video_frames(vids).collect()


def test_vraw_roundtrip_and_frame_sampling(spark):
    import numpy as np

    from jobscrawler_spark.functions import codecs
    from jobscrawler_spark.generators import gen_videos
    from jobscrawler_spark.operators.multimodal import sample_video_frames

    clip = codecs.synth_video(12345, 10, 7, 13)
    frames, fps = codecs.decode_vraw(codecs.encode_vraw(clip, fps=24))
    assert fps == 24 and (frames == clip).all()

    videos = spark.createDataFrame(gen_videos(6), "video_id string, bytes binary, fmt string")
    out = sample_video_frames(videos, every_n=5).collect()
    # every sampled frame decodes (PNG) to the exact synth frame
    pdf = gen_videos(6)
    by_id = {r.video_id: codecs.decode_vraw(bytes(r.bytes))[0] for r in pdf.itertuples()}
    assert out and all(r["frame_no"] % 5 == 0 for r in out)
    for r in out:
        want = by_id[r["video_id"]][r["frame_no"]]
        got = codecs.decode(bytes(r["bytes"]), "png")
        assert (got == want).all()
    # row counts: one row per sampled frame
    want_n = sum((len(v) + 4) // 5 for v in by_id.values())
    assert len(out) == want_n


def test_audio_features_match_numpy(spark):
    import numpy as np

    from jobscrawler_spark.functions import codecs
    from jobscrawler_spark.generators import gen_audio
    from jobscrawler_spark.operators.multimodal import extract_audio_features

    pdf = gen_audio(8)
    audio = spark.createDataFrame(pdf, "audio_id string, bytes binary, fmt string")
    got = {r["audio_id"]: r for r in extract_audio_features(audio).collect()}
    for r in pdf.itertuples():
        samples, rate = codecs.decode_pcm16(bytes(r.bytes))
        x = samples.astype(np.float64)
        g = got[r.audio_id]
        assert g["n_samples"] == len(samples)
        assert g["duration_s"] == round(len(samples) / rate, 6)
        assert g["rms"] == round(float(np.sqrt(np.mean(x**2))), 4)
        assert g["zero_crossings"] == int(np.count_nonzero(np.diff(np.signbit(x))))
        assert g["peak"] == int(np.abs(samples.astype(np.int32)).max())


def test_external_codecs_honestly_stubbed(spark):
    import pytest as _pytest

    from jobscrawler_spark.operators.multimodal import (
        extract_audio_features,
        sample_video_frames,
    )

    vids = spark.createDataFrame([("v0", b"xx", "h264")], "video_id string, bytes binary, fmt string")
    with _pytest.raises(Exception, match="NotImplementedError|h264"):
        sample_video_frames(vids).collect()
    aud = spark.createDataFrame([("a0", b"xx", "mp3")], "audio_id string, bytes binary, fmt string")
    with _pytest.raises(Exception, match="NotImplementedError|mp3"):
        extract_audio_features(aud).collect()


def _scene_truth(i, seed=42):
    """Scene lengths of clip i, re-derived from the generator's metadata
    (independent of both the operator and expected.py)."""
    from jobscrawler_spark.generators import url_digest

    d = url_digest(f"scenevid:{seed}:{i}")
    n_scenes = 2 + d % 4
    return [3 + (d >> (4 * s + 20)) % 5 for s in range(n_scenes)]


def test_scene_cuts_recover_planted_boundaries(spark):
    """is_cut fires exactly at the scene starts the generator planted, and
    scene_id counts them; the in-scene brightness wobble never fires."""
    from jobscrawler_spark.generators import gen_scene_videos
    from jobscrawler_spark.operators.multimodal import detect_scene_cuts

    vids = spark.createDataFrame(
        gen_scene_videos(10), "video_id string, bytes binary, fmt string"
    )
    rows = detect_scene_cuts(vids).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert len(by_vid) == 10
    for i in range(10):
        lens = _scene_truth(i)
        expected_cuts = [sum(lens[:s]) for s in range(len(lens))]
        frames = sorted(by_vid[f"sv{i:04d}"], key=lambda r: r["frame_no"])
        assert len(frames) == sum(lens)
        got_cuts = [r["frame_no"] for r in frames if r["is_cut"]]
        assert got_cuts == expected_cuts, (i, got_cuts, expected_cuts)
        assert [r["scene_id"] for r in frames] == [
            sum(f >= c for c in expected_cuts) - 1 for f in range(sum(lens))
        ]


def test_scene_cut_wobble_bounded_and_frame0_null(spark):
    """Non-cut frames have mean per-pixel luma delta <= 6 (the wobble
    bound); frame 0's diff_sum is NULL and still a cut."""
    from jobscrawler_spark.generators import gen_scene_videos, url_digest
    from jobscrawler_spark.operators.multimodal import detect_scene_cuts

    vids = spark.createDataFrame(
        gen_scene_videos(4), "video_id string, bytes binary, fmt string"
    )
    for r in detect_scene_cuts(vids).collect():
        i = int(r["video_id"][2:])
        d = url_digest(f"scenevid:42:{i}")
        n_px = (12 + (d >> 8) % 21) * (12 + (d >> 16) % 21)
        if r["frame_no"] == 0:
            assert r["diff_sum"] is None and r["is_cut"]
        elif not r["is_cut"]:
            assert r["diff_sum"] <= 6 * n_px
        else:
            assert r["diff_sum"] > 25 * n_px


def test_scene_cuts_deterministic_across_partitionings(spark):
    """1-partition and 8-partition runs emit identical rows (map-side
    operator: partitioning must be invisible)."""
    from jobscrawler_spark.generators import gen_scene_videos
    from jobscrawler_spark.operators.multimodal import detect_scene_cuts

    pdf = gen_scene_videos(6)
    one = spark.createDataFrame(pdf, "video_id string, bytes binary, fmt string").coalesce(1)
    many = spark.createDataFrame(pdf, "video_id string, bytes binary, fmt string").repartition(8)
    a = sorted(map(tuple, detect_scene_cuts(one).collect()))
    b = sorted(map(tuple, detect_scene_cuts(many).collect()))
    assert a == b


def test_scene_dup_planted_cross_video_boilerplate(spark):
    """Every third clip of the shared-scene fixture carries the fixed
    boilerplate scene 0: exactly those clips must report one shared
    scene; every other clip reports zero."""
    from jobscrawler_spark.generators import gen_scene_videos
    from jobscrawler_spark.operators.multimodal import scene_dup_stats

    vids = spark.createDataFrame(
        gen_scene_videos(12, shared_scene=True),
        "video_id string, bytes binary, fmt string",
    )
    rows = {r["video_id"]: r for r in scene_dup_stats(vids).collect()}
    assert len(rows) == 12
    for i in range(12):
        r = rows[f"sv{i:04d}"]
        if i % 3 == 0:
            assert r["n_shared_scenes"] == 1, i
            assert abs(r["shared_scene_frac"] - round(1 / r["n_scenes"], 6)) < 1e-9
        else:
            assert r["n_shared_scenes"] == 0, i


def test_scene_dup_excludes_same_video_repetition(spark):
    """A clip whose own intro repeats (scene 0 == scene 2) but matches no
    OTHER video must report zero shared scenes — internal repetition is
    scene structure, not corpus boilerplate."""
    import numpy as np

    from jobscrawler_spark.operators.multimodal import scene_dup_stats

    base_a = codecs.synth_pixels(111, 20, 20)
    base_b = codecs.synth_pixels(222, 20, 20)
    frames = np.stack([base_a] * 3 + [base_b] * 3 + [base_a] * 3)
    other = np.stack(
        [codecs.synth_pixels(333, 20, 20)] * 3 + [codecs.synth_pixels(444, 20, 20)] * 3
    )
    vids = spark.createDataFrame(
        [
            ("rep0", bytearray(codecs.encode_vraw(frames)), "vraw"),
            ("oth0", bytearray(codecs.encode_vraw(other)), "vraw"),
        ],
        "video_id string, bytes binary, fmt string",
    )
    rows = {r["video_id"]: r for r in scene_dup_stats(vids).collect()}
    assert rows["rep0"]["n_scenes"] == 3
    assert rows["rep0"]["n_shared_scenes"] == 0
    assert rows["oth0"]["n_shared_scenes"] == 0


# --------------------------------------------------------------------------
# Spread-spectrum watermark detection (r6)
# --------------------------------------------------------------------------


def test_watermark_embed_detect_numpy_roundtrip():
    """codecs-level: embedding key k raises corr(k) to ~strength*scale;
    wrong keys and clean images stay near zero."""
    img = codecs.synth_pixels(1234, 56, 52)
    marked = codecs.embed_watermark(img, 2)
    thr = codecs.wm_detect_threshold()
    assert codecs.wm_corr_scaled(marked, 2) >= thr
    for wrong in (1, 3, 7):
        assert abs(codecs.wm_corr_scaled(marked, wrong)) < thr
    assert abs(codecs.wm_corr_scaled(img, 2)) < thr


def test_watermark_planted_keys_detected(spark):
    from jobscrawler_spark.generators import gen_wm_images
    from jobscrawler_spark.operators.multimodal import detect_watermarks

    imgs = spark.createDataFrame(
        gen_wm_images(48), "image_id string, bytes binary, w int, h int, fmt string"
    )
    rows = detect_watermarks(imgs).collect()
    assert len(rows) == 48 * 3
    flagged = {(r["image_id"], r["key_id"]) for r in rows if r["watermarked"]}
    expected = {
        (f"wm{i:04d}", i % 4) for i in range(48) if i % 4 in (1, 2, 3)
    }
    assert flagged == expected
    # hard margin: every planted statistic clears every non-planted one
    planted = [r["corr_scaled"] for r in rows if (r["image_id"], r["key_id"]) in expected]
    others = [r["corr_scaled"] for r in rows if (r["image_id"], r["key_id"]) not in expected]
    assert min(planted) > max(others)


def test_watermark_matches_pure_python_recompute(spark):
    from jobscrawler_spark.generators import gen_wm_images
    from jobscrawler_spark.operators.multimodal import detect_watermarks
    from jobscrawler_spark.oracle.expected import watermark_rows

    imgs = spark.createDataFrame(
        gen_wm_images(12), "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {
        (r["image_id"], r["key_id"]): r["corr_scaled"]
        for r in detect_watermarks(imgs).collect()
    }
    want = {(m, k): int(metric) for _, m, k, _w, _h, _f, metric, _fp in watermark_rows(12)}
    assert got == want


def test_watermark_deterministic_across_partitionings(spark):
    from jobscrawler_spark.generators import gen_wm_images
    from jobscrawler_spark.operators.multimodal import detect_watermarks

    imgs = spark.createDataFrame(
        gen_wm_images(16), "image_id string, bytes binary, w int, h int, fmt string"
    )
    a = sorted(map(tuple, detect_watermarks(imgs).collect()))
    b = sorted(map(tuple, detect_watermarks(imgs.repartition(7)).collect()))
    assert a == b


def test_audio_segments_recover_planted_spans(spark):
    """Every planted loud span must map onto active frames and every
    silent span onto inactive frames (frames fully inside a span; the
    boundary frame may mix), and seg_id must increase by exactly 1 at
    every activity flip."""
    from jobscrawler_spark.generators import gen_vad_audio, vad_audio_samples
    from jobscrawler_spark.operators.multimodal import segment_audio
    from jobscrawler_spark.fetch_model import url_digest

    df = spark.createDataFrame(gen_vad_audio(6), "audio_id string, bytes binary, fmt string")
    rows = segment_audio(df).collect()
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["audio_id"], []).append(r)

    for i in range(6):
        clip = sorted(by_clip[f"va{i:04d}"], key=lambda r: r["frame_no"])
        # rebuild the planted span layout from the shared constructor
        d = url_digest(f"vad:42:{i}")
        spans, pos = [], 0
        for s in range(4 + d % 3):
            length = 500 + ((d >> (4 * s)) % 1500)
            spans.append((pos, pos + length, (s + i) % 2 == 0))
            pos += length
        for r in clip:
            start, end = r["frame_no"] * 400, r["frame_no"] * 400 + r["n"]
            inside = [a for (lo, hi, a) in spans if lo <= start and end <= hi]
            if inside:  # frame fully within one planted span
                assert r["active"] == inside[0], (i, r["frame_no"])
        # seg_id counts flips
        seg, prev = -1, None
        for r in clip:
            if prev is None or r["active"] != prev:
                seg += 1
            assert r["seg_id"] == seg
            prev = r["active"]
        assert clip[-1]["seg_id"] >= 3  # several alternations per clip
        # total samples conserved
        assert sum(r["n"] for r in clip) == len(vad_audio_samples(i))


def test_audio_segments_deterministic_across_partitionings(spark):
    from jobscrawler_spark.generators import gen_vad_audio
    from jobscrawler_spark.operators.multimodal import segment_audio

    df = spark.createDataFrame(gen_vad_audio(8), "audio_id string, bytes binary, fmt string")
    one = sorted(map(tuple, segment_audio(df.coalesce(1)).collect()))
    many = sorted(map(tuple, segment_audio(df.repartition(7)).collect()))
    assert one == many


def test_audio_segments_match_python_recompute(spark):
    from jobscrawler_spark.generators import gen_vad_audio
    from jobscrawler_spark.operators.multimodal import segment_audio
    from jobscrawler_spark.oracle.expected import audio_seg_rows
    import hashlib

    df = spark.createDataFrame(gen_vad_audio(4), "audio_id string, bytes binary, fmt string")
    got = {
        (r["audio_id"], r["frame_no"]): hashlib.md5(
            f"{r['seg_id']}|{1 if r['active'] else 0}|{r['energy_sum']}|{r['n']}".encode()
        ).hexdigest()
        for r in segment_audio(df).collect()
    }
    want = {(m, idx): fp for (_, m, idx, _, _, _, _, fp) in audio_seg_rows(4)}
    assert got == want
