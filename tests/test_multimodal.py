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
