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
