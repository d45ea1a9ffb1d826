"""Image curation operators: quality stats + image-text alignment.

Distributed output must equal the sequential fresh-arithmetic recompute
(curate_images_py — the oracle side of the image_curation gate), every
verdict class must actually fire on the fixture, and the whole pass must
be shuffle-free (its 100-TB claim)."""

import numpy as np
import pytest

from jobscrawler_spark.generators import gen_curation_images
from jobscrawler_spark.operators.image_curation import curate_images
from jobscrawler_spark.oracle.expected import curate_images_py
from jobscrawler_spark.schemas import IMAGES


@pytest.fixture(scope="module")
def fixture_pdf():
    return gen_curation_images(120, seed=42)


# min_side=24 everywhere the fixture is scored: the fetch model produces
# thumbnail-scale payloads (8-64 px), so the production default of 64
# would flag every normal image (same choice as the image_curation gate)
THRESHOLDS = {"min_side": 24}


@pytest.fixture(scope="module")
def spark_rows(spark, fixture_pdf):
    df = spark.createDataFrame(fixture_pdf, IMAGES)
    out = curate_images(df.repartition(8), **THRESHOLDS)
    return sorted((r.asDict() for r in out.collect()), key=lambda r: r["image_id"])


@pytest.fixture(scope="module")
def oracle_rows(fixture_pdf):
    return sorted(
        curate_images_py(fixture_pdf.to_dict("records"), **THRESHOLDS),
        key=lambda r: r["image_id"],
    )


def test_curate_matches_sequential(spark_rows, oracle_rows):
    assert len(spark_rows) == len(oracle_rows) == 120
    for s, o in zip(spark_rows, oracle_rows):
        assert s == o, (s, o)


def test_every_verdict_class_fires(oracle_rows):
    for col in (
        "too_small", "bad_aspect", "low_entropy", "low_contrast",
        "misaligned", "flagged_nsfw", "keep",
    ):
        vals = {r[col] for r in oracle_rows}
        assert vals == {True, False}, f"{col} never exercised both branches: {vals}"


def test_skin_images_flagged(fixture_pdf, oracle_rows):
    """The planted skin-dominant class (i % 10 == 5) saturates the Peer
    rule (every pixel matches -> skin_e4 == 10000) and is the ONLY class
    that must trip flagged_nsfw."""
    by_id = {r["image_id"]: r for r in oracle_rows}
    skin_ids = [
        r.image_id
        for r in fixture_pdf.itertuples()
        if r.image_id.count("/s/") and int(r.image_id.rsplit("/", 1)[1]) % 10 == 5
    ]
    assert skin_ids
    for iid in skin_ids:
        r = by_id[iid]
        assert r["skin_e4"] == 10000 and r["flagged_nsfw"] and not r["keep"], r
    for r in oracle_rows:
        if r["image_id"] not in skin_ids:
            assert not r["flagged_nsfw"], r


def test_flat_images_flagged(fixture_pdf, oracle_rows):
    by_id = {r["image_id"]: r for r in oracle_rows}
    flat_ids = [
        r.image_id for r in fixture_pdf.itertuples() if r.image_id.count("/s/") and int(r.image_id.rsplit("/", 1)[1]) % 10 == 8
    ]
    assert flat_ids
    for iid in flat_ids:
        r = by_id[iid]
        assert r["entropy"] == 0.0 and r["low_entropy"]
        assert r["luma_std"] == 0.0 and r["low_contrast"]
        assert not r["keep"]


def test_curation_is_shuffle_free(spark, fixture_pdf):
    df = spark.createDataFrame(fixture_pdf.head(10), IMAGES)
    plan = curate_images(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_alignment_threshold_is_integer_compare(fixture_pdf, oracle_rows):
    # re-run the sequential side with a shifted threshold: the flag must
    # move exactly at the integer boundary, independent of float repr
    shifted = curate_images_py(
        fixture_pdf.to_dict("records"), align_threshold=0.25, **THRESHOLDS
    )
    for base, sh in zip(oracle_rows, sorted(shifted, key=lambda r: r["image_id"])):
        assert sh["misaligned"] == (sh["align_e6"] < 250000)
        assert base["align_e6"] == sh["align_e6"]


def test_caption_defect_classes_flagged(fixture_pdf, oracle_rows):
    """r6 caption-quality gates: the planted keyword-stuffed captions
    (i % 20 == 3, 'buy cheap now' x 8 -> rep_e4 8750) and one-token
    captions (i % 20 == 13) must be the ONLY flagged_caption rows."""
    planted = {
        r.image_id
        for r in fixture_pdf.itertuples()
        if "/i/" in r.image_id
        and int(r.image_id.rsplit("/", 1)[1]) % 20 in (3, 13)
    }
    assert planted
    for r in oracle_rows:
        if r["image_id"] in planted:
            assert r["flagged_caption"] and not r["keep"], r
            i = int(r["image_id"].rsplit("/", 1)[1])
            if i % 20 == 3:
                assert r["cap_tokens"] == 24 and r["cap_rep_e4"] == 8750, r
            else:
                assert r["cap_tokens"] == 1 and r["cap_rep_e4"] == 0, r
        else:
            assert not r["flagged_caption"], r


def test_blur_flag_catches_contrasty_smooth_ramp(spark):
    """The defect only the Laplacian can see: a smooth wide gradient has
    HIGH contrast (luma_std >> min_contrast) and healthy entropy, but a
    near-zero local derivative — low_contrast/low_entropy stay false and
    flagged_blurry alone rejects it. A sharp textured image of the same
    size passes."""
    import numpy as np
    import pandas as pd

    from jobscrawler_spark.functions import codecs
    from jobscrawler_spark.operators.image_curation import curate_images

    ramp = np.clip(
        np.rint(np.zeros((96, 512, 3)) + np.linspace(0, 100, 512)[None, :, None]),
        0, 255,
    ).astype(np.uint8)
    sharp = np.random.default_rng(7).integers(0, 256, (96, 512, 3)).astype(np.uint8)
    rows = [
        {"image_id": "ramp", "bytes": codecs.encode(ramp, "raw"), "w": 512, "h": 96,
         "fmt": "raw", "caption": "a smooth gradient banner image", "phash": 0},
        {"image_id": "sharp", "bytes": codecs.encode(sharp, "raw"), "w": 512, "h": 96,
         "fmt": "raw", "caption": "a sharp textured image", "phash": 0},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["image_id"]: r for r in curate_images(
        df, min_side=24, max_aspect=8.0, align_threshold=-1.0
    ).collect()}
    r = got["ramp"]
    assert r["luma_std"] > 10.0 and not r["low_contrast"] and not r["low_entropy"]
    assert r["lap_e1"] < 20 and r["flagged_blurry"] and not r["keep"]
    s = got["sharp"]
    assert s["lap_e1"] >= 20 and not s["flagged_blurry"]
