"""Codec invariants (BASELINE.json input_hint): lossless roundtrip for
raw/png, PSNR>=40dB for the lossy dct codec, phash stability."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jobscrawler_spark.functions import codecs as C


@pytest.mark.parametrize("fmt", ["raw", "png", "dct"])
@pytest.mark.parametrize("seed,w,h", [(1, 8, 8), (42, 17, 23), (7, 64, 48), (99, 33, 9)])
def test_roundtrip(fmt, seed, w, h):
    img = C.synth_pixels(seed, w, h)
    dec = C.decode(C.encode(img, fmt), fmt)
    assert dec.shape == img.shape
    if fmt in ("raw", "png"):
        assert np.array_equal(dec, img)
    else:
        assert C.psnr(img, dec) >= 40.0


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**63 - 1), st.integers(8, 64), st.integers(8, 64))
def test_dct_psnr_property(seed, w, h):
    img = C.synth_pixels(seed, w, h)
    assert C.psnr(img, C.decode(C.encode(img, "dct"), "dct")) >= 40.0


def test_phash_stable_under_lossy():
    for seed in range(10):
        img = C.synth_pixels(seed, 48, 32)
        lossy = C.decode(C.encode(img, "dct"), "dct")
        assert C.hamming64(C.phash(img), C.phash(lossy)) <= 4


def test_phash_discriminates():
    a = C.phash(C.synth_pixels(1, 32, 32))
    b = C.phash(C.synth_pixels(2, 32, 32))
    assert C.hamming64(a, b) > 8


def test_png_is_standard_png():
    img = C.synth_pixels(5, 20, 10)
    data = C.encode(img, "png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:33] and data.endswith(b"\xaeB`\x82")  # IEND crc
