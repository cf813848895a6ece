"""Codec + phash invariants (BASELINE.json input_hint: PSNR≥40dB lossy,
lossless exactness; FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np
import pytest

from facebook_crawler_spark.functions import images as img


@pytest.mark.parametrize("index", [0, 1, 17, 999])
def test_png_roundtrip_lossless(index):
    arr = img.pixels_for(index, 64, 48)
    fmt, back = img.decode(img.encode(arr, "png"))
    assert fmt == "png"
    np.testing.assert_array_equal(arr, back)


@pytest.mark.parametrize("index", [0, 3, 255])
def test_jpeg_roundtrip_psnr_ge_40(index):
    arr = img.pixels_for(index, 96, 96)
    fmt, back = img.decode(img.encode(arr, "jpeg"))
    assert fmt == "jpeg"
    assert img.psnr(arr, back) >= 40.0


def test_pixels_deterministic():
    a = img.pixels_for(7, 40, 40)
    b = img.pixels_for(7, 40, 40)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, img.pixels_for(8, 40, 40))


def test_phash_stable_and_in_long_range():
    arr = img.pixels_for(5, 80, 60)
    h1 = img.phash64(arr)
    assert h1 == img.phash64(arr)
    assert -(1 << 63) <= h1 < (1 << 63)
    # phash survives a lossy roundtrip within a small hamming distance
    # (borderline block means may flip a bit after quantization)
    _, lossy = img.decode(img.encode(arr, "jpeg"))
    assert bin(img.phash64(lossy) ^ h1).count("1") <= 2


def test_decode_real_is_stubbed_without_pil():
    arr = img.pixels_for(1, 32, 32)
    with pytest.raises(NotImplementedError):
        img.decode_real(img.encode(arr, "png"))


def test_resize_block_mean_shape():
    arr = img.pixels_for(2, 100, 60)
    out = img.resize_block_mean(arr, 16, 16)
    assert out.shape == (16, 16, 3)
    assert out.dtype == np.uint8
