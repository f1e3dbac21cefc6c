"""Baseline JPEG codec (functions/jpeg.py): round-trip fidelity across
sampling modes / qualities / restart intervals, frozen-subset
rejections, and the decode_image sniff lane."""

import struct

import numpy as np
import pytest

from docling_translate_ray.functions import multimodal as mm
from docling_translate_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)


def _grad(h, w):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([(xx * 4) % 256, (yy * 5) % 256,
                     ((xx + yy) * 3) % 256], axis=2).astype(np.uint8)


def test_roundtrip_444_420_gray_quality():
    img = _grad(37, 50)
    assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=90))) > 40
    assert _psnr(img, decode_jpeg(
        encode_jpeg(img, quality=90, subsample=True))) > 35
    assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=50))) > 32
    g = img[:, :, 0]
    back = decode_jpeg(encode_jpeg(g, quality=90))
    assert back.shape == (37, 50, 1)
    assert _psnr(g[:, :, None], back) > 38


def test_uniform_color_exact_and_odd_sizes():
    for shape in [(8, 8), (9, 13), (16, 17), (1, 1)]:
        u = np.full(shape + (3,), 200, np.uint8)
        back = decode_jpeg(encode_jpeg(u, quality=90))
        assert back.shape == u.shape
        assert int(np.abs(back.astype(int) - 200).max()) <= 1


def test_restart_intervals_roundtrip():
    img = _grad(40, 56)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    for sub in (False, True):
        for ri in (1, 3):
            got = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub,
                                          restart_interval=ri))
            # 4:2:0 legitimately loses on wrapping-gradient chroma edges
            assert _psnr(img, got) > (30 if sub else 40)
    # without subsampling, restart must not change the pixels at all
    assert (decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
            == base).all()


def test_frozen_subset_rejections():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # progressive (SOF2) is out of subset: flip the SOF marker
    data = bytearray(encode_jpeg(_grad(16, 16)))
    sof = data.find(b"\xFF\xC0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    # 12-bit precision rejected
    data = bytearray(encode_jpeg(_grad(16, 16)))
    sof = data.find(b"\xFF\xC0")
    data[sof + 4] = 12
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        encode_jpeg(_grad(8, 8), quality=0)


def test_decode_image_sniffs_jpeg():
    img = _grad(24, 24)
    got = mm.decode_image(encode_jpeg(img, quality=95))
    assert got.shape == img.shape and _psnr(img, got) > 40
    gray = mm.decode_image(encode_jpeg(img[:, :, 0], quality=95))
    assert gray.shape == img.shape  # replicated to 3 channels


def test_jpeg_rows_in_planted_corpus_cluster():
    tbl = mm.gen_image_corpus(12, 4, seed=3)
    payloads = [p.as_py() for p in tbl["payload"]]
    assert any(p[:2] == b"\xFF\xD8" for p in payloads)
    # every payload decodes through the sniff lane
    for p in payloads:
        assert mm.decode_image(p).ndim == 3


def test_byte_stuffing_survives():
    # images whose entropy stream is length-heavy exercise 0xFF stuffing
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=98)
    assert b"\xFF\x00" in data  # stuffing actually occurred
    assert _psnr(img, decode_jpeg(data)) > 30
