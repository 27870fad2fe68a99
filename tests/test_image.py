"""Image codecs: PNG round-trip exactness, qz5 PSNR >= 40 dB, phash
stability, payload determinism."""

import numpy as np
import pytest

from crawler_spark import fixtures as fx
from crawler_spark.functions import image as img


def test_png_roundtrip_exact():
    rng = np.random.Generator(np.random.PCG64(7))
    px = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    back = img.decode_png(img.encode_png(px))
    assert np.array_equal(px, back)
    assert img.psnr(px, back) == float("inf")


def test_qz5_lossy_psnr_above_40():
    rng = np.random.Generator(np.random.PCG64(8))
    for shape in [(16, 16, 3), (64, 33, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = img.decode_qz5(img.encode_qz5(px))
        p = img.psnr(px, back)
        assert p >= 40.0, p
        assert back.shape == px.shape


def test_jpeg_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        img.decode_jpeg(b"\xff\xd8\xff")


def test_phash_deterministic_and_discriminative():
    px1 = fx.py_pixels(12345, 32, 32)
    px2 = fx.py_pixels(54321, 32, 32)
    h1, h1b, h2 = img.phash64(px1), img.phash64(px1), img.phash64(px2)
    assert h1 == h1b
    assert img.hamming64(h1, h2) > 8  # random images: ~32 expected
    assert -(2**63) <= h1 < 2**63


def test_phash_robust_to_qz5():
    px = fx.py_pixels(999, 48, 48)
    lossy = img.decode_qz5(img.encode_qz5(px))
    assert img.hamming64(img.phash64(px), img.phash64(lossy)) <= 4


def test_payload_deterministic():
    a = fx.py_fetch_payload(777)
    b = fx.py_fetch_payload(777)
    assert a == b
    decoded = img.decode(a["bytes"], a["fmt"])
    assert decoded.shape == (a["h"], a["w"], 3)


def test_frame_sample_vraw(spark):
    """Video frame-sampling over the deterministic vraw container:
    stride-seek random access, every-nth sampling, PNG re-encode
    byte-parity against the synthesized frame ground truth."""
    import numpy as np

    from crawler_spark import fixtures as fx
    from crawler_spark.functions import image as img
    from crawler_spark.functions import multimodal as MM

    frames = [fx.py_pixels(fx.py_xxhash64(f"v:f{i}"), 16, 12) for i in range(9)]
    data = MM.encode_vraw(frames)
    assert MM.vraw_info(data) == (16, 12, 9)
    assert np.array_equal(MM.decode_vraw_frame(data, 5), frames[5])

    videos = spark.createDataFrame(
        [("v", bytearray(data), "vraw")], "video_id string, bytes binary, fmt string"
    )
    out = MM.frame_sample(videos, every_n=4).collect()
    assert sorted(r.frame_idx for r in out) == [0, 4, 8]
    for r in out:
        assert (r.w, r.h) == (16, 12)
        assert np.array_equal(img.decode_png(bytes(r.frame_bytes)), frames[r.frame_idx])
        assert r.phash == img.phash64(frames[r.frame_idx])
