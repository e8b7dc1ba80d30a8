"""Native libjpeg decoder: build, decode parity vs PIL, fallbacks."""

import io

import numpy as np
import pytest
from PIL import Image

from gan_variant_research_tpu.data.native_loader import decode_jpeg, native_available


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    p = tmp_path_factory.mktemp("jpg") / "x.jpg"
    Image.fromarray(img).save(p, quality=95)
    return p


def test_native_builds_and_decodes(jpeg_file):
    if not native_available():
        pytest.skip("toolchain/libjpeg unavailable")
    arr = decode_jpeg(jpeg_file)
    assert arr is not None
    assert arr.shape == (48, 64, 3) and arr.dtype == np.uint8


def test_native_matches_pil(jpeg_file):
    if not native_available():
        pytest.skip("toolchain/libjpeg unavailable")
    got = decode_jpeg(jpeg_file)
    with Image.open(jpeg_file) as im:
        want = np.asarray(im.convert("RGB"))
    # libjpeg IDCT variants may differ by ±1 LSB from PIL's
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 1.0
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 2


def test_grayscale_jpeg(tmp_path):
    if not native_available():
        pytest.skip("toolchain/libjpeg unavailable")
    img = np.linspace(0, 255, 32 * 32, dtype=np.uint8).reshape(32, 32)
    p = tmp_path / "gray.jpg"
    Image.fromarray(img, "L").save(p)
    arr = decode_jpeg(p)
    assert arr is not None and arr.shape == (32, 32, 3)


def test_non_jpeg_falls_back(tmp_path):
    p = tmp_path / "x.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    assert decode_jpeg(p) is None


def test_corrupt_jpeg_returns_none(tmp_path):
    if not native_available():
        pytest.skip("toolchain/libjpeg unavailable")
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8\xff\xe0 garbage not a jpeg")
    assert decode_jpeg(p) is None


def test_loader_uses_native_with_pil_fallback(jpeg_file):
    from gan_variant_research_tpu.data.loader import load_image_u8

    arr = load_image_u8(jpeg_file, size=32)
    assert arr.shape == (32, 32, 3)


def test_loader_propagates_decode_errors(tmp_path):
    """A corrupt image must raise in the consumer instead of killing the
    producer thread and hanging __next__ forever."""
    from gan_variant_research_tpu.data.loader import UnpairedLoader

    for d in ("a", "b"):
        (tmp_path / d).mkdir()
        (tmp_path / d / "img0.jpg").write_bytes(b"not a jpeg at all")
    loader = UnpairedLoader(tmp_path / "a", tmp_path / "b",
                            batch_size=1, size=16, num_workers=1)
    try:
        with pytest.raises(Exception):
            next(loader)
        # the error is sticky: a caller that catches and retries (or a second
        # consumer) re-raises instead of blocking forever on the drained queue
        # (ADVICE r2 low: the queued copy is delivered exactly once)
        for _ in range(3):
            with pytest.raises(Exception):
                next(loader)
    finally:
        loader.close()


def test_native_encode_matches_pil_contract(tmp_path):
    """Native encode (q95, 4:4:4, optimized Huffman) must decode identically
    to PIL's same-settings output — both drive libjpeg, so the encoded
    streams match bit-for-bit in practice; assert at the decode level."""
    from gan_variant_research_tpu.data.native_loader import encode_jpeg

    if not native_available():
        pytest.skip("toolchain/libjpeg unavailable")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=95, subsampling=0, optimize=True)
    assert data is not None and data[:3] == b"\xff\xd8\xff"

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95, subsampling=0,
                              optimize=True)
    ours = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    pils = np.asarray(Image.open(buf).convert("RGB"))
    np.testing.assert_array_equal(ours, pils)


def test_native_encode_roundtrip_quality():
    from gan_variant_research_tpu.data.native_loader import encode_jpeg

    if not native_available():
        pytest.skip("toolchain/libjpeg unavailable")
    # smooth gradient survives q95 4:4:4 nearly losslessly
    y = np.linspace(0, 255, 64, dtype=np.uint8)
    img = np.stack([np.tile(y, (64, 1))] * 3, axis=-1)
    dec = decode_jpeg(encode_jpeg(img))
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 3


def test_native_encode_rejects_bad_input():
    from gan_variant_research_tpu.data.native_loader import encode_jpeg

    if not native_available():
        pytest.skip("toolchain/libjpeg unavailable")
    assert encode_jpeg(np.zeros((8, 8), np.uint8)) is None
    assert encode_jpeg(np.zeros((8, 8, 3), np.float32)) is None
