"""Native host library tests: jpeg decode, preprocessing, arena planner
(reference analog: the C API + data staging in `framework/c_api/`)."""

import io

import numpy as np
import pytest

from anakin_tpu.native import (
    decode_jpeg,
    native_available,
    plan_arena_native,
    preprocess_batch,
)
from anakin_tpu.native.host import _preprocess_numpy

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native lib not built (make -C native)")


@needs_native
def test_decode_jpeg_roundtrip(rng):
    from PIL import Image  # torch ships pillow

    # smooth gradient: random noise is destroyed by chroma subsampling,
    # which would test the codec, not our decode path
    yy, xx = np.mgrid[0:40, 0:60]
    img = np.stack([yy * 6, xx * 4, (yy + xx) * 3], axis=-1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    out = decode_jpeg(buf.getvalue())
    assert out.shape == (40, 60, 3)
    # lossy codec: mean error small on smooth content
    assert np.abs(out.astype(np.int32) - img.astype(np.int32)).mean() < 6


@needs_native
def test_decode_jpeg_garbage_fails():
    with pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")


@needs_native
def test_preprocess_matches_numpy_reference(rng):
    imgs = rng.integers(0, 256, size=(3, 37, 53, 3)).astype(np.uint8)
    got = preprocess_batch(imgs, (24, 24), num_threads=2)
    want = _preprocess_numpy(imgs, (24, 24),
                             np.asarray((0.485, 0.456, 0.406), np.float32),
                             np.asarray((0.229, 0.224, 0.225), np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_preprocess_numpy_fallback_shape(rng):
    imgs = rng.integers(0, 256, size=(2, 10, 10, 3)).astype(np.uint8)
    out = _preprocess_numpy(imgs, (7, 9),
                            np.zeros(3, np.float32), np.ones(3, np.float32))
    assert out.shape == (2, 7, 9, 3)
    # identity normalize: output in [0, 1]
    assert out.min() >= 0 and out.max() <= 1


@needs_native
def test_arena_planner_native_matches_python(rng):
    n = 200
    sizes = (rng.integers(1, 100, size=n) * 512).astype(np.int64)
    births = np.sort(rng.integers(0, 500, size=n)).astype(np.int32)
    deaths = (births + rng.integers(1, 50, size=n)).astype(np.int32)
    off_n, total_n = plan_arena_native(sizes, births, deaths)
    # python fallback path
    import anakin_tpu.native.host as host

    lib, host._LIB = host._LIB, None
    try:
        off_p, total_p = plan_arena_native(sizes, births, deaths)
    finally:
        host._LIB = lib
    np.testing.assert_array_equal(off_n, off_p)
    assert total_n == total_p
    # no live overlap
    order = np.argsort(births, kind="stable")
    for i in order:
        for j in order:
            if i >= j:
                continue
            overlap_time = births[j] <= deaths[i] and births[i] <= deaths[j]
            overlap_mem = (off_n[i] < off_n[j] + sizes[j]
                           and off_n[j] < off_n[i] + sizes[i])
            assert not (overlap_time and overlap_mem), (i, j)


def test_native_safetensors_loader(tmp_path, rng):
    """mmap loader vs the safetensors package (zero-copy views)."""
    import pytest

    from anakin_tpu.native.host import load_safetensors, native_available

    if not native_available():
        pytest.skip("native lib not built")
    from safetensors.numpy import save_file

    tensors = {
        "w": rng.standard_normal((17, 33)).astype(np.float32),
        "q": rng.integers(-127, 127, (8, 128)).astype(np.int8),
        "s": rng.uniform(0.1, 1.0, 64).astype(np.float32),
        "i": rng.integers(0, 1000, (5,)).astype(np.int64),
    }
    p = str(tmp_path / "w.safetensors")
    save_file(tensors, p, metadata={"origin": "test"})
    got = load_safetensors(p)
    assert got is not None and set(got) == set(tensors)
    for k, v in tensors.items():
        assert got[k].dtype == v.dtype and got[k].shape == v.shape
        np.testing.assert_array_equal(got[k], v)
        assert not got[k].flags.writeable  # zero-copy views are read-only
    # model_io path uses it transparently
    assert load_safetensors(str(tmp_path / "missing.safetensors")) is None
