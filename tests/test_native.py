"""C++ host runtime vs the pure-Python reference implementations."""

import os
import subprocess

import numpy as np
import pytest

from raytracer_tpu.utils import native
from raytracer_tpu.utils.png import read_png_rgb8

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    so = os.path.join(REPO, "native", "libraytpu_host.so")
    if not os.path.exists(so):
        subprocess.run(["make"], cwd=os.path.join(REPO, "native"), check=True)
    # reset the lazy loader in case another test ran first
    native._LIB = None
    native._TRIED = False
    assert native.available(), "native host runtime failed to load"
    yield


def test_native_srgb_matches_python():
    import jax.numpy as jnp

    from raytracer_tpu.utils import color

    rng = np.random.default_rng(0)
    lin = rng.uniform(-0.1, 1.2, size=(64, 3)).astype(np.float32)
    lin[0] = [np.nan, np.inf, -np.inf]
    got = native.srgb_encode_u8(lin)
    want = np.asarray(color.linear_to_u8(jnp.asarray(lin)))
    # NaN clamps to 0 in native; jnp round of NaN is 0 via clip as well
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1  # rounding mode at exact .5 may differ by 1 lsb


def test_native_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(21, 13, 3), dtype=np.uint8)
    path = str(tmp_path / "native.png")
    native.write_png_atomic(path, rgb)
    back = read_png_rgb8(path)
    np.testing.assert_array_equal(back, rgb)
    assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path))


def test_native_percentile_matches_reference_semantics():
    rng = np.random.default_rng(2)
    rgb = rng.gamma(2.0, 0.5, size=(4096, 3)).astype(np.float32)
    rgb[7] = [np.nan, 1.0, 1.0]
    rgb[9] = [0.0, 0.0, 0.0]
    w = np.array([0.212656, 0.715158, 0.072186], np.float32)
    luma = rgb @ w
    ok = np.isfinite(luma) & (np.abs(luma) >= np.finfo(np.float32).tiny)
    want = np.sort(luma[ok])[int(ok.sum() * 0.99)]
    got = native.luma_percentile(rgb, 0.99)
    assert got == pytest.approx(float(want), rel=1e-5)


def test_png_writer_uses_native_when_available(tmp_path):
    from raytracer_tpu.utils.png import write_png_atomic

    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[..., 0] = 200
    path = str(tmp_path / "via_dispatch.png")
    write_png_atomic(path, rgb)
    np.testing.assert_array_equal(read_png_rgb8(path), rgb)
