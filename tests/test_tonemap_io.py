"""Tone normalization + PNG round trip + checkpoint/resume."""

import os

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops.tonemap import post_process
from raytracer_tpu.parallel.progressive import (
    ProgressiveState,
    load_checkpoint,
    save_checkpoint,
)
from raytracer_tpu.utils import color
from raytracer_tpu.utils.png import encode_png_rgb8, read_png_rgb8, write_png_atomic


def _reference_post_process(img):
    """Literal NumPy transcription of src/main.rs:748-762."""
    flat = img.reshape(-1, 3).astype(np.float32)
    w = np.array([0.212656, 0.715158, 0.072186], np.float32)
    luma = flat @ w
    ok = np.isfinite(luma) & (np.abs(luma) >= np.finfo(np.float32).tiny)
    lc = np.sort(luma[ok])
    p98 = lc[int(len(lc) * 0.99)]
    if p98 > np.finfo(np.float32).eps:
        return img / p98
    return img


def test_post_process_matches_reference_semantics():
    rng = np.random.default_rng(0)
    img = (rng.gamma(2.0, 0.5, size=(32, 24, 3))).astype(np.float32)
    img[3, 4] = np.nan  # non-normal lumas excluded from the statistic
    img[5, 6] = 0.0
    out = np.asarray(post_process(jnp.asarray(img)))
    ref = _reference_post_process(img)
    np.testing.assert_allclose(out[~np.isnan(ref)], ref[~np.isnan(ref)], rtol=1e-5)


def test_post_process_noop_below_epsilon():
    img = jnp.full((8, 8, 3), 1e-9, jnp.float32)
    out = np.asarray(post_process(img))
    np.testing.assert_array_equal(out, np.asarray(img))


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    data = encode_png_rgb8(rgb)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    path = str(tmp_path / "x.png")
    write_png_atomic(path, rgb)
    back = read_png_rgb8(path)
    np.testing.assert_array_equal(back, rgb)
    assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path))


def test_srgb_encode_roundtrip():
    lin = jnp.linspace(0, 1, 64).reshape(-1, 1).repeat(3, 1)
    u8 = np.asarray(color.linear_to_u8(lin))
    back = np.asarray(color.srgb_u8_to_linear(jnp.asarray(u8)))
    np.testing.assert_allclose(back[:, 0], np.asarray(lin)[:, 0], atol=0.004)


def test_checkpoint_roundtrip(tmp_path):
    img = jnp.asarray(np.random.default_rng(2).random((6, 8, 3)), jnp.float32)
    st = ProgressiveState(img=img, epoch=42, seed=7)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, st)
    back = load_checkpoint(path)
    assert back.epoch == 42 and back.seed == 7
    np.testing.assert_array_equal(np.asarray(back.img), np.asarray(img))
    assert load_checkpoint(str(tmp_path / "missing.npz")) is None
