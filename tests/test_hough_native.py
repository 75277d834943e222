"""Deep Hough transform: TPU (XLA) implementation vs C++ CPU reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gedepth_tpu.ops.hough import deep_hough_transform, hough_bin_index


def _native_available():
    from gedepth_tpu.utils.native import native_lib
    return native_lib() is not None


needs_native = pytest.mark.skipif(not _native_available(),
                                  reason="native toolchain unavailable")


@needs_native
def test_hough_forward_matches_cpp():
    from gedepth_tpu.utils.native import hough_forward_cpu
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    na, nr = 30, 40
    want = hough_forward_cpu(feat, na, nr)
    got = np.asarray(deep_hough_transform(jnp.asarray(feat), na, nr))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@needs_native
def test_hough_backward_matches_cpp():
    from gedepth_tpu.utils.native import hough_backward_cpu
    rng = np.random.default_rng(1)
    B, C, H, W, na, nr = 1, 2, 16, 24, 20, 30
    g = rng.standard_normal((B, C, na, nr)).astype(np.float32)
    want = hough_backward_cpu(g, H, W)
    feat = jnp.zeros((B, C, H, W), jnp.float32)
    _, vjp = jax.vjp(lambda f: deep_hough_transform(f, na, nr), feat)
    got = np.asarray(vjp(jnp.asarray(g))[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_hough_conservation():
    """Each pixel votes into exactly one rho bin per angle: total mass =
    numangle * sum(feat) (when all bins are in range)."""
    rng = np.random.default_rng(2)
    feat = np.abs(rng.standard_normal((1, 1, 20, 20))).astype(np.float32)
    na, nr = 15, 64
    out = np.asarray(deep_hough_transform(jnp.asarray(feat), na, nr))
    np.testing.assert_allclose(out.sum(), na * feat.sum(), rtol=1e-4)


def test_hough_grad_is_linear_transpose():
    """<DHT(f), g> == <f, DHT^T(g)> (exact adjoint)."""
    rng = np.random.default_rng(3)
    na, nr, H, W = 12, 32, 10, 14
    f = jnp.asarray(rng.standard_normal((1, 1, H, W)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 1, na, nr)).astype(np.float32))
    fwd = deep_hough_transform(f, na, nr)
    _, vjp = jax.vjp(lambda x: deep_hough_transform(x, na, nr), f)
    fT_g = vjp(g)[0]
    lhs = float(jnp.sum(fwd * g))
    rhs = float(jnp.sum(f * fT_g))
    assert lhs == pytest.approx(rhs, rel=1e-4)


@needs_native
def test_native_png16_roundtrip(tmp_path):
    from PIL import Image
    from gedepth_tpu.utils.native import decode_depth_png16, load_depth_png
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 65535, size=(37, 53), dtype=np.uint16)
    p = tmp_path / "d.png"
    Image.fromarray(arr).save(p)
    with open(p, "rb") as f:
        got = decode_depth_png16(f.read())
    assert got is not None
    np.testing.assert_array_equal(got, arr)
    depth = load_depth_png(str(p))
    np.testing.assert_allclose(depth, arr.astype(np.float32) / 256.0)
