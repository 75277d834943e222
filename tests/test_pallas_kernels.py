"""Pallas kernel parity vs XLA references (interpreter mode on CPU).

Real-TPU parity runs live in the verify drives; these keep the kernels
honest in CI without a chip.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_window_attention_pallas_parity():
    from gedepth_tpu.ops.window_attention import window_attention_xla
    from gedepth_tpu.ops.pallas.window_attn import window_attention_pallas

    rng = np.random.default_rng(0)
    for nWB, N, H, D, nW in [(12, 49, 2, 32, None), (12, 49, 2, 32, 6),
                             (8, 49, 1, 16, 8)]:
        q = jnp.asarray(rng.standard_normal((nWB, N, H, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((nWB, N, H, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((nWB, N, H, D)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
        mask = None
        if nW is not None:
            mask = jnp.asarray(np.where(rng.random((nW, N, N)) > 0.5,
                                        0.0, -100.0).astype(np.float32))
        ref = np.asarray(window_attention_xla(q, k, v, bias, mask))
        got = np.asarray(window_attention_pallas(q, k, v, bias, mask))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_pe_fusion_pallas_parity_and_grads():
    from gedepth_tpu.ops.pallas.pe_fusion import (
        pe_fusion_xla, pe_fusion_pallas)

    rng = np.random.default_rng(1)
    B, H, W = 2, 32, 128
    logits = jnp.asarray(rng.standard_normal((B, H, W, 11)).astype(np.float32))
    pe = jnp.asarray((np.abs(rng.standard_normal((B, H, W))) * 50 + 0.5)
                     .astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    h = jnp.asarray([1.65, 1.55], dtype=jnp.float32)

    ref = np.asarray(pe_fusion_xla(logits, pe, y, h, 200.0))
    got = np.asarray(pe_fusion_pallas(logits, pe, y, h, 200.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # custom_vjp routes grads through the XLA reference
    g_ref = jax.grad(lambda l: pe_fusion_xla(l, pe, y, h, 200.0).sum())(logits)
    g_got = jax.grad(lambda l: pe_fusion_pallas(l, pe, y, h, 200.0).sum())(
        logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
