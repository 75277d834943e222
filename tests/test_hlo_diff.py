"""op_histogram parses optimized HLO (tools/hlo_diff.py harness for the
batch-scaling investigation, NOTES.md "Batch scaling")."""
import jax
import jax.numpy as jnp

from tools.hlo_diff import op_histogram


def test_op_histogram_counts_ops():
    def f(a, b):
        return jnp.tanh(a @ b) + a.sum()

    a = jnp.ones((64, 64), jnp.float32)
    compiled = jax.jit(f).lower(a, a).compile()
    hist = op_histogram(compiled.as_text())
    assert sum(hist.values()) > 0
    # a matmul must appear as a dot / fusion / custom-call somewhere
    assert any(k.startswith(("dot", "fusion", "custom-call"))
               for k in hist), dict(hist)
