"""tools/compat_check.py: the per-checkpoint radius-acceptance CLI that
every parity doc points operators at (PARITY.md round 5)."""
import os
import os.path as osp
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # two tiny-model jits per radius on CPU

OPTS = ("model.embed_dims=16 model.depths=1,1,2,1 model.num_heads=2,2,4,8 "
        "model.window=2 model.neck_channels=64,16,32,64,128 "
        "model.neck_embed_dim=32 model.neck_num_points=4 "
        "model.head_channels=16 data.eval_size=64,128").split()


def test_compat_check_cli(tmp_path):
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.checkpoint import save_params_only

    here = osp.dirname(osp.dirname(osp.abspath(__file__)))
    sys.path.insert(0, here)
    from tools.train import apply_options

    cfg = apply_options(get_config("gedepth_adaptive_kitti_parity"), OPTS)
    m = cfg.model.build()
    img = jnp.zeros((1, 64, 128, 5), jnp.float32)
    v = m.init(jax.random.PRNGKey(3), img, jnp.ones((1,), jnp.float32))
    ckpt = str(tmp_path / "tiny.npz")
    save_params_only(ckpt, v["params"], v.get("batch_stats", {}))

    proc = subprocess.run(
        [sys.executable, osp.join(here, "tools", "compat_check.py"), ckpt,
         "--cpu", "--radii", "2,8", "--images", "1", "--options"] + OPTS,
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = proc.stdout
    # table rows for both radii + clamp telemetry + a recommendation
    assert "  2 " in out and "  8 " in out
    assert "clamp_mass" in out and "RECOMMENDATION:" in out
    # random-init weights scatter reference points widely: R=2 must show
    # substantial clamp mass, and delta must improve with R
    lines = [l for l in out.splitlines() if l.strip().startswith(("2 ", "8 "))]
    d2 = float(lines[0].split()[1])
    d8 = float(lines[1].split()[1])
    assert d8 <= d2
