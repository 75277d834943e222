"""AOT serving export (apis/export.py): roundtrip + parity with the live
eval step. Beyond-reference capability — the reference has no deployment
artifact (serving requires the full torch/mmcv repo)."""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from gedepth_tpu.apis.export import export_depther, save_exported

    out = tmp_path_factory.mktemp("export_art")
    exported, variables, meta = export_depther(
        "smoke_synthetic", platforms=("cpu",))
    save_exported(str(out), exported, variables, meta)
    return out, variables, meta


def _smoke_batch(meta, seed=0):
    b, h, w, c = meta["input"]["img"]
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    if c == 5:
        img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
        img[..., 3] = np.clip(img[..., 4], 0, None) / 200.0
    return img


def test_export_roundtrip_matches_live_eval(artifact):
    """Deserialized StableHLO call == the live jitted eval step, bitwise."""
    from gedepth_tpu.apis.export import load_exported
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.steps import make_eval_step

    out, variables, meta = artifact
    sm = load_exported(str(out))
    img = _smoke_batch(meta)
    ch = np.full((img.shape[0],), meta["default_cam_height"], np.float32)
    got = sm.predict(img, ch)

    cfg = get_config("smoke_synthetic")
    model = cfg.model.build()
    step = make_eval_step(model, flip_tta=meta["flip_tta"])
    want = np.asarray(step(variables["params"],
                           variables.get("batch_stats", {}),
                           {"img": img, "cam_height": ch}))
    np.testing.assert_array_equal(got, want)
    assert got.shape == tuple(meta["input"]["img"][:3])
    assert np.isfinite(got).all()


def test_export_artifact_is_model_code_free(artifact):
    """The loader path uses only jax + flax.serialization: run it in a
    subprocess that never imports gedepth_tpu model/config modules."""
    out, _, _ = artifact
    code = f"""
import sys
sys.path.insert(0, {str(sys.path[0])!r})
import json, os
import numpy as np
from jax import export as jexport
from flax import serialization

art = {str(out)!r}
exported = jexport.deserialize(open(os.path.join(art, 'model.stablehlo'), 'rb').read())
variables = serialization.msgpack_restore(open(os.path.join(art, 'weights.msgpack'), 'rb').read())
meta = json.load(open(os.path.join(art, 'meta.json')))
b, h, w, c = meta['input']['img']
img = np.zeros((b, h, w, c), np.float32)
if c == 5:
    img[..., 4] = 30.0
    img[..., 3] = 30.0 / 200.0
ch = np.full((b,), meta['default_cam_height'], np.float32)
depth = np.asarray(exported.call(variables, {{'img': img, 'cam_height': ch}}))
assert depth.shape == (b, h, w), depth.shape
assert np.isfinite(depth).all()
assert 'gedepth_tpu' not in sys.modules
print('MODEL_CODE_FREE_OK')
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600,
                       env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                            "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": ":".join(sys.path[:3])})
    assert "MODEL_CODE_FREE_OK" in r.stdout, r.stdout + r.stderr


def test_export_rejects_wrong_shape(artifact):
    from gedepth_tpu.apis.export import load_exported

    out, _, meta = artifact
    sm = load_exported(str(out))
    b, h, w, c = meta["input"]["img"]
    with pytest.raises(ValueError, match="shape"):
        sm.predict(np.zeros((b, h + 32, w, c), np.float32))
