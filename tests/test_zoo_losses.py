"""Zoo training-recipe loss composition (VERDICT r3 #5).

Asserts the reference `_base_/models/*.py` loss recipes are actually wired
into training: SigLoss weight 10 for adabins/binsformer/dpt vs 1.0 for
bts/densedepth, BinsFormer aux-layer supervision (layers [2,5], weights
[1/4, 1/2]), scene-class CE 1e-2, and the (off-by-default) bin chamfer.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gedepth_tpu.configs import get_config
from gedepth_tpu.models.zoo import ZooDepther
from gedepth_tpu.train import make_optimizer, create_train_state
from gedepth_tpu.train.steps import make_zoo_train_step

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)


def _batch(b=2, h=32, w=32, with_scene=False, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    depth = np.abs(rng.standard_normal((b, h, w))).astype(np.float32) * 5
    depth[depth < 1] = 0.0
    batch = {"img": jnp.asarray(img), "depth_gt": jnp.asarray(depth),
             "cam_height": jnp.zeros((b,), jnp.float32)}
    if with_scene:
        batch["scene_class"] = jnp.asarray(
            rng.integers(0, 5, size=(b,)), jnp.int32)
    return batch


def _tiny_binsformer():
    return ZooDepther(arch="binsformer", backbone_embed_dims=16,
                      head_channels=16, n_bins=8, max_depth=10.0)


def _state(model, batch):
    tx, _ = make_optimizer(1e-4, 10, 0)
    return tx, create_train_state(model, tx, batch["img"],
                                  jax.random.PRNGKey(0),
                                  batch["cam_height"])


def test_preset_loss_weights_match_reference():
    assert get_config("adabins_nyu").optim.sig_loss_weight == 10.0
    assert get_config("dpt_kitti").optim.sig_loss_weight == 10.0
    assert get_config("bts_kitti").optim.sig_loss_weight == 1.0
    assert get_config("densedepth_kitti").optim.sig_loss_weight == 1.0
    bf = get_config("binsformer_nyu").optim
    assert bf.sig_loss_weight == 10.0
    assert bf.aux_loss_indices == (2, 5)
    assert bf.aux_loss_weights == (0.25, 0.5)
    assert bf.class_ce_weight == pytest.approx(1e-2)
    assert bf.chamfer_weight == 0.0  # reference: with_loss_chamfer=False
    assert get_config("binsformer_nyu").data.scene_classes


def test_binsformer_full_composition():
    model = _tiny_binsformer()
    batch = _batch(with_scene=True)
    _, state = _state(model, batch)
    step = make_zoo_train_step(
        model, sig_loss_weight=10.0, aux_loss_indices=(2, 5),
        aux_loss_weights=(0.25, 0.5), class_ce_weight=1e-2,
        chamfer_weight=0.1, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    keys = set(metrics)
    assert {"loss_depth", "loss_ce", "loss_chamfer",
            "aux_loss_depth_2", "aux_loss_depth_5", "loss"} <= keys
    parts = (metrics["loss_depth"] + metrics["loss_ce"]
             + metrics["loss_chamfer"] + metrics["aux_loss_depth_2"]
             + metrics["aux_loss_depth_5"])
    np.testing.assert_allclose(float(metrics["loss"]), float(parts),
                               rtol=1e-6)
    assert np.isfinite(float(metrics["loss"]))


def test_sig_loss_weight_scales_linearly():
    model = _tiny_binsformer()
    batch = _batch()
    _, state = _state(model, batch)
    m1 = make_zoo_train_step(model, sig_loss_weight=1.0, donate=False)(
        state, batch, jax.random.PRNGKey(1))[1]
    m10 = make_zoo_train_step(model, sig_loss_weight=10.0, donate=False)(
        state, batch, jax.random.PRNGKey(1))[1]
    np.testing.assert_allclose(float(m10["loss_depth"]),
                               10.0 * float(m1["loss_depth"]), rtol=1e-5)


def test_aux_and_optional_losses_absent_when_disabled():
    model = _tiny_binsformer()
    batch = _batch()  # no scene_class in batch
    _, state = _state(model, batch)
    step = make_zoo_train_step(model, sig_loss_weight=10.0, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert "loss_ce" not in metrics
    assert "loss_chamfer" not in metrics
    assert not any(k.startswith("aux_loss") for k in metrics)


def test_nyu_scene_class_labels(tmp_path):
    from gedepth_tpu.data.extra_datasets import NYUDataset
    root = tmp_path
    (root / "kitchen_0001").mkdir()
    (root / "bedroom_0002").mkdir()
    from PIL import Image
    for d in ("kitchen_0001", "bedroom_0002"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            root / d / "rgb.jpg")
        Image.fromarray(np.zeros((8, 8), np.uint16)).save(
            root / d / "depth.png")
    split = root / "split.txt"
    split.write_text("kitchen_0001/rgb.jpg kitchen_0001/depth.png 518\n"
                     "bedroom_0002/rgb.jpg bedroom_0002/depth.png 518\n")
    ds = NYUDataset(str(root), str(split), scene_classes=True)
    labels = {ds[i]["filename"].split("/")[0].split("_")[0]:
              int(ds[i]["scene_class"]) for i in range(len(ds))}
    assert sorted(labels) == ["bedroom", "kitchen"]
    assert sorted(labels.values()) == [0, 1]
