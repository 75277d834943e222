"""Model-zoo launchability: every zoo preset trains + evals through the
real tools/train.py CLI on synthetic data (VERDICT round-1 item 3: a zoo
model only counts as implemented if it is reachable from the CLI, like the
reference's configs/_base_/models/*.py are via its tools/train.py)."""
import json
import os
import os.path as osp
import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))

# tiny-size overrides per arch so CPU compile stays in seconds
_SHRINK = {
    "adabins_nyu": ["model.head_channels=16", "model.n_bins=16",
                    "model.backbone_variant=b0"],
    "bts_kitti": ["model.head_channels=8", "model.backbone_variant=18"],
    "dpt_kitti": ["model.head_channels=16", "model.backbone_embed_dims=32",
                  "model.backbone_depth=4"],
    "binsformer_nyu": ["model.head_channels=32", "model.n_bins=8",
                       "model.backbone_embed_dims=24"],
    "densedepth_kitti": ["model.head_channels=8",
                         "model.backbone_variant=18"],
    "ocrnet_hr18_kitti": ["model.head_channels=8"],
}


@pytest.mark.parametrize("preset", sorted(_SHRINK))
def test_zoo_preset_trains_and_evals_via_cli(preset, tmp_path, monkeypatch):
    import importlib
    train_cli = importlib.import_module("train")
    work = tmp_path / preset
    argv = [
        "train.py", preset,
        "--work-dir", str(work),
        "--max-iters", "2",
        "--eval-max-images", "2",
        "--options",
        "data.dataset=synthetic", "data.synthetic_size=2",
        "data.crop_size=(64,128)", "data.eval_size=(64,128)",
        "train.global_batch=1", "train.eval_interval=2",
        "train.checkpoint_interval=2", "train.log_interval=1",
        "optim.warmup_iters=1",
        *_SHRINK[preset],
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train_cli.main()

    log = work / "train.log.jsonl"
    assert log.exists(), "training produced no JSONL log"
    records = [json.loads(l) for l in log.read_text().splitlines()]
    losses = [r["loss"] for r in records if "loss" in r]
    evals = [r for r in records if "abs_rel" in r or "miou" in r]
    assert losses, "no train loss logged"
    assert all(float(l) == float(l) for l in losses), "NaN loss"
    assert evals, "no eval metrics logged"
