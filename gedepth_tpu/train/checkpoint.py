"""Orbax checkpointing: save/restore the TrainState pytree + config.

Replaces the reference's mmcv CheckpointHook (keep-2, every 800 iters, plus
best-abs_rel tracking — SURVEY.md §5.4).
"""
from __future__ import annotations

import dataclasses
import json
import os
import os.path as osp
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 2) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        osp.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


class CheckpointKeeper:
    """Persistent async checkpointer for the training loop.

    One orbax CheckpointManager for the whole run; `save` returns as soon
    as the on-device state is snapshotted and the write proceeds in the
    background (training continues during I/O — orbax's async path). The
    previous write is awaited before the next one starts, and `close()`
    drains everything. The one-shot `save_checkpoint` below re-opens a
    manager per call and blocks; keep it for scripts/tests."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 2):
        self._mgr = _manager(ckpt_dir, max_to_keep)

    def save(self, state, step: int, metrics: Optional[dict] = None):
        payload = {"params": state.params, "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "step": state.step}
        self._mgr.save(step, args=ocp.args.StandardSave(payload),
                       metrics=metrics or {})

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_checkpoint(ckpt_dir: str, state, step: int, max_to_keep: int = 2,
                    metrics: Optional[dict] = None):
    keeper = CheckpointKeeper(ckpt_dir, max_to_keep)
    keeper.save(state, step, metrics)
    keeper.close()


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore into the structure of `state` (shapes/dtypes must match)."""
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def save_params_only(path: str, params, batch_stats=None):
    """Weights-only save (numpy npz of flattened pytree) for eval/release."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "params/" + "/".join(getattr(p, "key", str(p)) for p in kp)
        flat[key] = np.asarray(leaf)
    if batch_stats:
        for kp, leaf in jax.tree_util.tree_flatten_with_path(batch_stats)[0]:
            key = "batch_stats/" + "/".join(
                getattr(p, "key", str(p)) for p in kp)
            flat[key] = np.asarray(leaf)
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def _unflatten_npz(data, prefix: str) -> dict:
    tree: dict = {}
    for key in data.files:
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def load_params_only(path: str, params_template, batch_stats_template=None):
    """Load a save_params_only npz back into pytrees shaped like templates.

    The Swin backbone's param layout (per-block `stage{i}_block{d}` vs the
    scanned `stage{i}_pairs` stacks — ModelConfig.swin_scan) is adapted
    automatically: a checkpoint written under either layout loads into a
    model built with the other (mirrors the reference's ability to load the
    same state dict regardless of runtime wrapping)."""
    from gedepth_tpu.models.swin import adapt_swin_layout

    data = np.load(path)

    def fill(template, prefix):
        src = _unflatten_npz(data, prefix)
        if (isinstance(src.get("backbone"), dict)
                and isinstance(template, dict)
                and isinstance(template.get("backbone"), dict)):
            src = dict(src)
            src["backbone"] = adapt_swin_layout(src["backbone"],
                                                template["backbone"])

        def get(kp, leaf):
            node = src
            for p in kp:
                key = getattr(p, "key", str(p))
                if not isinstance(node, dict) or key not in node:
                    raise KeyError(
                        f"{path}: missing "
                        f"{prefix + '/'.join(getattr(q, 'key', str(q)) for q in kp)}")
                node = node[key]
            assert node.shape == leaf.shape, (kp, node.shape, leaf.shape)
            return jax.numpy.asarray(node, leaf.dtype)
        return jax.tree_util.tree_map_with_path(get, template)

    params = fill(params_template, "params/")
    stats = None
    if batch_stats_template is not None:
        stats = fill(batch_stats_template, "batch_stats/")
    return params, stats
