"""Checkpoint-ingestion position-table interpolation (VERDICT r3 #4).

The reference bicubically resizes `relative_position_bias_table` on window
mismatch and reshapes `absolute_pos_embed`
(depthformer_swin.py:1075-1111). These tests pin our converter pass to
torch's F.interpolate(bicubic) within 1e-5 and check a window-12 official
checkpoint converts end-to-end into a window-7 model."""
import numpy as np
import pytest

from gedepth_tpu.convert.torch_to_jax import (
    bicubic_resize_torch, resize_swin_pos_tables, convert_state_dict,
    _abs_pos_embed)
from gedepth_tpu.convert import swin_official_to_gedepth


def test_bicubic_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for (s1, s2) in [(23, 13), (13, 23), (5, 9), (12, 7)]:
        x = rng.standard_normal((1, 4, s1, s1)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=(s2, s2),
                             mode="bicubic", align_corners=False).numpy()
        got = bicubic_resize_torch(x, (s2, s2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rel_pos_table_resize_window12_to_window7():
    """Reference semantics: table (L1, nH) -> permute to (1, nH, S1, S1) ->
    bicubic -> back (depthformer_swin.py:1099-1111)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    nh = 6
    s1, s2 = 2 * 12 - 1, 2 * 7 - 1
    table12 = rng.standard_normal((s1 * s1, nh)).astype(np.float32)

    t = torch.from_numpy(table12)
    want = F.interpolate(
        t.permute(1, 0).reshape(1, nh, s1, s1), size=(s2, s2),
        mode="bicubic").reshape(nh, s2 * s2).permute(1, 0).numpy()

    converted = {"stage0_block0": {"attn": {
        "relative_position_bias_table": table12}}}
    template = {"stage0_block0": {"attn": {
        "relative_position_bias_table": np.zeros((s2 * s2, nh),
                                                 np.float32)}}}
    resize_swin_pos_tables(converted, template)
    got = converted["stage0_block0"]["attn"]["relative_position_bias_table"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # stacked (scan) layout: leading pair axis rides through
    stacked = {"stage0_pairs": {"block0": {"attn": {
        "relative_position_bias_table": np.stack([table12, table12])}}}}
    tmpl_stacked = {"stage0_pairs": {"block0": {"attn": {
        "relative_position_bias_table": np.zeros((2, s2 * s2, nh),
                                                 np.float32)}}}}
    resize_swin_pos_tables(stacked, tmpl_stacked)
    got2 = stacked["stage0_pairs"]["block0"]["attn"][
        "relative_position_bias_table"]
    assert got2.shape == (2, s2 * s2, nh)
    np.testing.assert_allclose(got2[0], want, rtol=1e-5, atol=1e-5)

    # head-count mismatch: reference warns and skips — table untouched
    bad = {"stage0_block0": {"attn": {
        "relative_position_bias_table": table12.copy()}}}
    tmpl_bad = {"stage0_block0": {"attn": {
        "relative_position_bias_table": np.zeros((s2 * s2, nh + 1),
                                                 np.float32)}}}
    resize_swin_pos_tables(bad, tmpl_bad)
    assert bad["stage0_block0"]["attn"][
        "relative_position_bias_table"].shape == (s1 * s1, nh)


def test_abs_pos_embed_mapping_and_resize():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    # official layout (1, L, C), 8x8 pretrain grid
    v = rng.standard_normal((1, 64, 16)).astype(np.float32)
    grid = _abs_pos_embed(v)
    assert grid.shape == (1, 8, 8, 16)
    np.testing.assert_array_equal(grid.reshape(1, 64, 16), v)

    # model layout (1, C, H, W)
    v4 = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    grid4 = _abs_pos_embed(v4)
    np.testing.assert_array_equal(grid4, np.transpose(v4, (0, 2, 3, 1)))

    # grid mismatch -> bicubic resize to template grid
    converted = {"absolute_pos_embed": grid}
    template = {"absolute_pos_embed": np.zeros((1, 6, 10, 16), np.float32)}
    resize_swin_pos_tables(converted, template)
    got = converted["absolute_pos_embed"]
    want = F.interpolate(
        torch.from_numpy(np.transpose(grid, (0, 3, 1, 2))), size=(6, 10),
        mode="bicubic", align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_official_window12_checkpoint_end_to_end():
    """A synthetic official-format window-12 Swin state dict converts and
    loads into the window-7 flax model: tables land at (13*13, nH)."""
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.models.swin import DepthFormerSwin
    from gedepth_tpu.convert.torch_to_jax import _merge_into

    rng = np.random.default_rng(3)
    embed, heads, w12 = 16, 2, 12
    sd = {}
    # one stage, one block, official naming, window-12 table
    sd["patch_embed.proj.weight"] = rng.standard_normal(
        (embed, 3, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(embed, np.float32)
    sd["patch_embed.norm.weight"] = np.ones(embed, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(embed, np.float32)
    blk = "layers.0.blocks.0."
    sd[blk + "norm1.weight"] = np.ones(embed, np.float32)
    sd[blk + "norm1.bias"] = np.zeros(embed, np.float32)
    sd[blk + "attn.relative_position_bias_table"] = rng.standard_normal(
        ((2 * w12 - 1) ** 2, heads)).astype(np.float32)
    sd[blk + "attn.qkv.weight"] = rng.standard_normal(
        (3 * embed, embed)).astype(np.float32)
    sd[blk + "attn.qkv.bias"] = np.zeros(3 * embed, np.float32)
    sd[blk + "attn.proj.weight"] = rng.standard_normal(
        (embed, embed)).astype(np.float32)
    sd[blk + "attn.proj.bias"] = np.zeros(embed, np.float32)
    sd[blk + "mlp.fc1.weight"] = rng.standard_normal(
        (4 * embed, embed)).astype(np.float32)
    sd[blk + "mlp.fc1.bias"] = np.zeros(4 * embed, np.float32)
    sd[blk + "mlp.fc2.weight"] = rng.standard_normal(
        (embed, 4 * embed)).astype(np.float32)
    sd[blk + "mlp.fc2.bias"] = np.zeros(embed, np.float32)

    ref_sd = {f"backbone.{k}": v
              for k, v in swin_official_to_gedepth(sd).items()}
    params, stats, unmapped = convert_state_dict(ref_sd)
    assert not unmapped, unmapped

    model = DepthFormerSwin(embed_dims=embed, depths=(1,), num_heads=(2,),
                            window=7, use_pe=False, drop_path_rate=0.0)
    img = jnp.asarray(rng.standard_normal((1, 28, 28, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)

    # the bare DepthFormerSwin's param tree IS the backbone subtree
    resize_swin_pos_tables(params["backbone"], variables["params"])
    merged, missing = _merge_into(variables["params"], params["backbone"])
    # everything the synthetic ckpt carries must have landed (the conv stem
    # and norms keep fresh init)
    table = merged["stage0_block0"]["attn"]["relative_position_bias_table"]
    assert np.asarray(table).shape == ((2 * 7 - 1) ** 2, heads)
    outs = model.apply({"params": merged,
                        "batch_stats": variables.get("batch_stats", {})},
                       img)
    assert outs[-1].shape == (1, 7, 7, embed)
