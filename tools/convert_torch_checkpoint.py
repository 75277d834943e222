#!/usr/bin/env python
"""Convert a released PyTorch GEDepth/DepthFormer checkpoint (or an official
Swin ImageNet checkpoint) to a weights-only npz loadable by tools/test.py.

Usage:
  python tools/convert_torch_checkpoint.py <ckpt.pth> <config-name> <out.npz>
      [--official-swin] [--options ...]

--official-swin: input uses official Swin naming (backbone-only overlay;
the rest of the model keeps fresh init).
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("config")
    parser.add_argument("out")
    parser.add_argument("--official-swin", action="store_true")
    parser.add_argument("--binsformer-release", action="store_true",
                        help="apply the released-BinsFormer key fixup "
                             "(reference tools/model_converters/binsformer.py)")
    parser.add_argument("--simipu", action="store_true",
                        help="extract the img_backbone from a SimIPU "
                             "pretraining checkpoint (reference "
                             "tools/model_converters/SimIPU.py)")
    parser.add_argument("--options", nargs="*", default=None)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from gedepth_tpu.configs import get_config
    from gedepth_tpu.convert import (
        load_torch_checkpoint, convert_state_dict, swin_official_to_gedepth,
        binsformer_release_remap, simipu_backbone_extract)
    from gedepth_tpu.convert.torch_to_jax import (
        pad_patch_embed_for_pe, _merge_into)
    from gedepth_tpu.train.checkpoint import save_params_only
    from tools.train import apply_options

    cfg = get_config(args.config)
    cfg = apply_options(cfg, args.options)
    model = cfg.model.build()
    use_pe = cfg.model.pe_variant != "none"
    c = 5 if use_pe else 3
    h, w = cfg.data.eval_size
    img0 = jnp.zeros((1, h, w, c), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0,
                           jnp.ones((1,), jnp.float32))

    sd = load_torch_checkpoint(args.checkpoint)
    if args.binsformer_release:
        sd = binsformer_release_remap(sd)
    if args.simipu:
        sd = simipu_backbone_extract(sd)
    if args.official_swin:
        sd = {f"backbone.{k}": v
              for k, v in swin_official_to_gedepth(sd).items()}
    converted_params, converted_stats, unmapped = convert_state_dict(sd)
    if use_pe and "backbone" in converted_params:
        try:
            pad_patch_embed_for_pe(converted_params)
        except KeyError:
            pass
    if "backbone" in converted_params and "backbone" in variables["params"]:
        # match the model's Swin param layout (per-block vs scanned pairs)
        from gedepth_tpu.models.swin import adapt_swin_layout
        from gedepth_tpu.convert.torch_to_jax import resize_swin_pos_tables
        converted_params["backbone"] = adapt_swin_layout(
            converted_params["backbone"], variables["params"]["backbone"])
        # window-size adaptation: rel-pos-bias tables bicubically resized,
        # absolute_pos_embed re-gridded (reference depthformer_swin.py:
        # 1078-1111) — lets an official window-12/384 checkpoint load into
        # the window-7 model
        resize_swin_pos_tables(converted_params["backbone"],
                               variables["params"]["backbone"])

    params, missing_p = _merge_into(variables["params"], converted_params)
    stats, missing_s = _merge_into(variables.get("batch_stats", {}),
                                   converted_stats)
    if unmapped:
        print(f"[warn] {len(unmapped)} torch keys had no mapping, e.g. "
              f"{unmapped[:5]}")
    if missing_p:
        print(f"[warn] {len(missing_p)} model params kept fresh init, e.g. "
              f"{missing_p[:5]}")
    save_params_only(args.out, params, stats)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
