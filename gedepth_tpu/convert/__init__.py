from gedepth_tpu.convert.torch_to_jax import (
    convert_state_dict, load_torch_checkpoint, convert_checkpoint_file,
    swin_official_to_gedepth, binsformer_release_remap,
    simipu_backbone_extract,
)
from gedepth_tpu.convert.vit_official import convert_vit_official

