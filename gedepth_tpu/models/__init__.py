from gedepth_tpu.models.depther import GEDepth
from gedepth_tpu.models.swin import DepthFormerSwin
from gedepth_tpu.models.hahi import HAHINeck, MSDeformAttention
from gedepth_tpu.models.necks import LightPEMaskNeck, DynamicPENeckSoft
from gedepth_tpu.models.heads import DenseDepthHead
from gedepth_tpu.models.losses import sigloss, softmax_ce_ignore, binary_ce
