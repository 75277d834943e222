from gedepth_tpu.models.depther import GEDepth
from gedepth_tpu.models.swin import DepthFormerSwin
from gedepth_tpu.models.hahi import HAHINeck, MSDeformAttention
from gedepth_tpu.models.necks import LightPEMaskNeck, DynamicPENeckSoft
from gedepth_tpu.models.heads import DenseDepthHead
from gedepth_tpu.models.losses import sigloss, softmax_ce_ignore, binary_ce
from gedepth_tpu.models.resnet import ResNet
from gedepth_tpu.models.hrnet import HRNet
from gedepth_tpu.models.vit import VisionTransformer
from gedepth_tpu.models.efficientnet import EfficientNet
from gedepth_tpu.models.ddrnet import DualResNet
from gedepth_tpu.models.adabins import AdabinsHead
from gedepth_tpu.models.bts import BTSHead
from gedepth_tpu.models.dpt import DPTHead
from gedepth_tpu.models.binsformer import BinsFormerHead
from gedepth_tpu.models.pretrain import GroundMaskPretrain
from gedepth_tpu.models.segmentation import (
    FCNHead, OCRHead, EncoderDecoderSeg, CascadeEncoderDecoderSeg)
from gedepth_tpu.models.rmi_loss import rmi_loss
from gedepth_tpu.models.experiment_heads import (
    GuidanceHead, PacConv, pixel_adaptive_conv, depth_to_normals,
    ASNDepthHead)
from gedepth_tpu.models.asn import (
    ASNDepthHeadV2, ASNSegHead, adaptive_depth_to_normals,
    depth_normal_conversion, pa_gaussian_kernel, select_triangles,
    asn_losses)
from gedepth_tpu.models.necks_extra import (
    PEMaskNeck, DynamicPEMaskNeck, LightDynamicPEMaskNeck,
    DynamicPENeckGlobal, SkipNeck,
    DynamicPENeckStem, DynamicAttnPENeck, DynamicPENeckBackbone,
    DynamicPENeckSoft2, DynamicPENeckSoftHRNet, DynamicPENeckSoftDDR,
    DynamicPENeckHeavy,
)
