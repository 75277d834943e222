from gedepth_tpu.data.transforms import (
    KBCrop,
    NYUCrop,
    RandomRatioResize,
    PadToSize,
    RandomRotate,
    RandomFlip,
    RandomCrop,
    ColorAug,
    Normalize,
    DDADResize,
    Compose,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from gedepth_tpu.data.synthetic import SyntheticGroundDataset
from gedepth_tpu.data.kitti import KittiDataset
from gedepth_tpu.data.ddad import DDADDataset
from gedepth_tpu.data.extra_datasets import (
    NYUDataset,
    SUNRGBDDataset,
    CityscapesDataset,
    NuScenesDataset,
    CustomDepthDataset,
)
from gedepth_tpu.data.loader import TrainLoader, EvalLoader
