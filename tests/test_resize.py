"""Resize op parity vs torch.nn.functional.interpolate (CPU torch is the
ground truth for the reference's in-model resizes)."""
import numpy as np
import pytest

import torch
import torch.nn.functional as F

from gedepth_tpu.ops import resize_bilinear, resize_nearest


def _torch_resize(x_nhwc, size, mode, align_corners=None):
    t = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    kwargs = {} if mode == "nearest" else {"align_corners": align_corners}
    out = F.interpolate(t, size=size, mode=mode, **kwargs)
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((11, 38), (352, 1216)),   # upsample (neck mask -> input size)
    ((44, 152), (22, 76)),     # downsample by 2
    ((10, 10), (7, 13)),       # non-integer ratio
    ((5, 5), (5, 5)),          # identity
    ((1, 4), (3, 8)),          # degenerate dim
])
def test_bilinear_matches_torch(rng, align_corners, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    want = _torch_resize(x, out_hw, "bilinear", align_corners)
    got = np.asarray(resize_bilinear(x, out_hw, align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((10, 10), (25, 17)),
    ((30, 40), (9, 9)),
])
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, *in_hw, 2), dtype=np.float32)
    want = _torch_resize(x, out_hw, "nearest")
    got = np.asarray(resize_nearest(x, out_hw))
    np.testing.assert_allclose(got, want)


def test_hwc_rank3_supported(rng):
    x = rng.standard_normal((6, 8, 4), dtype=np.float32)
    out = np.asarray(resize_bilinear(x, (12, 16)))
    assert out.shape == (12, 16, 4)
