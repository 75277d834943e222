"""Torch cross-checks for the full-parity ASN head (models/asn.py).

Oracles re-implement the reference semantics with torch ops
(asn_depth_head.py AdaptiveDepth2normal / pac.py packernel2d gaussian /
SegHead) with the triangle table injected, so the comparison isolates the
deterministic math from the reference's global-RNG triangle draw.
"""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from gedepth_tpu.models.asn import (  # noqa: E402
    ASNDepthHeadV2, ASNSegHead, adaptive_depth_to_normals, asn_guide_weight,
    asn_losses, pa_gaussian_kernel, select_triangles, unfold_patches)


def _torch_unfold(x_nchw, k, pad):
    B, C, H, W = x_nchw.shape
    cols = torch.nn.Unfold(kernel_size=(k, k), padding=pad)(x_nchw)
    return cols.view(B, C, k * k, H, W).permute(0, 3, 4, 2, 1)  # B,H,W,kk,C


def _torch_adaptive_normals(depth, K, triplets, areas, guide=None,
                            k_size=3, depth_max=10.0, if_area=True,
                            if_pa=True):
    """Reference AdaptiveDepth2normal.forward with injected triangles."""
    B, H, W = depth.shape
    pad = (k_size - 1) // 2
    K_inv = torch.inverse(K)
    j = torch.arange(W, dtype=depth.dtype).view(1, 1, W).expand(1, H, W)
    i = torch.arange(H, dtype=depth.dtype).view(1, H, 1).expand(1, H, W)
    pix = torch.stack([j, i, torch.ones(1, H, W)], dim=1)  # 1,3,H,W
    pts = K_inv.bmm(pix.expand(B, 3, H, W).reshape(B, 3, -1)).view(
        B, 3, H, W) * depth.unsqueeze(1)

    patches = _torch_unfold(pts, k_size, pad)               # B,H,W,kk,3
    tri_idx = torch.from_numpy(triplets.astype(np.int64)).view(-1)
    tri = torch.index_select(patches, 3, tri_idx).view(B, H, W, -1, 3, 3)
    v01 = tri[..., 1, :] - tri[..., 0, :]
    v02 = tri[..., 2, :] - tri[..., 0, :]
    normals = torch.cross(v01, v02, dim=-1)
    normals = normals / (torch.norm(normals, dim=-1, keepdim=True) + 1e-5)

    valid = ((depth > 0) & (depth < depth_max)).to(depth.dtype)
    vp = _torch_unfold(valid.unsqueeze(1), k_size, pad)[..., 0]
    vt = torch.index_select(vp, 3, tri_idx).view(B, H, W, -1, 3)
    w = vt[..., 0] * vt[..., 1] * vt[..., 2]
    if if_area:
        w = w * torch.from_numpy(areas).to(depth.dtype).view(1, 1, 1, -1)
    if if_pa:
        g = guide if guide is not None else torch.ones(
            B, H, W, k_size * k_size, dtype=depth.dtype)
        gt3 = torch.index_select(g, 3, tri_idx).view(B, H, W, -1, 3)
        w = w * gt3[..., 0] * gt3[..., 1] * gt3[..., 2]
    w = torch.softmax(w, dim=-1)
    n = torch.sum(normals * w.unsqueeze(-1), dim=3)
    n = n / (torch.norm(n, dim=-1, keepdim=True) + 1e-5)
    return n * (valid > 0).unsqueeze(-1)


def _torch_pa_gaussian(guide_nchw, k_size=3, dilation=1):
    """packernel2d gaussian, channel_wise=False, normalize_kernel=True."""
    B, C, H, W = guide_nchw.shape
    pad = dilation * (k_size - 1) // 2
    cols = torch.nn.Unfold((k_size, k_size), dilation=dilation,
                           padding=pad)(guide_nchw)
    x = cols.view(B, C, k_size * k_size, H, W)
    center = x[:, :, k_size * k_size // 2:k_size * k_size // 2 + 1]
    x = (x - center) ** 2
    x = torch.exp(-0.5 * torch.sum(x, dim=1, keepdim=True))
    ones = torch.nn.Unfold((k_size, k_size), dilation=dilation, padding=pad)(
        torch.ones(1, 1, H, W)).view(1, 1, k_size * k_size, H, W)
    x = x * ones
    norm = x.sum(dim=2, keepdim=True)
    x = x / (norm + (norm == 0).to(x.dtype))
    return x[:, 0].permute(0, 2, 3, 1)  # B,H,W,kk


def test_select_triangles_properties():
    tri, areas = select_triangles(3, 40, np.random.default_rng(0))
    assert tri.shape[1] == 3 and len(areas) == len(tri) > 0
    assert (tri >= 0).all() and (tri < 9).all()
    np.testing.assert_allclose(areas.sum(), 1.0, rtol=1e-5)
    # every kept triangle is positively oriented with non-zero area
    x, y = tri % 3, tri // 3
    signed = ((x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
              - (y[:, 1] - y[:, 0]) * (x[:, 2] - x[:, 0]))
    assert (signed > 0).all()


def test_unfold_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    for k, d in ((3, 1), (5, 1), (3, 2)):
        ours = np.asarray(unfold_patches(jnp.asarray(x), k, d))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        pad = d * (k - 1) // 2
        ref = torch.nn.Unfold((k, k), dilation=d, padding=pad)(xt)
        ref = ref.view(2, 4, k * k, 7, 9).permute(0, 3, 4, 2, 1)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6, atol=1e-6)


def test_pa_gaussian_kernel_matches_torch():
    rng = np.random.default_rng(2)
    g = rng.standard_normal((2, 8, 10, 3)).astype(np.float32) * 0.5
    for k, d in ((3, 1), (5, 1)):
        ours = np.asarray(pa_gaussian_kernel(jnp.asarray(g), k, d))
        ref = _torch_pa_gaussian(
            torch.from_numpy(g).permute(0, 3, 1, 2), k, d).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_adaptive_normals_match_torch():
    rng = np.random.default_rng(3)
    B, H, W, k = 2, 10, 12, 3
    depth = (rng.uniform(0.5, 8.0, (B, H, W))).astype(np.float32)
    depth[0, :2, :3] = 0.0      # invalid holes
    depth[1, 5, 5] = 50.0       # > depth_max
    K = np.array([[[60.0, 0, 6.0], [0, 60.0, 5.0], [0, 0, 1.0]]] * B,
                 dtype=np.float32)
    tri, areas = select_triangles(k, 40, np.random.default_rng(7))
    guide = rng.uniform(0.2, 2.0, (B, H, W, k * k)).astype(np.float32)

    for if_area, if_pa, g in ((True, True, guide), (True, False, None),
                              (False, True, None)):
        ours = np.asarray(adaptive_depth_to_normals(
            jnp.asarray(depth), jnp.asarray(K), tri, areas,
            None if g is None else jnp.asarray(g), k_size=k,
            if_area=if_area, if_pa=if_pa))
        ref = _torch_adaptive_normals(
            torch.from_numpy(depth), torch.from_numpy(K), tri, areas,
            None if g is None else torch.from_numpy(g), k_size=k,
            if_area=if_area, if_pa=if_pa).numpy()
        # interior: bit-level f32 parity. The 1-px border involves
        # zero-padded triangle taps whose normals nearly cancel in the
        # weighted sum; the final unit-normalisation amplifies f32
        # rounding there (measured interior max diff 4.5e-7 vs border
        # 5e-3) — semantics identical, so the border gets a loose atol.
        np.testing.assert_allclose(ours[:, 1:-1, 1:-1],
                                   ref[:, 1:-1, 1:-1], atol=1e-5)
        np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_adaptive_normals_flat_plane_points_up():
    """A fronto-parallel wall has normals along -z (toward the camera) —
    geometric sanity independent of the oracle."""
    B, H, W = 1, 12, 12
    depth = np.full((B, H, W), 3.0, np.float32)
    K = np.array([[[50.0, 0, 6.0], [0, 50.0, 6.0], [0, 0, 1.0]]],
                 dtype=np.float32)
    tri, areas = select_triangles(3, 40, np.random.default_rng(0))
    n = np.asarray(adaptive_depth_to_normals(
        jnp.asarray(depth), jnp.asarray(K), tri, areas, depth_max=10.0))
    inner = n[:, 3:-3, 3:-3]
    assert np.abs(inner[..., 2]).min() > 0.99
    assert np.abs(inner[..., :2]).max() < 0.1


def test_asn_seg_head_matches_torch():
    """ASNSegHead trunk vs a torch oracle with copied weights."""
    import jax

    rng = np.random.default_rng(4)
    B, H, W, C = 1, 8, 10, 16
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    head = ASNSegHead(mid_channels=C, scale_factor=4.0)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p, bs = variables["params"], variables["batch_stats"]

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        for i in range(3):
            wk = torch.from_numpy(
                np.asarray(p[f"fuse{i}"]["kernel"])).permute(3, 2, 0, 1)
            xt = F.conv2d(xt, wk, padding=1)
            xt = F.batch_norm(
                xt, torch.from_numpy(np.asarray(bs[f"bn{i}"]["mean"])),
                torch.from_numpy(np.asarray(bs[f"bn{i}"]["var"])),
                torch.from_numpy(np.asarray(p[f"bn{i}"]["scale"])),
                torch.from_numpy(np.asarray(p[f"bn{i}"]["bias"])),
                training=False, eps=1e-5)
            xt = F.relu(xt)
        wc = torch.from_numpy(
            np.asarray(p["cls_disparity"]["kernel"])).permute(3, 2, 0, 1)
        bc = torch.from_numpy(np.asarray(p["cls_disparity"]["bias"]))
        xt = torch.sigmoid(F.conv2d(xt, wc, bias=bc))
        ref = F.interpolate(xt, scale_factor=4.0, mode="bilinear",
                            align_corners=True)

    ours = np.asarray(head.apply(variables, jnp.asarray(x))["disparity"])
    np.testing.assert_allclose(
        ours, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)


def test_asn_head_end_to_end_and_losses():
    import jax

    rng = np.random.default_rng(5)
    B, H, W, C = 1, 8, 8, 32
    feats = rng.standard_normal((B, H, W, C)).astype(np.float32)
    K = np.array([[[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]]],
                 dtype=np.float32)
    head = ASNDepthHeadV2(input_features_dim=C, scale_factor=8.0)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                          jnp.asarray(K))
    out = head.apply(variables, jnp.asarray(feats), jnp.asarray(K))
    oh, ow = H * 8, W * 8
    assert out["disp"].shape == (B, oh, ow, 1)
    assert out["depth"].shape == (B, oh, ow, 1)
    assert out["normals"].shape == (B, oh, ow, 3)
    d = np.asarray(out["depth"])
    assert (d >= head.min_depth - 1e-5).all() and \
           (d <= head.max_depth + 1e-5).all()
    norms = np.linalg.norm(np.asarray(out["normals"]), axis=-1)
    assert (norms < 1.0 + 1e-4).all()

    # eval path: no intrinsics -> no normals (reference simple_test)
    out_eval = head.apply(variables, jnp.asarray(feats))
    assert "normals" not in out_eval

    depth_gt = rng.uniform(0.0, 9.0, (B, oh, ow)).astype(np.float32)
    rgb = rng.standard_normal((B, oh, ow, 3)).astype(np.float32)
    sn = rng.standard_normal((B, oh, ow, 3)).astype(np.float32)
    losses = asn_losses(out, jnp.asarray(depth_gt), jnp.asarray(rgb),
                        jnp.asarray(sn))
    assert set(losses) == {"supvised_loss", "smooth_loss",
                           "surface_norm_loss"}
    for v in losses.values():
        assert np.isfinite(float(v))


def test_asn_guide_weight_normalisation():
    rng = np.random.default_rng(6)
    g = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    gw = np.asarray(asn_guide_weight(jnp.asarray(g), 3))
    # smoothed kernel sums to k*k per pixel (reference scaling)
    np.testing.assert_allclose(gw.sum(-1), 9.0, rtol=1e-5)
    assert (gw > 0).all()
