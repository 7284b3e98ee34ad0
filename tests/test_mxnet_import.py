"""MXNet .params import: binary format, layout semantics, full-model map.

Oracles re-state MXNet numerics independently (NCHW scalar/loop style):
  * Convolution with symmetric pad (sym_common.py conv)
  * Deconvolution = conv gradient, scatter out[s*i+k] += in[i]*w[k]
  * BatchNorm use_global_stats (x-mean)/sqrt(var+eps)*gamma+beta
The full-model test exports a random flax tree to the reference format and
re-imports it (export/import are independent path mappings, so a bug in
either breaks equality), and spot-checks the generated MXNet names against
the reference's symbol names (resnet.py / resnet_v1_101_flownet_rfcn.py).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lsfa_tpu.utils.mxnet_io import load_params, save_params, split_arg_aux  # noqa: E402
from lsfa_tpu.train.import_mxnet import (  # noqa: E402
    export_mxnet_lsfa, flax_to_mx_name, import_mxnet_lsfa)


# ---------------------------------------------------------------- format

def test_params_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    named = {
        "arg:conv0_weight": rng.standard_normal((8, 3, 7, 7)).astype(np.float32),
        "arg:bn0_gamma": rng.standard_normal(8).astype(np.float32),
        "aux:bn0_moving_mean": rng.standard_normal(8).astype(np.float32),
        "arg:scalar": np.float32(3.5).reshape(()),
        "arg:int64s": np.arange(5, dtype=np.int64),
    }
    p = str(tmp_path / "t-0000.params")
    save_params(p, named)
    back = load_params(p)
    assert set(back) == set(named)
    for k in named:
        assert back[k].dtype == named[k].dtype
        np.testing.assert_array_equal(back[k], named[k])
    arg, aux = split_arg_aux(back)
    assert "conv0_weight" in arg and "bn0_moving_mean" in aux


def test_params_legacy_format(tmp_path):
    """Files from old MXNet lack the per-array magic: u32 ndim + u32 dims."""
    import struct
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    out = struct.pack("<QQ", 0x112, 0)
    out += struct.pack("<Q", 1)
    out += struct.pack("<I", 3) + struct.pack("<III", 2, 3, 4)
    out += struct.pack("<ii", 1, 0) + struct.pack("<i", 0)
    out += arr.tobytes()
    out += struct.pack("<Q", 1)
    name = b"arg:legacy"
    out += struct.pack("<Q", len(name)) + name
    p = tmp_path / "legacy.params"
    p.write_bytes(out)
    back = load_params(str(p))
    np.testing.assert_array_equal(back["arg:legacy"], arr)


# ------------------------------------------------------- layout semantics

def _mx_conv2d(x, w, b, stride, pad, dilate=1):
    """MXNet Convolution oracle. x (C,H,W), w (O,I,kh,kw) -> (O,H',W')."""
    c, h, wd = x.shape
    o, i, kh, kw = w.shape
    assert i == c
    xp = np.zeros((c, h + 2 * pad, wd + 2 * pad), x.dtype)
    xp[:, pad:pad + h, pad:pad + wd] = x
    ekh, ekw = (kh - 1) * dilate + 1, (kw - 1) * dilate + 1
    oh = (h + 2 * pad - ekh) // stride + 1
    ow = (wd + 2 * pad - ekw) // stride + 1
    out = np.zeros((o, oh, ow), np.float64)
    for a in range(kh):
        for bb in range(kw):
            patch = xp[:, a * dilate:a * dilate + oh * stride:stride,
                       bb * dilate:bb * dilate + ow * stride:stride]
            out += np.einsum("oi,ihw->ohw", w[:, :, a, bb], patch)
    return out + b[:, None, None]


def _mx_deconv2d(x, w, b, stride, pad):
    """MXNet Deconvolution oracle: out[s*i+k-p] += in[i]*w[k].
    x (I,H,W), w (I,O,kh,kw)."""
    c, h, wd = x.shape
    i, o, kh, kw = w.shape
    assert i == c
    fh, fw = (h - 1) * stride + kh, (wd - 1) * stride + kw
    full = np.zeros((o, fh, fw), np.float64)
    for y in range(h):
        for xx in range(wd):
            full[:, y * stride:y * stride + kh, xx * stride:xx * stride + kw] \
                += np.einsum("i,iokl->okl", x[:, y, xx], w)
    out = full[:, pad:fh - pad, pad:fw - pad]
    return out + b[:, None, None]


def test_conv_import_matches_mxnet_even_input_stride2():
    """The stem conv (7x7/s2, pad 3) on an EVEN input — the case where XLA
    'SAME' would mis-align by one pixel vs MXNet's symmetric pad."""
    from lsfa_tpu.models.layers import conv as flax_conv
    from flax import linen as nn

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 16, 20)).astype(np.float32)   # C,H,W (even)
    w_mx = rng.standard_normal((8, 3, 7, 7)).astype(np.float32)
    b_mx = rng.standard_normal(8).astype(np.float32)
    ref = _mx_conv2d(x, w_mx, b_mx, stride=2, pad=3)

    class M(nn.Module):
        @nn.compact
        def __call__(self, h):
            return flax_conv(h, 8, kernel=7, stride=2, name="c")
    m = M()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 20, 3)))
    v = {"params": {"c": {"kernel": jnp.asarray(w_mx.transpose(2, 3, 1, 0)),
                          "bias": jnp.asarray(b_mx)}}}
    got = np.asarray(m.apply(v, x.transpose(1, 2, 0)[None]))[0].transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dilated_conv_import_matches_mxnet():
    """feat_conv_3x3: 3x3 dilate 6 pad 6 (resnet_v1_101_flownet_rfcn.py:52-55)."""
    from lsfa_tpu.models.layers import conv as flax_conv
    from flax import linen as nn

    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 18, 18)).astype(np.float32)
    w_mx = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
    b_mx = rng.standard_normal(6).astype(np.float32)
    ref = _mx_conv2d(x, w_mx, b_mx, stride=1, pad=6, dilate=6)

    class M(nn.Module):
        @nn.compact
        def __call__(self, h):
            return flax_conv(h, 6, kernel=3, dilate=6, name="c")
    m = M()
    v = {"params": {"c": {"kernel": jnp.asarray(w_mx.transpose(2, 3, 1, 0)),
                          "bias": jnp.asarray(b_mx)}}}
    got = np.asarray(m.apply(v, x.transpose(1, 2, 0)[None]))[0].transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_deconv_import_matches_mxnet():
    """FlowNet refinement deconv: MXNet Deconvolution(k4, s2, pad 0) +
    Crop(offset=(1,1)) vs our deconv_x2 with the flipped-transposed kernel
    (the _to_flax 'deconv' rule)."""
    from lsfa_tpu.models.layers import deconv_x2
    from lsfa_tpu.train.import_mxnet import _to_flax
    from flax import linen as nn

    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 6, 7)).astype(np.float32)     # I,H,W
    w_mx = rng.standard_normal((5, 4, 4, 4)).astype(np.float32)  # I,O,kh,kw
    b_mx = rng.standard_normal(4).astype(np.float32)
    full = _mx_deconv2d(x, w_mx, b_mx, stride=2, pad=0)       # (4, 14, 16)
    ref = full[:, 1:1 + 12, 1:1 + 14]                         # Crop offset(1,1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, h):
            return deconv_x2(h, 4, name="d")
    m = M()
    w_flax = _to_flax(w_mx, "deconv", (4, 4, 5, 4))
    v = {"params": {"d": {"kernel": jnp.asarray(w_flax),
                          "bias": jnp.asarray(b_mx)}}}
    got = np.asarray(m.apply(v, x.transpose(1, 2, 0)[None]))[0].transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_bn_import_matches_mxnet():
    from lsfa_tpu.models.layers import BatchNorm
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32)
    var = rng.random(8).astype(np.float32) + 0.5
    ref = (x - mean) / np.sqrt(var + 2e-5) * gamma + beta
    m = BatchNorm(frozen=True)
    v = {"params": {"BatchNorm_0": {"scale": jnp.asarray(gamma),
                                    "bias": jnp.asarray(beta)}},
         "batch_stats": {"BatchNorm_0": {"mean": jnp.asarray(mean),
                                         "var": jnp.asarray(var)}}}
    got = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


# ----------------------------------------------------------- name mapping

def test_name_map_spot_checks():
    cases = {
        ("backbone", "conv0", "kernel"): ("conv0_weight", "conv"),
        ("backbone", "bn_data", "bias"): ("bn_data_beta", "direct"),
        ("backbone", "stage3_unit21", "bn2", "BatchNorm_0", "scale"):
            ("stage3_unit21_bn2_gamma", "direct"),
        ("backbone", "stage2_unit4", "conv2", "offset", "bias"):
            ("stage2_unit4_conv2_offset_bias", "direct"),
        ("backbone", "stage4_unit1", "sc", "kernel"):
            ("stage4_unit1_sc_weight", "conv"),
        ("small_net_backbone", "stage1_unit2", "conv1", "kernel"):
            ("small_net_stage1_unit2_conv1_weight", "conv"),
        ("flownet", "conv1", "kernel"): ("flow_conv1_weight", "conv"),
        ("flownet", "conv3_1", "bias"): ("conv3_1_bias", "direct"),
        ("flownet", "flow6", "kernel"): ("Convolution1_weight", "conv"),
        ("flownet", "flow_final", "kernel"): ("Convolution5_weight", "conv"),
        ("flownet", "scale_map", "bias"): ("Convolution5_scale_bias", "direct"),
        ("flownet", "deconv4", "kernel"): ("deconv4_weight", "deconv"),
        ("flownet", "upflow5", "kernel"):
            ("upsample_flow6to5_weight", "deconv"),
        ("nq_net", "conv2", "kernel"): ("Nq_conv2_weight", "conv"),
        ("rnet", "conv0", "kernel"): ("rnet_conv0_weight", "conv"),
        ("rnet", "bn", "BatchNorm_0", "scale"): ("res_diff_bn_gamma", "direct"),
        ("fnet", "conv1", "kernel"): ("fnet_conv1_weight", "conv"),
        ("fgfa_net", "em_conv3", "kernel"): ("em_conv3_weight", "conv"),
        ("small_fuse", "fuse_reduce_add", "kernel"):
            ("fuse_reduce_add_weight", "conv"),
        ("small_fuse", "cur_feat_bn", "BatchNorm_0", "mean"):
            ("cur_feat_bn_moving_mean", "direct"),
        ("fuse_downsample", "kernel"): ("fuse_downsample_weight", "conv"),
        ("feat_conv_3x3", "kernel"): ("feat_conv_3x3_weight", "conv"),
        ("rpn_cls_score", "bias"): ("rpn_cls_score_bias", "direct"),
        ("rfcn_bbox", "kernel"): ("rfcn_bbox_weight", "conv"),
        ("backbone", "bn1", "BatchNorm_0", "var"):
            ("bn1_moving_var", "direct"),
    }
    for path, want in cases.items():
        assert flax_to_mx_name(path) == want, path


# -------------------------------------------------------- full model map

@pytest.fixture(scope="module")
def tiny_lsfa():
    from lsfa_tpu.models.lsfa import LSFA
    m = LSFA(num_layer=18, feat_dim=64, add_dcn=True, dtype=jnp.float32)
    H = W = 64
    v = m.init(jax.random.PRNGKey(0),
               jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
               jnp.zeros((1, H, W, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
               jnp.zeros((1, H // 16, W // 16, 2)),
               jnp.zeros((1, H // 16, W // 16, 3)))
    return m, {"params": v["params"], "batch_stats": v["batch_stats"]}


def test_full_model_export_import_roundtrip(tiny_lsfa, tmp_path):
    _, variables = tiny_lsfa
    p = str(tmp_path / "lsfa-0000.params")
    flat = export_mxnet_lsfa(variables, p)
    # every exported name must be a real MXNet-style flat name
    for k in flat:
        assert k.startswith(("arg:", "aux:")) and "/" not in k

    # scramble: import into a randomized copy of the tree, expect equality
    rng = np.random.default_rng(7)
    scrambled = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape), x.dtype), variables)
    restored, report = import_mxnet_lsfa(
        scrambled, p, strict_modules=("backbone", "flownet", "nq_net",
                                      "small_net_backbone", "small_fuse",
                                      "rnet"))
    assert not report["unused"], report["unused"][:10]
    flat_names = {k.split(":", 1)[1] for k in flat}
    assert "stage1_unit1_conv1_weight" in flat_names
    assert "flow_conv1_weight" in flat_names

    ok = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a, np.float32),
                                 np.asarray(b, np.float32), atol=1e-6),
        variables, restored)
    bad = [p for p, v in jax.tree_util.tree_flatten_with_path(ok)[0] if not v]
    assert not bad, bad[:10]


def test_unbake_rfcn_bbox_test_only(tiny_lsfa):
    """A test-only release ships rfcn_bbox_{weight,bias}_test (baked with
    BBOX_STDS by do_checkpoint); the importer must un-bake them."""
    _, variables = tiny_lsfa
    flat = export_mxnet_lsfa(variables)
    w = flat.pop("arg:rfcn_bbox_weight")
    b = flat.pop("arg:rfcn_bbox_bias")
    means = np.array([0.0, 0.0, 0.0, 0.0], np.float32)
    stds = np.array([0.1, 0.1, 0.2, 0.2], np.float32)
    rep = b.shape[0] // 4
    stds_r = np.repeat(stds[None], rep, 0).reshape(-1)
    means_r = np.repeat(means[None], rep, 0).reshape(-1)
    flat["arg:rfcn_bbox_weight_test"] = w * stds_r[:, None, None, None]
    flat["arg:rfcn_bbox_bias_test"] = b * stds_r + means_r

    restored, _ = import_mxnet_lsfa(variables, flat,
                                    bbox_means=means, bbox_stds=stds)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["rfcn_bbox"]["kernel"]),
        np.asarray(variables["params"]["rfcn_bbox"]["kernel"]),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["rfcn_bbox"]["bias"]),
        np.asarray(variables["params"]["rfcn_bbox"]["bias"]),
        rtol=1e-5, atol=1e-6)


def test_rfcn_export_import_roundtrip(tmp_path):
    """The importer must also cover the single-frame RFCN tree (backbone +
    feat_conv_3x3 + heads, the reference rfcn/ package checkpoints)."""
    from lsfa_tpu.models.rfcn import RFCN

    m = RFCN(num_classes=5, feat_dim=64, num_layer=18, add_dcn=False)
    v = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 96, 3)), False)
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
    flat = export_mxnet_lsfa(variables)
    names = {k.split(":", 1)[1] for k in flat}
    assert {"conv0_weight", "feat_conv_3x3_weight", "rpn_cls_score_weight",
            "rfcn_bbox_bias", "bn1_gamma"} <= names

    rng = np.random.default_rng(11)
    scrambled = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape), x.dtype),
        variables)
    restored, report = import_mxnet_lsfa(scrambled, flat,
                                         strict_modules=("backbone",))
    assert not report["unused"]
    ok = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a, np.float32),
                                 np.asarray(b, np.float32), atol=1e-6),
        variables, restored)
    bad = [p for p, val in jax.tree_util.tree_flatten_with_path(ok)[0]
           if not val]
    assert not bad, bad[:10]
