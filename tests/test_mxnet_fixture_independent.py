"""Independent (non-self-referential) importer validation.

Round-2 verdict: the full-model round-trip test shares flax_to_mx_name
between export and import, so a systematic misreading of reference
names/layouts would cancel out. This fixture closes that hole: the
checkpoint side is built ENTIRELY by hand — literal MXNet parameter
names exactly as the reference's symbol builders emit them
(dff_rfcn/symbols/resnet.py `conv0/bn0/bn_data`,
resnet_v1_101_flownet_rfcn.py:52-55 `feat_conv_3x3`, :150-207 flownet
`upsample_flow3to2`/`Convolution5_scale`), and the expected activations
are computed by a NumPy NCHW re-statement of MXNet's operator semantics
(symmetric pad, Deconvolution scatter + Crop offset (1,1), BN with
use_global_stats eps 2e-5). The repo's name map / layout converters are
exercised only on the IMPORT side; any systematic error there now shows
up as an activation mismatch instead of cancelling.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from lsfa_tpu.models.layers import BatchNorm, conv, deconv_x2
from lsfa_tpu.train.import_mxnet import import_mxnet_lsfa
from lsfa_tpu.utils.mxnet_io import save_params
from tests.test_mxnet_import import _mx_conv2d, _mx_deconv2d

C0, C1, C2, C3 = 6, 8, 4, 5     # stem, feat, deconv, scale-map channels
H, W = 18, 22                    # even input (stride-2 alignment case)


class _Backbone(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = BatchNorm(frozen=True, name="bn_data")(x)
        x = conv(x, C0, kernel=7, stride=2, name="conv0")
        x = BatchNorm(frozen=True, name="bn0")(x)
        return nn.relu(x)


class _FlowPart(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = deconv_x2(x, C2, name="upflow2")
        return conv(x, C3, kernel=1, name="scale_map")


class _FixtureNet(nn.Module):
    """Stem -> dilated feat conv -> deconv -> 1x1, spanning every layout
    conversion (conv OIHW, deconv IOHW+flip, BN, the flownet renames)."""

    @nn.compact
    def __call__(self, x):
        h = _Backbone(name="backbone")(x)
        h = conv(h, C1, kernel=3, dilate=2, name="feat_conv_3x3")
        h = nn.relu(h)
        return _FlowPart(name="flownet")(h)


def _literal_checkpoint(rng):
    """Flat arg:/aux: dict with HAND-WRITTEN reference names and MXNet
    layouts. No repo mapping code touches this."""
    def f32(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    return {
        # bn_data (input BN, resnet.py builder)
        "arg:bn_data_gamma": f32(3),
        "arg:bn_data_beta": f32(3),
        "aux:bn_data_moving_mean": f32(3),
        "aux:bn_data_moving_var": (rng.random(3).astype(np.float32) + 0.5),
        # stem conv (OIHW) + bn0
        "arg:conv0_weight": f32(C0, 3, 7, 7),
        "arg:conv0_bias": f32(C0),
        "arg:bn0_gamma": f32(C0),
        "arg:bn0_beta": f32(C0),
        "aux:bn0_moving_mean": f32(C0),
        "aux:bn0_moving_var": (rng.random(C0).astype(np.float32) + 0.5),
        # shared dilated feature conv (resnet_v1_101_flownet_rfcn.py:52-55)
        "arg:feat_conv_3x3_weight": f32(C1, C0, 3, 3),
        "arg:feat_conv_3x3_bias": f32(C1),
        # flownet refinement deconv — historical name (I,O,kh,kw)
        "arg:upsample_flow3to2_weight": f32(C1, C2, 4, 4),
        "arg:upsample_flow3to2_bias": f32(C2),
        # flownet scale map — historical name
        "arg:Convolution5_scale_weight": f32(C3, C2, 1, 1),
        "arg:Convolution5_scale_bias": f32(C3),
    }


def _bn_nchw(x, g, b, mean, var):
    return ((x - mean[:, None, None]) / np.sqrt(var[:, None, None] + 2e-5)
            * g[:, None, None] + b[:, None, None])


def _oracle_forward(x_nchw, p):
    """NumPy NCHW forward under MXNet semantics, reading the checkpoint
    by its literal names only."""
    h = _bn_nchw(x_nchw, p["arg:bn_data_gamma"], p["arg:bn_data_beta"],
                 p["aux:bn_data_moving_mean"], p["aux:bn_data_moving_var"])
    h = _mx_conv2d(h, p["arg:conv0_weight"], p["arg:conv0_bias"],
                   stride=2, pad=3)
    h = _bn_nchw(h, p["arg:bn0_gamma"], p["arg:bn0_beta"],
                 p["aux:bn0_moving_mean"], p["aux:bn0_moving_var"])
    h = np.maximum(h, 0)
    h = _mx_conv2d(h, p["arg:feat_conv_3x3_weight"],
                   p["arg:feat_conv_3x3_bias"], stride=1, pad=2, dilate=2)
    h = np.maximum(h, 0)
    full = _mx_deconv2d(h, p["arg:upsample_flow3to2_weight"],
                        p["arg:upsample_flow3to2_bias"], stride=2, pad=0)
    oh, ow = 2 * h.shape[1], 2 * h.shape[2]
    h = full[:, 1:1 + oh, 1:1 + ow]          # Crop offset (1,1)
    return _mx_conv2d(h, p["arg:Convolution5_scale_weight"],
                      p["arg:Convolution5_scale_bias"], stride=1, pad=0)


def test_composite_literal_fixture_activations(tmp_path):
    rng = np.random.default_rng(42)
    ckpt = _literal_checkpoint(rng)
    path = str(tmp_path / "literal-0000.params")
    save_params(path, ckpt)

    model = _FixtureNet()
    x = rng.standard_normal((3, H, W)).astype(np.float32)     # NCHW oracle
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    new_vars, report = import_mxnet_lsfa(
        variables, path, strict_modules=("backbone", "flownet"))
    # every fixture tensor consumed, nothing missing anywhere
    assert report["unused"] == [], report["unused"]
    assert report["missing"] == [], report["missing"]

    got = np.asarray(model.apply(new_vars, x.transpose(1, 2, 0)[None]))
    got = got[0].transpose(2, 0, 1)                           # -> NCHW
    want = _oracle_forward(x, ckpt)
    assert got.shape == want.shape
    # f32 chain vs f64 oracle over 4 layers: values span ~1e3, so a few
    # near-cancellation elements need the atol term
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-2)


def test_composite_fixture_detects_layout_corruption(tmp_path):
    """Sanity that the fixture has teeth: a transposed conv kernel or an
    unflipped deconv kernel must NOT reproduce the oracle."""
    rng = np.random.default_rng(43)
    ckpt = _literal_checkpoint(rng)
    model = _FixtureNet()
    x = rng.standard_normal((3, H, W)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    want = _oracle_forward(x, ckpt)

    # corrupt: pre-flip the deconv kernel spatially, cancelling the
    # importer's flip (== forgetting the flip — a plausible systematic
    # mistake that preserves every shape)
    bad = dict(ckpt)
    bad["arg:upsample_flow3to2_weight"] = np.ascontiguousarray(
        ckpt["arg:upsample_flow3to2_weight"][:, :, ::-1, ::-1])
    path = str(tmp_path / "bad-0000.params")
    save_params(path, bad)
    new_vars, _ = import_mxnet_lsfa(variables, path)
    got = np.asarray(model.apply(new_vars, x.transpose(1, 2, 0)[None]))
    got = got[0].transpose(2, 0, 1)
    assert not np.allclose(got, want, rtol=1e-3, atol=1e-3)
