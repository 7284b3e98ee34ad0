import numpy as np
import jax
import jax.numpy as jnp

import pytest

from lsfa_tpu.ops import psroi_pool
from lsfa_tpu.ops.psroi_pool import psroi_pool_sat
from tests.ref_impl import ref_psroi_pool


def make_case(seed, h=12, w=16, output_dim=5, g=7, n=8, scale=1.0 / 16):
    rng = np.random.default_rng(seed)
    c = output_dim * g * g
    feat_chw = rng.normal(size=(c, h, w)).astype(np.float32)
    # rois at input-image scale (stride 16)
    x1 = rng.uniform(0, w * 16 * 0.7, n)
    y1 = rng.uniform(0, h * 16 * 0.7, n)
    x2 = x1 + rng.uniform(8, w * 16 * 0.4, n)
    y2 = y1 + rng.uniform(8, h * 16 * 0.4, n)
    rois = np.stack([np.zeros(n), x1, y1, x2, y2], axis=1).astype(np.float32)
    return feat_chw, rois


@pytest.mark.parametrize("impl", [psroi_pool, psroi_pool_sat])
def test_psroi_pool_matches_cuda_semantics(impl):
    feat_chw, rois = make_case(0)
    feat_hwc = np.moveaxis(feat_chw, 0, -1)
    got = impl(jnp.asarray(feat_hwc), jnp.asarray(rois), output_dim=5)
    # got: (N, P, P, out) -> (N, out, P, P)
    got = np.moveaxis(np.asarray(got), -1, 1)
    want = ref_psroi_pool(feat_chw, rois, 5, 7, 7, 1.0 / 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_psroi_pool_tiny_roi_not_nan():
    feat_chw, _ = make_case(1)
    feat_hwc = np.moveaxis(feat_chw, 0, -1)
    rois = np.array([[0, 5.0, 5.0, 5.0, 5.0],      # 1-pixel roi
                     [0, 250.0, 190.0, 255.0, 191.0]], dtype=np.float32)
    out = np.asarray(psroi_pool(jnp.asarray(feat_hwc), jnp.asarray(rois), output_dim=5))
    assert np.isfinite(out).all()
    want = ref_psroi_pool(feat_chw, rois, 5, 7, 7, 1.0 / 16)
    np.testing.assert_allclose(np.moveaxis(out, -1, 1), want, rtol=1e-4, atol=1e-4)


def test_psroi_pool_gradient_flows():
    feat_chw, rois = make_case(2, n=4)
    feat_hwc = jnp.asarray(np.moveaxis(feat_chw, 0, -1))

    def loss(f):
        return jnp.sum(psroi_pool(f, jnp.asarray(rois), output_dim=5) ** 2)

    grad = jax.grad(loss)(feat_hwc)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).sum() > 0


@pytest.mark.parametrize("impl", [psroi_pool, psroi_pool_sat])
def test_psroi_half_coordinate_rounding(impl):
    """Coordinates landing exactly on .5 must round like C round() (half
    AWAY from zero, cuda :54-57) — np/jnp half-to-even would shift the roi
    by one pixel (e.g. round(2.5): CUDA 3, numpy 2)."""
    feat_chw, _ = make_case(2)
    feat_hwc = np.moveaxis(feat_chw, 0, -1)
    rois = np.array([[0, 2.5, 4.5, 120.5, 90.5],
                     [0, 16.5, 32.5, 150.5, 140.5]], dtype=np.float32)
    got = impl(jnp.asarray(feat_hwc), jnp.asarray(rois), output_dim=5)
    got = np.moveaxis(np.asarray(got), -1, 1)
    want = ref_psroi_pool(feat_chw, rois, 5, 7, 7, 1.0 / 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_psroi_bf16_operands_bit_exact_for_bf16_inputs():
    """A bf16 feature map pooled via the bf16-operand MXU path must equal
    the f32 path BIT-FOR-BIT: bf16 x {0,1} products are exact in f32 and
    accumulation stays f32 (preferred_element_type), so emitting rfcn maps
    in model dtype (models/lsfa.py::rfcn_maps) loses nothing."""
    feat_chw, rois = make_case(5, n=16)
    feat_hwc = np.moveaxis(feat_chw, 0, -1)
    feat_bf16 = jnp.asarray(feat_hwc).astype(jnp.bfloat16)
    got16 = np.asarray(psroi_pool(feat_bf16, jnp.asarray(rois),
                                  output_dim=5))
    got32 = np.asarray(psroi_pool(feat_bf16.astype(jnp.float32),
                                  jnp.asarray(rois), output_dim=5))
    assert got16.dtype == np.float32
    np.testing.assert_array_equal(got16, got32)
