import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.ops import flow_warp
from tests.ref_impl import ref_flow_warp


def test_flow_warp_matches_bilinear_sampler():
    rng = np.random.default_rng(0)
    h, w, c = 9, 13, 4
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    flow = rng.normal(0, 2.5, size=(h, w, 2)).astype(np.float32)
    got = np.asarray(flow_warp(jnp.asarray(feat), jnp.asarray(flow)))
    want = ref_flow_warp(np.moveaxis(feat, -1, 0), np.moveaxis(flow, -1, 0))
    np.testing.assert_allclose(got, np.moveaxis(want, 0, -1), rtol=1e-4, atol=1e-5)


def test_flow_warp_zero_flow_is_identity():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(6, 7, 3)).astype(np.float32)
    out = np.asarray(flow_warp(jnp.asarray(feat), jnp.zeros((6, 7, 2))))
    np.testing.assert_allclose(out, feat, rtol=1e-6)


def test_flow_warp_integer_shift():
    feat = np.zeros((5, 5, 1), np.float32)
    feat[2, 2, 0] = 1.0
    # flow of (+1, +1): output(y,x) samples input at (x+1, y+1)
    flow = np.ones((5, 5, 2), np.float32)
    out = np.asarray(flow_warp(jnp.asarray(feat), jnp.asarray(flow)))
    assert out[1, 1, 0] == 1.0 and out[2, 2, 0] == 0.0


def test_flow_warp_out_of_bounds_zero():
    feat = np.ones((4, 4, 1), np.float32)
    flow = np.full((4, 4, 2), 10.0, np.float32)
    out = np.asarray(flow_warp(jnp.asarray(feat), jnp.asarray(flow)))
    np.testing.assert_allclose(out, 0.0)


def test_flow_warp_batched_and_grad():
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 1, size=(2, 6, 6, 2)).astype(np.float32))
    out = flow_warp(feat, flow)
    assert out.shape == feat.shape
    g = jax.grad(lambda f, fl: jnp.sum(flow_warp(f, fl) ** 2), argnums=(0, 1))(feat, flow)
    assert np.isfinite(np.asarray(g[0])).all() and np.isfinite(np.asarray(g[1])).all()
