"""Tensor-parallel head-stack sharding over a ('data', 'model') mesh.

The reference has no tensor parallelism (SURVEY §2.5 — the model fits one
device), so this is a capability demo, not a port: feat_conv_3x3's output
channels and the four 1x1 head kernels shard over a 'model' axis
(parallel/mesh.py::tensor_parallel_specs), XLA SPMD propagates the
channel sharding through the relu / channel split and inserts the psum
after the heads. The test asserts (a) numerical equality with the
replicated run and (b) the parameters genuinely live sharded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lsfa_tpu.models.lsfa import LSFA
from lsfa_tpu.parallel import (make_tp_mesh, shard_params,
                               tensor_parallel_specs)

H, W = 64, 96
FEAT = 64


@pytest.fixture(scope="module")
def tiny():
    model = LSFA(num_classes=5, feat_dim=FEAT, num_layer=18, add_dcn=False)
    rng = jax.random.PRNGKey(0)
    data = jnp.zeros((1, H, W, 3))
    mv = jnp.zeros((1, H // 16, W // 16, 2))
    res = jnp.zeros((1, H // 16, W // 16, 3))
    variables = model.init(rng, data, data, data, jnp.ones((1,)),
                           jnp.ones((1,)), mv, res)
    return model, variables


def _cur_inputs(batch):
    rnd = np.random.default_rng(7)
    fh, fw = H // 16, W // 16
    small = rnd.integers(0, 255, (batch, H // 4, W // 4, 3)).astype(np.uint8)
    feat_key = rnd.normal(0, 1, (batch, fh, fw, FEAT)).astype(np.float32)
    mv = rnd.normal(0, 1.5, (batch, fh, fw, 2)).astype(np.float32)
    res = rnd.normal(0, 8, (batch, fh, fw, 3)).astype(np.float32)
    return small, feat_key, mv, res


def test_tp_specs_shapes(tiny):
    model, variables = tiny
    specs = tensor_parallel_specs(variables)
    p = specs["params"]
    assert p["feat_conv_3x3"]["kernel"] == P(None, None, None, "model")
    assert p["feat_conv_3x3"]["bias"] == P("model")
    for head in ("rpn_cls_score", "rpn_bbox_pred", "rfcn_cls", "rfcn_bbox"):
        assert p[head]["kernel"] == P(None, None, "model", None)
        assert p[head]["bias"] == P()
    # everything under the backbone stays replicated
    flat = jax.tree.leaves(specs["params"]["backbone"])
    assert all(s == P() for s in flat)


def test_tp_forward_cur_matches_replicated(tiny):
    model, variables = tiny
    small, feat_key, mv, res = _cur_inputs(batch=2)

    ref = jax.jit(lambda v, *a: model.apply(v, *a,
                                            method=LSFA.forward_cur))(
        variables, small, feat_key, mv, res)

    mesh = make_tp_mesh(n_model=4)          # 2 data x 4 model on 8 devices
    assert mesh.shape == {"data": 2, "model": 4}
    specs = tensor_parallel_specs(variables)
    v_tp = shard_params(mesh, variables, specs)

    # the sharded kernel must really be distributed: 4 distinct shards of
    # 16 output channels each, replicated over the data axis
    k = v_tp["params"]["feat_conv_3x3"]["kernel"]
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {k.shape[:3] + (FEAT // 4,)}
    assert len({s.device for s in k.addressable_shards}) == 8

    batch_sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(a, batch_sh) for a in (small, feat_key, mv, res)]
    out = jax.jit(lambda v, *a: model.apply(v, *a,
                                            method=LSFA.forward_cur))(
        v_tp, *args)

    for key in ("rpn_fg", "rpn_deltas", "rfcn_cls_map", "rfcn_bbox_map",
                "feat"):
        a, b = np.asarray(ref[key]), np.asarray(out[key])
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                   err_msg=f"output {key} diverged under TP")


def test_tp_forward_key_matches_replicated(tiny):
    """The key path (backbone + flownet + aggregation) also runs unchanged
    under the TP placement — replicated backbone, sharded head stack."""
    model, variables = tiny
    rnd = np.random.default_rng(11)
    fh, fw = H // 16, W // 16
    data = rnd.integers(0, 255, (1, H, W, 3)).astype(np.uint8)
    prev = rnd.normal(0.0, 1.0, (1, H, W, 3)).astype(np.float32)
    feat_old = rnd.normal(0, 1, (1, fh, fw, FEAT)).astype(np.float32)
    first = np.zeros((1,), np.float32)

    fn = lambda v, *a: model.apply(v, *a, method=LSFA.forward_key)
    ref = jax.jit(fn)(variables, data, prev, feat_old, first)

    mesh = make_tp_mesh(n_model=4)
    v_tp = shard_params(mesh, variables, tensor_parallel_specs(variables))
    out = jax.jit(fn)(v_tp, data, prev, feat_old, first)

    for key in ("rpn_fg", "rpn_deltas", "rfcn_cls_map", "rfcn_bbox_map"):
        np.testing.assert_allclose(np.asarray(ref[key]), np.asarray(out[key]),
                                   rtol=2e-4, atol=2e-4, err_msg=key)
