import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.models.lsfa import LSFA
from lsfa_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    seed_small_net,
)
from lsfa_tpu.train.schedule import make_optimizer


def tiny_model():
    model = LSFA(num_classes=3, feat_dim=32, num_layer=18, add_dcn=False)
    H, W = 32, 32
    data = jnp.zeros((1, H, W, 3))
    mv = jnp.zeros((1, 2, 2, 2))
    res = jnp.zeros((1, 2, 2, 3))
    v = model.init(jax.random.PRNGKey(0), data, data, data, jnp.ones((1,)),
                   jnp.ones((1,)), mv, res)
    return model, v


def test_checkpoint_roundtrip(tmp_path):
    model, v = tiny_model()
    params = v["params"]
    bs = v.get("batch_stats", {})
    opt = make_optimizer(params, 1e-3, [100])
    opt_state = opt.init(params)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, 1, params, bs, opt_state)
    restored, step = load_checkpoint(path, template={
        "params": params, "batch_stats": bs, "opt_state": opt_state})
    assert step == 1
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume semantics: latest step found without naming it
    save_checkpoint(path, 2, params, bs, opt_state)
    _, latest = load_checkpoint(path, template={
        "params": params, "batch_stats": bs, "opt_state": opt_state})
    assert latest == 2


def test_seed_small_net_copies_stage1():
    model, v = tiny_model()
    params = seed_small_net(v["params"])
    src = params["backbone"]["stage1_unit1"]["conv1"]["kernel"]
    dst = params["small_net_backbone"]["stage1_unit1"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(src), np.asarray(dst))
    stem_s = params["backbone"]["conv0"]["kernel"]
    stem_d = params["small_net_backbone"]["conv0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(stem_s), np.asarray(stem_d))
