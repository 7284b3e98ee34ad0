"""Regenerate the GOLDEN values in tests/test_golden_forward.py (run on
the CPU backend; paste the printed dict into the test when an INTENTIONAL
numerics change lands)."""
import os
# EXACTLY the test environment (tests/conftest.py): the 8-virtual-device
# CPU flag changes XLA's partitioning enough to shift activations ~0.2%
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from lsfa_tpu.models.lsfa import LSFA

m = LSFA(num_classes=5, feat_dim=64, num_layer=18, add_dcn=True,
         dtype=jnp.float32)
H, W = 64, 96
rng = np.random.default_rng(1234)
data = jnp.asarray(rng.normal(0, 40, (1, H, W, 3)).astype(np.float32))
v = m.init(jax.random.PRNGKey(7), data, data, data, jnp.ones((1,)),
           jnp.ones((1,)), jnp.zeros((1, 4, 6, 2)), jnp.zeros((1, 4, 6, 3)))
old = jnp.asarray(rng.normal(0, 1, (1, 4, 6, 64)).astype(np.float32))
out = m.apply(v, data, data, old, jnp.zeros((1,)), method=m.forward_key)
f = np.asarray(out["feat"], np.float64)
print('    "feat_mean":', repr(float(f.mean())) + ",")
print('    "feat_std":', repr(float(f.std())) + ",")
print('    "feat_sample":', repr([float(x) for x in f[0, 2, 3, :5]]) + ",")
print('    "rpnfg_mean":', repr(float(np.asarray(out["rpn_fg"]).mean())) + ",")
c = np.asarray(out["rfcn_cls_map"], np.float64)
print('    "cls_mean":', repr(float(c.mean())) + ",")
print('    "cls_std":', repr(float(c.std())) + ",")
