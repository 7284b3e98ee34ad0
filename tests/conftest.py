"""Test config: force an 8-device virtual CPU platform BEFORE jax import
so multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache makes repeated test runs fast; keyed by
# host CPU features so a host swap never loads poisoned AOT artifacts
# (XLA:CPU SIGILL — see lsfa_tpu.utils.env._host_tag)
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from lsfa_tpu.utils.env import _host_tag
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      f"/tmp/jax_cache_{_host_tag()}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The environment ships a TPU plugin that force-registers itself over the
# JAX_PLATFORMS env var; pin the platform explicitly so tests really run
# on the 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
