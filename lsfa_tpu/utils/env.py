"""Process-level environment defaults for lsfa_tpu entry points."""

from __future__ import annotations

import os


def _host_tag() -> str:
    """Fingerprint of the host CPU's ISA features.

    XLA:CPU persists AOT-compiled artifacts in the compilation cache; an
    artifact compiled on a host with (say) AVX-512 SIGILLs when loaded on
    a host without it ("cpu_aot_loader ... SIGILL", observed as collective
    rendezvous timeouts in the multichip dryrun after a host swap).
    Keying the cache dir by the CPU flags makes a host change start a
    fresh cache instead of loading poisoned artifacts.
    """
    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                # model name matters beyond the flag set: XLA derives
                # per-model tuning features (prefer-no-scatter/-gather)
                # that differ between hosts with identical cpuinfo flags
                if line.startswith(("model name", "flags", "stepping")):
                    parts.append(" ".join(sorted(
                        line.split(":", 1)[1].split())))
                    if len(parts) == 3:
                        break
        if parts:
            import hashlib

            return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


def honor_platform_env() -> None:
    """Re-assert JAX_PLATFORMS via jax.config (no-op when unset).

    This environment's TPU plugin force-registers itself OVER the
    JAX_PLATFORMS env var; a script that sets JAX_PLATFORMS=cpu still
    initializes the TPU backend — and hangs ~20 min in backend-init
    retries when the device link is down. The config update restores the
    env var's intent (the test conftest does the same pin)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def setup_cache(path: str | None = None) -> None:
    """Enable the persistent JAX compilation cache (must run before the
    first compilation; safe to call anytime). The directory is keyed by
    the host CPU's feature set — see _host_tag. Also honors a
    JAX_PLATFORMS env override (see honor_platform_env)."""
    honor_platform_env()
    if path is None:
        path = f"/tmp/lsfa_tpu_jax_cache_{_host_tag()}"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
