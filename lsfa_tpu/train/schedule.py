"""LR schedule + optimizer matching the reference recipe.

Behavioral target: WarmupMultiFactorScheduler (lib/utils/lr_scheduler.py:27-67)
— optional linear warmup to base lr, then step decay (x lr_factor) at the
given step boundaries — and the SGD recipe of train_end2end.py:149-173
(momentum 0.9, wd 5e-4, rescale by batch).

TPU notes: expressed as an optax chain; parameter freezing
(network.FIXED_PARAMS: the stem, stage-1, and all BN affine params —
yaml:22-28) is an optax.masked zero-update, replacing MXNet's
fixed_param_names mechanism.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_multifactor(base_lr: float, steps: Sequence[int],
                       factor: float = 0.1, warmup: bool = False,
                       warmup_lr: float = 0.0, warmup_step: int = 0):
    """Returns an optax schedule fn(step) -> lr."""
    steps = jnp.asarray(list(steps), jnp.int32)

    def sched(count):
        count = jnp.asarray(count, jnp.int32)
        n_passed = jnp.sum(count >= steps)
        lr = base_lr * (factor ** n_passed)
        if warmup and warmup_step > 0:
            frac = jnp.clip(count / warmup_step, 0.0, 1.0)
            wlr = warmup_lr + (base_lr - warmup_lr) * frac
            lr = jnp.where(count < warmup_step, wlr, lr)
        return lr

    return sched


def _is_frozen(path_tuple) -> bool:
    """FIXED_PARAMS policy: main-backbone stem (conv0/bn0/bn_data) and
    stage-1, plus every BatchNorm scale/bias (gamma/beta) anywhere."""
    path = "/".join(str(p) for p in path_tuple)
    if "BatchNorm_0" in path or "bn_data" in path:
        return True
    if path.startswith("backbone/conv0") or path.startswith("backbone/bn0"):
        return True
    if path.startswith("backbone/stage1_"):
        return True
    return False


def freeze_mask(params):
    """Pytree of bools: True = trainable."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        keys = tuple(getattr(p, "key", getattr(p, "idx", "?")) for p in path)
        return not _is_frozen(keys)

    leaves = {jax.tree_util.keystr(p): trainable(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: leaves[jax.tree_util.keystr(p)], params)


def make_optimizer(params, base_lr: float, lr_steps: Sequence[int],
                   lr_factor: float = 0.1, momentum: float = 0.9,
                   wd: float = 5e-4, warmup: bool = False,
                   warmup_lr: float = 0.0, warmup_step: int = 0):
    sched = warmup_multifactor(base_lr, lr_steps, lr_factor, warmup,
                               warmup_lr, warmup_step)
    mask = freeze_mask(params)
    return optax.chain(
        optax.add_decayed_weights(
            wd, mask=jax.tree.map(lambda x: x.ndim > 1, params)),
        optax.sgd(learning_rate=sched, momentum=momentum),
        optax.masked(optax.set_to_zero(),
                     jax.tree.map(lambda t: not t, mask)),
    )
