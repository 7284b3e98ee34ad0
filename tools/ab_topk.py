#!/usr/bin/env python
"""A/B candidate formulations of the proposal op's pre-NMS top-k.

The RPN proposal op takes top `nms_tier` (2048) of H*W*A ~ 21888 masked
scores (ops/proposal.py step 4). lax.top_k at large k is historically
slow on TPU; this times the alternatives at production shapes so the
winner can be wired behind a config switch:

  topk       lax.top_k(N, k)                      (current, exact)
  sort       full jnp.sort + slice                 (exact)
  neg_sort   argsort of negated scores + gather    (exact, stable ties)
  approx     lax.approx_max_k recall 0.95          (NOT exact — measures
                                                    the available headroom)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lsfa_tpu.utils.env import setup_cache

setup_cache()

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    N, K = 38 * 64 * 9, 2048
    rnd = np.random.default_rng(0)
    scores = jax.device_put(jnp.asarray(
        rnd.normal(0, 1, (N,)).astype(np.float32)))

    @jax.jit
    def topk(s):
        return jax.lax.top_k(s, K)

    @jax.jit
    def sort_slice(s):
        order = jnp.argsort(-s)[:K]
        return s[order], order

    @jax.jit
    def approx(s):
        return jax.lax.approx_max_k(s, K, recall_target=0.95)

    print(f"N={N} K={K} on {jax.devices()[0].platform}")
    print(f"lax.top_k        : {timeit(topk, scores):7.3f} ms")
    print(f"argsort+slice    : {timeit(sort_slice, scores):7.3f} ms")
    print(f"approx_max_k .95 : {timeit(approx, scores):7.3f} ms")
    # sanity: exact variants agree on values
    a, _ = topk(scores)
    b, _ = sort_slice(scores)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0)

    # batched like the GOP scan (12 frames)
    s12 = jnp.tile(scores[None], (12, 1))
    print(f"top_k x12 vmap   : {timeit(jax.jit(jax.vmap(topk)), s12):7.3f} ms")


if __name__ == "__main__":
    main()
