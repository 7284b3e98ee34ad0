"""Parameter-tree inspection — the graph-construction sanity check.

Behavioral target: lib/utils/symbol.py:44-55 (check_parameter_shapes, the
reference's de-facto unit test of graph building) + infer-shape helpers.
"""

from __future__ import annotations

import jax
import numpy as np


def param_summary(params) -> str:
    """Human-readable per-module parameter counts."""
    lines = []
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_top: dict = {}
    for path, leaf in flat:
        top = str(getattr(path[0], "key", path[0]))
        by_top[top] = by_top.get(top, 0) + leaf.size
        total += leaf.size
    for k in sorted(by_top):
        lines.append(f"{k:>24s}: {by_top[k] / 1e6:8.2f} M")
    lines.append(f"{'TOTAL':>24s}: {total / 1e6:8.2f} M")
    return "\n".join(lines)


def check_parameter_shapes(params, expected: dict) -> list:
    """Verify a {path: shape} subset against the tree; returns mismatches."""
    flat = {jax.tree_util.keystr(p): leaf.shape
            for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    bad = []
    for k, shp in expected.items():
        if k not in flat:
            bad.append((k, "missing", shp))
        elif tuple(flat[k]) != tuple(shp):
            bad.append((k, flat[k], shp))
    return bad


def count_params(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))
