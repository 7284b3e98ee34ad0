"""Exact import of the reference's MXNet ``.params`` checkpoints.

The reference saves flat ``arg:<name>`` / ``aux:<name>`` NDArray dicts
(lib/utils/save_model.py:11-25); names come from the symbol builders
(dff_rfcn/symbols/resnet.py, sym_common.py, resnet_v1_101_flownet_rfcn.py).
This module maps every flax leaf of the LSFA/RFCN param tree to its MXNet
name and converts layouts:

  * conv kernels:    MXNet OIHW -> flax HWIO            (transpose 2,3,1,0)
  * deconv kernels:  MXNet (I,O,kh,kw) -> flax HWIO with a spatial FLIP —
                     MXNet Deconvolution scatters out[s*i+k] += in[i]*w[k]
                     (the conv gradient); flax ConvTranspose correlates the
                     zero-dilated input with the UNflipped kernel, so
                     w_flax[kh-1-a, kw-1-b, i, o] = w_mx[i, o, a, b]
  * BatchNorm:       gamma/beta -> params scale/bias;
                     moving_mean/var -> batch_stats mean/var
  * ``*_test`` de-normalized duplicates (core/callback.py:54-65): ignored
    when the live weights are present; un-baked (/std, -mean) when a
    test-only release ships only the baked pair.

``export_mxnet_lsfa`` writes our tree back in the reference's format (the
inverse map), so a round-trip fixture validates the mapping end-to-end.
"""

from __future__ import annotations

import re

import numpy as np

from lsfa_tpu.utils.mxnet_io import load_params, save_params, split_arg_aux

# flax module name -> MXNet layer name, for the flownet's historical names
# (get_flownet, resnet_v1_101_flownet_rfcn.py:150-207)
_FLOWNET_RENAME = {
    "conv1": "flow_conv1",
    "flow6": "Convolution1", "flow5": "Convolution2",
    "flow4": "Convolution3", "flow3": "Convolution4",
    "flow_final": "Convolution5", "scale_map": "Convolution5_scale",
    "upflow5": "upsample_flow6to5", "upflow4": "upsample_flow5to4",
    "upflow3": "upsample_flow4to3", "upflow2": "upsample_flow3to2",
}


def _is_deconv(path: tuple[str, ...]) -> bool:
    return any(p.startswith("deconv") or p.startswith("upflow") for p in path)


def _mx_layer_name(path: tuple[str, ...]) -> str | None:
    """flax module path (without the leaf) -> MXNet layer name, or None if
    the module has no reference counterpart."""
    parts = [p for p in path if p != "BatchNorm_0"]
    top = parts[0]
    rest = parts[1:]
    if top in ("backbone", "small_net_backbone"):
        prefix = "" if top == "backbone" else "small_net_"
        return prefix + "_".join(rest)
    if top == "flownet":
        assert len(rest) == 1, path
        return _FLOWNET_RENAME.get(rest[0], rest[0])
    if top == "nq_net":
        m = re.fullmatch(r"conv(\d+)", rest[0])
        return f"Nq_conv{m.group(1)}"
    if top == "fgfa_net":
        return rest[0]                      # em_conv{1..3}
    if top == "rnet":
        if rest[0] == "bn":
            return "res_diff_bn"
        return "rnet_" + rest[0]            # rnet_conv{i}
    if top == "fnet":
        return "fnet_" + rest[0]            # fnet_conv{i}
    if top == "small_fuse":
        return "_".join(rest)               # fuse_reduce_add, cur_scale, ...
    if top == "fuse_downsample":
        return "fuse_downsample"            # fuse_type=concat 1x1
    if not rest:                            # heads at the tree root
        return top                          # feat_conv_3x3, rpn_*, rfcn_*
    return None


def _mx_param_name(layer: str, leaf: str, is_bn: bool) -> str:
    if is_bn:
        suffix = {"scale": "gamma", "bias": "beta",
                  "mean": "moving_mean", "var": "moving_var"}[leaf]
    else:
        suffix = {"kernel": "weight", "bias": "bias"}[leaf]
    return f"{layer}_{suffix}"


def _walk(tree, path=()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def _is_bn_path(path: tuple[str, ...]) -> bool:
    return "BatchNorm_0" in path or path[-2] == "bn_data"


def flax_to_mx_name(path: tuple[str, ...]):
    """Full flax leaf path -> (mxnet name, kind) where kind is one of
    'conv', 'deconv', 'direct'; returns None for unmapped modules
    (e.g. DCN offset convs of a non-DCN checkpoint still map — offsets are
    part of the reference's DCN recipe: stageX_unitY_conv2_offset_*)."""
    *mods, leaf = path
    mods = tuple(mods)
    is_bn = _is_bn_path(path)
    layer = _mx_layer_name(mods)
    if layer is None:
        return None
    # DCN offset conv: flax ".../convN/offset" -> mxnet "..._convN_offset"
    name = _mx_param_name(layer, leaf, is_bn)
    if leaf == "kernel":
        kind = "deconv" if _is_deconv(mods) else "conv"
    else:
        kind = "direct"
    return name, kind


def _to_flax(arr: np.ndarray, kind: str, target_shape) -> np.ndarray:
    a = np.asarray(arr, np.float32)
    if kind == "conv" and a.ndim == 4:
        a = a.transpose(2, 3, 1, 0)             # OIHW -> HWIO
    elif kind == "deconv" and a.ndim == 4:
        a = a[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # (I,O,kh,kw) flip->HWIO
    if tuple(a.shape) != tuple(target_shape):
        raise ValueError(f"shape mismatch: mx {a.shape} vs flax {tuple(target_shape)}")
    return a


def _from_flax(arr: np.ndarray, kind: str) -> np.ndarray:
    a = np.asarray(arr, np.float32)
    if kind == "conv" and a.ndim == 4:
        return np.ascontiguousarray(a.transpose(3, 2, 0, 1))
    if kind == "deconv" and a.ndim == 4:
        return np.ascontiguousarray(a.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])
    return a


def _unbake_rfcn_bbox(arg: dict, bbox_means, bbox_stds):
    """Recover live rfcn_bbox weights from a test-only (baked) release:
    the inverse of do_checkpoint (core/callback.py:54-65)."""
    if "rfcn_bbox_weight" in arg or "rfcn_bbox_weight_test" not in arg:
        return arg
    w = np.asarray(arg["rfcn_bbox_weight_test"], np.float32)
    b = np.asarray(arg["rfcn_bbox_bias_test"], np.float32)
    means = np.asarray(bbox_means, np.float32)
    stds = np.asarray(bbox_stds, np.float32)
    rep = b.shape[0] // means.shape[0]
    stds_r = np.repeat(stds[None], rep, 0).reshape(-1)
    means_r = np.repeat(means[None], rep, 0).reshape(-1)
    arg = dict(arg)
    arg["rfcn_bbox_weight"] = w / stds_r[:, None, None, None]
    arg["rfcn_bbox_bias"] = (b - means_r) / stds_r
    return arg


def import_mxnet_lsfa(variables, source,
                      bbox_means=(0.0, 0.0, 0.0, 0.0),
                      bbox_stds=(0.1, 0.1, 0.2, 0.2),
                      strict_modules: tuple[str, ...] = ()):
    """Map an MXNet checkpoint onto flax ``variables`` ({'params', 'batch_stats'}).

    source: a .params path, or an already-split (arg, aux) pair, or a raw
    ``arg:``/``aux:``-prefixed dict.
    strict_modules: top-level flax modules that must import completely
    (every leaf found) or ValueError — use for backbone/flownet parity runs.

    Returns (new_variables, report) where report = dict with 'imported'
    (flax paths), 'missing' (flax paths with no checkpoint entry), 'unused'
    (checkpoint names never consumed).
    """
    if isinstance(source, str):
        arg, aux = split_arg_aux(load_params(source))
    elif isinstance(source, tuple):
        arg, aux = dict(source[0]), dict(source[1])
    else:
        arg, aux = split_arg_aux(dict(source))
    arg = _unbake_rfcn_bbox(arg, bbox_means, bbox_stds)

    used: set[str] = set()
    imported: list[str] = []
    missing: list[str] = []

    # deep-copy trees, then assign in place
    import jax
    new_vars = jax.tree.map(lambda x: x, dict(variables))
    params = new_vars.get("params", {})
    bstats = new_vars.get("batch_stats", {})

    def assign(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = val

    def deep_dict(t):
        return {k: deep_dict(v) if isinstance(v, dict) else v
                for k, v in t.items()}

    params = deep_dict(params)
    bstats = deep_dict(bstats)

    for collection, tree, is_stats in (("params", params, False),
                                       ("batch_stats", bstats, True)):
        for path, leaf in _walk(tree):
            mapped = flax_to_mx_name(path)
            label = collection + "/" + "/".join(path)
            if mapped is None:
                missing.append(label)
                continue
            name, kind = mapped
            store = aux if is_stats else arg
            if name not in store:
                # bn_data has fix_gamma=True: beta/stats exist, our module
                # has no scale — nothing to do. Anything else is missing.
                missing.append(label)
                continue
            assign(tree, path, _to_flax(store[name], kind, leaf.shape))
            used.add(("aux:" if is_stats else "arg:") + name)
            imported.append(label)

    unused = sorted(
        ({("arg:" + k) for k in arg if not k.endswith("_test")}
         | {("aux:" + k) for k in aux})
        - used)
    report = {"imported": imported, "missing": missing, "unused": unused}

    for mod in strict_modules:
        bad = [m for m in missing
               if m.split("/", 2)[1] == mod]
        if bad:
            raise ValueError(f"strict import: {mod} missing {bad[:8]}"
                             f" (+{max(0, len(bad) - 8)} more)")

    new_vars["params"] = params
    if "batch_stats" in new_vars:
        new_vars["batch_stats"] = bstats
    return new_vars, report


def export_mxnet_lsfa(variables, path: str | None = None):
    """Inverse map: our tree -> the reference's arg:/aux: flat dict
    (optionally written to ``path`` in .params format). Enables running our
    trained weights in the reference toolchain and round-trip tests."""
    flat: dict[str, np.ndarray] = {}
    for collection, stats in (("params", False), ("batch_stats", True)):
        tree = variables.get(collection, {})
        for p, leaf in _walk(tree):
            mapped = flax_to_mx_name(p)
            if mapped is None:
                continue
            name, kind = mapped
            prefix = "aux:" if stats else "arg:"
            flat[prefix + name] = _from_flax(np.asarray(leaf), kind)
    if path is not None:
        save_params(path, flat)
    return flat
