"""Import the reference's pretrained TF1 checkpoints into flax variables.

The reference publishes pretrained weights (README.md:92-94 — e.g. the
pointasnl_sem_seg_res ScanNet checkpoint at 66.93 mIoU) as TF1 `tf.train.Saver`
checkpoints. This module maps their variable names onto this package's flax
param/batch_stats tree so a reference user can carry their weights over.

TF-side extraction (run once in any environment with TF1/TF2 installed; this
build environment ships no TensorFlow, so the converter consumes the npz):

    import numpy as np
    from tensorflow.python.training import py_checkpoint_reader
    r = py_checkpoint_reader.NewCheckpointReader("best_model_epoch_xxx.ckpt")
    np.savez("weights.npz",
             **{n: r.get_tensor(n) for n in r.get_variable_to_shape_map()})

Name mapping (derived from the reference's scoping, cited per rule):

- tf_util.conv1d/conv2d/fully_connected create `<scope>/weights`,
  `<scope>/biases`, and batch norm under `<scope>/bn/{gamma,beta,
  moving_mean,moving_variance}` (tf_util.py:95-111,155-178,346-357; the live
  batch_norm_template is tf.contrib.layers.batch_norm at tf_util.py:512-531).
- `PointASNLSetAbstraction(scope=S)` re-enters `variable_scope(S)` for its
  sub-blocks: `AdaptiveSampling` (pointasnl_util.py:159) which re-enters S
  again for `SampleWeights` (:167), and `PointNonLocalCell` (:182) once.
  TF therefore nests the SAME scope name: our
  `S/adaptive_sampling/sample_weights/X` lives at TF `S/S/S/X`, and our
  `S/nonlocal/X` at TF `S/S/X`. The decode layer's NL cell nests the same
  way (pointasnl_util.py:305-323).
- Everything else was named to match the reference scope-for-scope
  (conv%d, skip, weight_net/wconv%d, after_conv, aggregation, fa_layerN/
  conv_%d, fc*, mlp2_%d, conv_kv[_ds], conv_query[_ds], conv_back_project,
  decode_weight_net, decode_after_conv).
- TF kernels carry leading singleton spatial dims ((1,1,Cin,Cout) conv2d,
  (1,Cin,Cout) conv1d); they are reshaped to the flax Dense (Cin,Cout).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# Our structural module levels that TF flattens into re-entered scopes.
_NEST_AS = ("adaptive_sampling", "sample_weights")
_NEST_NL = ("nonlocal",)

_LEAF_MAP = {
    ("conv", "kernel"): "weights",
    ("conv", "bias"): "biases",
    ("dense", "kernel"): "weights",
    ("dense", "bias"): "biases",
    ("bn", "scale"): "bn/gamma",
    ("bn", "bias"): "bn/beta",
    ("bn", "mean"): "bn/moving_mean",
    ("bn", "var"): "bn/moving_variance",
}

# Optimizer/bookkeeping variables in reference checkpoints, not model state.
_SKIP_SUBSTRINGS = ("/Adam", "beta1_power", "beta2_power", "global_step")
# The reference's global step is a variable named exactly 'batch'
# (train.py:121); match the final path component only, so genuinely
# unmapped variables whose name merely CONTAINS 'batch' still surface.
_SKIP_EXACT_LEAVES = ("batch",)


def _is_bookkeeping_var(name: str) -> bool:
    return any(s in name for s in _SKIP_SUBSTRINGS) or (
        name.split("/")[-1] in _SKIP_EXACT_LEAVES
    )


def flax_path_to_tf_name(path: Tuple[str, ...]) -> str:
    """Translate a flattened flax variables path to the TF1 variable name.

    `path` starts with the collection ('params' or 'batch_stats'); batch
    stats land on the same TF scope as their layer's params.
    """
    mods = list(path[1:-2])
    leaf = tuple(path[-2:])
    if leaf not in _LEAF_MAP:
        raise KeyError(f"unmapped flax leaf {path}")
    root = mods[0] if mods else ""
    out = []
    for m in mods:
        if m in _NEST_AS or m in _NEST_NL:
            out.append(root)  # TF re-enters the enclosing layer scope
        else:
            out.append(m)
    return "/".join(out + [_LEAF_MAP[leaf]])


def _flatten(tree, prefix=()):  # -> dict[path_tuple, leaf]
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return tree


def convert_tf_vars(tf_vars: Dict[str, np.ndarray], variables) -> dict:
    """Fill a flax variables template with reference-checkpoint weights.

    Args:
      tf_vars: {tf_variable_name: array} from the reference checkpoint.
      variables: template pytree from `model.init` ({'params': ..,
        'batch_stats': ..}) — shapes/paths to fill.

    Returns:
      A new variables pytree with every leaf loaded from tf_vars.

    Raises:
      ValueError listing missing TF variables or shape clashes; unused
      non-optimizer TF variables are reported too (a wrong-model signal).
    """
    flat = _flatten(variables)
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    missing, used = [], set()
    for path, leaf in flat.items():
        name = flax_path_to_tf_name(path)
        if name not in tf_vars:
            missing.append(f"{'/'.join(path)} <- {name}")
            continue
        arr = np.asarray(tf_vars[name])
        used.add(name)
        want = tuple(np.shape(leaf))
        # squeeze TF's leading singleton conv dims ((1,1,Cin,Cout) -> (Cin,Cout))
        while arr.ndim > len(want) and arr.shape[0] == 1:
            arr = arr[0]
        if tuple(arr.shape) != want:
            raise ValueError(
                f"shape clash at {'/'.join(path)} <- {name}: "
                f"checkpoint {arr.shape} vs model {want}"
            )
        out[path] = arr.astype(np.asarray(leaf).dtype)
    if missing:
        raise ValueError(
            "reference checkpoint is missing variables for:\n  "
            + "\n  ".join(missing)
        )
    unused = []
    for n in tf_vars:
        if n in used or _is_bookkeeping_var(n):
            continue
        if n.endswith("/biases"):
            scope = n[: -len("/biases")]
            if f"{scope}/weights" in used and f"{scope}/bn/gamma" in tf_vars:
                # The reference keeps a conv bias even under BN
                # (tf_util.py:104-106); BN's mean subtraction cancels it, and
                # our PointConv deliberately drops it (nn/layers.py:91-96).
                # A real reference checkpoint therefore carries these with no
                # destination — accept and ignore.
                continue
        unused.append(n)
    if unused:
        raise ValueError(
            "checkpoint variables with no destination (wrong --model?):\n  "
            + "\n  ".join(sorted(unused)[:20])
        )
    return _unflatten(out)


def export_tf_vars(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_tf_vars: emit reference-named arrays (with TF's
    conv2d (1,1,Cin,Cout) kernel layout) from a flax variables tree. Used to
    round-trip-test the mapping, and to hand weights BACK to the reference."""
    out: Dict[str, np.ndarray] = {}
    for path, leaf in _flatten(variables).items():
        name = flax_path_to_tf_name(path)
        arr = np.asarray(leaf)
        # PointConv kernels take TF's conv2d layout; FullyConnected ('dense')
        # stays 2-D like tf_util.fully_connected. (A conv1d call site in TF
        # would be (1,Cin,Cout) — convert_tf_vars squeezes any of these, so
        # round-trips are exact either way.)
        if path[-2] == "conv" and arr.ndim == 2:
            arr = arr[None, None]
        out[name] = arr
    return out


def import_npz(npz_path: str, variables) -> dict:
    """convert_tf_vars over an npz produced by the docstring's TF snippet."""
    with np.load(npz_path) as z:
        tf_vars = {k: z[k] for k in z.files}
    return convert_tf_vars(tf_vars, variables)
