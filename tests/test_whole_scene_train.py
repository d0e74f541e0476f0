"""Point-sharded whole-scene TRAINING step (parallel/whole_scene.py, r4).

VERDICT r3 item 7: gradients must flow through the ring non-local attention
and the ring-gathered neighbor fetches, and match the monolithic model on
the 8-device CPU mesh to tolerance.

Verification strategy (informed by an f64 bisection,
scripts/diag_sharded_grads.py):

  - EVAL-mode loss gradients (frozen BN stats) are compared TIGHTLY: the
    f64 control shows them exact to ~1e-10 (global cos 1.00000000), proving
    every transpose in the orchestration — ring attention, ring-gather
    neighbor fetch, all_gather, the closure-captured-param psum — is
    correct. At f32 they agree to ~1e-4.
  - TRAINING-mode gradients are compared with loose per-leaf slack + a
    global direction/norm check: training-mode BN normalizes with batch
    moments, and pmean-of-shard-moments vs one global mean differ by
    summation order (rounding), which training-mode normalization amplifies
    through ~40 stacked BNs (measured: f32 logits agree ~1e-3, grads cos
    0.9998; the same comparison in f64 — where BN moments now follow the
    input dtype, nn/layers.py — collapses to ~1e-6 logits / cos 0.9999996).
    A real sharding-transpose bug (the classic check_vma=False pitfall) is
    off by the axis size (8x) on a whole block, not by percent: the global
    cosine/norm assertions keep those teeth.
  - per-leaf relative errors use a GLOBAL-scale floor: a handful of leaves
    (NL conv_kv BN bias, AS sample_weights conv_kv_ds BN bias) have
    mathematically ZERO gradient (adding a constant to every attention
    logit leaves the softmax invariant), so both sides compute pure
    cancellation noise there and leaf-local relative error is meaningless.
  - sync-BN parity: the sharded training forward's batch_stats updates must
    match the monolithic mutable apply's (pmean of equal-shard moments =
    global moments);
  - a full optimizer-step smoke with real dropout (per-device masks).

Grad parity runs with dropout disabled on both sides (monolithic model
built with dropout_keep=1.0; sharded step with dropout_rng=None) — dropout
masks cannot be aligned across the two computation shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointasnl_tpu.models import PointASNLSemSegRes
from pointasnl_tpu.nn.losses import segmentation_loss
from pointasnl_tpu.parallel import make_mesh
from pointasnl_tpu.parallel.whole_scene import (
    make_scene_train_step_sharded,
    merge_batch_stats,
    scene_apply_sharded,
)
from pointasnl_tpu.train import (
    bn_momentum_schedule,
    create_train_state,
    staircase_lr_schedule,
)
from pointasnl_tpu.train.state import make_optimizer

N_DEV = 8
NUM_CLASS = 5
BN_M = 0.9


def _setup(n=256 * N_DEV, batch=1, seed=0):
    mesh = make_mesh(num_devices=N_DEV, axis_names=("data",))
    rng = np.random.RandomState(seed)
    points = jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, NUM_CLASS, size=(batch, n)))
    smpw = jnp.asarray(1.0 + rng.rand(batch, n).astype(np.float32))
    model = PointASNLSemSegRes(num_class=NUM_CLASS, dropout_keep=1.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        points, training=False, bn_momentum=BN_M,
    )
    return mesh, model, variables, points, labels, smpw


def _loss_of(logits, l1_xyz, params, labels, smpw):
    loss, _ = segmentation_loss(
        logits, labels, smpw, params, l1_xyz=l1_xyz,
        uniform_weight=0.01, weights_decay=1e-4,
    )
    return loss


def _mono_loss(model, batch_stats, points, labels, smpw, *, training):
    def loss_fn(params):
        if training:
            (logits, end_points), ups = model.apply(
                {"params": params, "batch_stats": batch_stats},
                points, training=True, bn_momentum=BN_M,
                rngs={"dropout": jax.random.PRNGKey(9)},  # keep=1.0: unused
                mutable=["batch_stats"],
            )
            aux = (ups["batch_stats"], logits)
        else:
            logits, end_points = model.apply(
                {"params": params, "batch_stats": batch_stats},
                points, training=False, bn_momentum=BN_M,
            )
            aux = ({}, logits)
        return _loss_of(logits, end_points["l1_xyz"], params, labels, smpw), aux

    return loss_fn


def _sharded_loss(mesh, batch_stats, points, labels, smpw, *, training):
    def loss_fn(params):
        logits, l1_xyz, updates = scene_apply_sharded(
            {"params": params, "batch_stats": batch_stats},
            points, mesh, training=training, bn_momentum=BN_M,
            dropout_rng=None, num_class=NUM_CLASS, nl_kv_block_size=None,
        )
        return _loss_of(logits, l1_xyz, params, labels, smpw), (updates, logits)

    return loss_fn


def _flatten(tree):
    return {jax.tree_util.keystr(p): np.asarray(v, np.float64)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _grad_compare(g_m, g_s, *, leaf_tol, cos_tol, norm_tol):
    flat_m = _flatten(g_m)
    flat_s = _flatten(g_s)
    assert set(flat_m) == set(flat_s)
    gmax = max(np.abs(v).max() for v in flat_m.values())
    sq_dot = sq_m = sq_s = 0.0
    for path, gm in flat_m.items():
        gs = flat_s[path]
        sq_dot += float(np.sum(gm * gs))
        sq_m += float(np.sum(gm * gm))
        sq_s += float(np.sum(gs * gs))
        # global-scale floor: zero-gradient leaves (softmax shift-invariant
        # biases) are pure cancellation noise on both sides
        scale = max(np.abs(gm).max(), 1e-3 * gmax)
        err = np.abs(gs - gm).max() / scale
        assert err < leaf_tol, (
            f"grad mismatch at {path}: rel err {err:.2e} "
            f"(leaf scale {np.abs(gm).max():.2e}, global {gmax:.2e})"
        )
    # Global direction + magnitude: catches any systematic over-counting
    # (a replicated-output transpose bug scales some blocks by the axis
    # size) that per-leaf percent-level slack could mask.
    cos = sq_dot / max(np.sqrt(sq_m * sq_s), 1e-30)
    norm_ratio = np.sqrt(sq_s / max(sq_m, 1e-30))
    assert cos > cos_tol, f"grad direction mismatch: cos={cos:.6f}"
    assert abs(norm_ratio - 1.0) < norm_tol, f"grad norm ratio {norm_ratio:.4f}"


@pytest.fixture(scope="module")
def trained_pieces():
    mesh, model, variables, points, labels, smpw = _setup()
    mono = jax.jit(jax.value_and_grad(
        _mono_loss(model, variables["batch_stats"], points, labels, smpw,
                   training=True),
        has_aux=True,
    ))
    shrd = jax.jit(jax.value_and_grad(
        _sharded_loss(mesh, variables["batch_stats"], points, labels, smpw,
                      training=True),
        has_aux=True,
    ))
    (loss_m, (bs_m, logits_m)), g_m = mono(variables["params"])
    (loss_s, (ups_s, logits_s)), g_s = shrd(variables["params"])
    bs_s = merge_batch_stats(variables["batch_stats"], ups_s)
    return dict(
        mesh=mesh, model=model, variables=variables,
        points=points, labels=labels, smpw=smpw,
        loss_m=loss_m, loss_s=loss_s,
        logits_m=logits_m, logits_s=logits_s,
        bs_m=bs_m, bs_s=bs_s, g_m=g_m, g_s=g_s,
    )


def test_eval_grads_match_monolithic_f64(trained_pieces):
    """Tight transpose check, in f64: EVAL-mode loss grads (no batch-moment
    rounding in the grad path) are exact to ~1e-10 per the bisection —
    any transpose bug in the ring attention, ring-gather, all_gather, or
    closure-param psum would show up as a block-scale (8x) error here.

    f64, not f32: at f32 the ring softmax's reordered accumulation perturbs
    level-1 activations at ~1e-6, which FPS/attention at the deeper levels
    can amplify into percent-level noise on individual small leaves (a
    2.2e-2 leaf error was observed at layer4_1's NL BN scale) — a tight
    per-leaf check is only meaningful where rounding can't reorder."""
    t = trained_pieces
    with jax.enable_x64():
        cast = lambda tree: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
        v = cast(t["variables"])
        points, smpw = cast(t["points"]), cast(t["smpw"])
        g_m = jax.jit(jax.grad(
            _mono_loss(t["model"], v["batch_stats"], points, t["labels"],
                       smpw, training=False), has_aux=True,
        ))(v["params"])[0]
        g_s = jax.jit(jax.grad(
            _sharded_loss(t["mesh"], v["batch_stats"], points, t["labels"],
                          smpw, training=False), has_aux=True,
        ))(v["params"])[0]
    _grad_compare(g_m, g_s, leaf_tol=1e-6, cos_tol=1 - 1e-9, norm_tol=1e-6)


def test_training_loss_and_logits_match(trained_pieces):
    t = trained_pieces
    np.testing.assert_allclose(float(t["loss_s"]), float(t["loss_m"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t["logits_s"]),
                               np.asarray(t["logits_m"]),
                               rtol=2e-2, atol=2e-2)


def test_training_grads_match_monolithic(trained_pieces):
    """THE item-7 check: grads through ring NL + ring-gather + sync-BN.

    Loose per-leaf (BN batch-moment rounding amplification — see module
    docstring; measured f32 cos 0.9998, collapses in the f64 control);
    global direction/norm keep the 8x-transpose-bug teeth.
    """
    t = trained_pieces
    _grad_compare(t["g_m"], t["g_s"],
                  leaf_tol=0.15, cos_tol=0.999, norm_tol=2e-2)


def test_sync_bn_updates_match_monolithic(trained_pieces):
    """pmean of equal-shard moments == global moments, for every BN."""
    t = trained_pieces
    flat_m = jax.tree_util.tree_flatten_with_path(t["bs_m"])[0]
    flat_s = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(t["bs_s"])[0]}
    assert len(flat_m) == len(flat_s)
    checked = 0
    for path, sm in flat_m:
        ss = flat_s[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(ss), np.asarray(sm), rtol=2e-2, atol=2e-3,
            err_msg=f"batch-stats mismatch at {jax.tree_util.keystr(path)}",
        )
        checked += 1
    assert checked > 40  # the model holds dozens of BN mean/var pairs


def test_sharded_train_step_executes_and_learns(trained_pieces):
    """Full optimizer step (with real dropout): loss finite, params move,
    BN stats move, repeated steps reduce the loss on the fixed batch."""
    t = trained_pieces
    mesh, model = t["mesh"], t["model"]
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, 1, 2e5, 0.7))
    state = create_train_state(
        model, t["points"], tx=tx, rng=jax.random.PRNGKey(0)
    )
    step = make_scene_train_step_sharded(
        mesh,
        bn_schedule=bn_momentum_schedule(1, 2e5),
        num_class=NUM_CLASS,
        nl_kv_block_size=None,
    )
    batch = {"points": t["points"], "labels": t["labels"], "smpw": t["smpw"]}
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert losses[-1] < losses[0], f"no learning: {losses}"
