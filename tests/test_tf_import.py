"""Reference TF1 checkpoint import: name mapping + round-trip tests.

The mapping rules are derived by reading the reference's variable scoping
(see utils/tf_import.py's docstring for the line citations); these tests pin
the tricky cases — the re-entered scopes around AdaptiveSampling /
SampleWeights / PointNonLocalCell — and round-trip full models through
export_tf_vars -> convert_tf_vars.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointasnl_tpu.models import PointASNLCls, PointASNLSemSeg, PointASNLSemSegRes
from pointasnl_tpu.utils import tf_import


def _init(model, n):
    x = jnp.zeros((2, n, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return model.init(rngs, x, training=False, bn_momentum=0.9)


def test_scope_nesting_names():
    """The reference re-enters the SA scope for AS/SampleWeights (twice) and
    the NL cell (once) — pointasnl_util.py:159,167,182."""
    as_path = ("params", "layer1_1", "adaptive_sampling", "sample_weights",
               "conv_kv_ds", "conv", "kernel")
    assert (tf_import.flax_path_to_tf_name(as_path)
            == "layer1_1/layer1_1/layer1_1/conv_kv_ds/weights")
    nl_path = ("params", "layer1_1", "nonlocal", "conv_back_project", "bn", "scale")
    assert (tf_import.flax_path_to_tf_name(nl_path)
            == "layer1_1/layer1_1/conv_back_project/bn/gamma")
    bn_stat = ("batch_stats", "layer0", "conv0", "bn", "mean")
    assert tf_import.flax_path_to_tf_name(bn_stat) == "layer0/conv0/bn/moving_mean"
    fc = ("params", "fc1", "dense", "bias")
    assert tf_import.flax_path_to_tf_name(fc) == "fc1/biases"


@pytest.mark.parametrize(
    "model,n",
    [
        (PointASNLCls(num_class=40, adaptive_sample=True), 256),
        (PointASNLSemSeg(num_class=21), 256),
        (PointASNLSemSegRes(num_class=21), 256),
    ],
    ids=["cls", "sem_seg", "sem_seg_res"],
)
def test_roundtrip_all_models(model, n):
    variables = _init(model, n)
    tf_vars = tf_import.export_tf_vars(variables)
    # TF conv kernels must carry the reference's leading singleton dims
    assert any(v.ndim == 4 for v in tf_vars.values())
    restored = tf_import.convert_tf_vars(tf_vars, variables)
    flat_a = tf_import._flatten(variables)
    flat_b = tf_import._flatten(restored)
    assert set(flat_a) == set(flat_b)
    for path in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[path]), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_missing_and_unused_are_reported():
    model = PointASNLCls(num_class=4, adaptive_sample=False)
    variables = _init(model, 128)
    tf_vars = tf_import.export_tf_vars(variables)
    victim = sorted(tf_vars)[0]
    broken = dict(tf_vars)
    del broken[victim]
    with pytest.raises(ValueError, match="missing"):
        tf_import.convert_tf_vars(broken, variables)
    extra = dict(tf_vars)
    extra["layerX/unknown/weights"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="no destination"):
        tf_import.convert_tf_vars(extra, variables)
    # optimizer slot variables are ignored silently
    ok = dict(tf_vars)
    ok["fc1/weights/Adam"] = np.zeros((2, 2), np.float32)
    ok["beta1_power"] = np.zeros((), np.float32)
    tf_import.convert_tf_vars(ok, variables)


def test_shape_clash_is_reported():
    model = PointASNLCls(num_class=4, adaptive_sample=False)
    variables = _init(model, 128)
    tf_vars = tf_import.export_tf_vars(variables)
    name = next(n for n in tf_vars if n.endswith("/weights"))
    tf_vars[name] = np.zeros((1, 1, 7, 7), np.float32)
    with pytest.raises(ValueError, match="shape clash"):
        tf_import.convert_tf_vars(tf_vars, variables)


def test_import_cli_end_to_end(tmp_path, rng):
    """npz -> CLI -> checkpoint restorable with the converted weights."""
    from pointasnl_tpu.cli import import_tf_checkpoint as cli
    from pointasnl_tpu.train import create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.checkpoint import restore_checkpoint
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.utils import load_args

    model = PointASNLSemSegRes(num_class=5, feature_channel=3)
    x = jnp.asarray(rng.randn(1, 256, 6).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)}
    variables = model.init(rngs, x, training=False, bn_momentum=0.9)
    npz = tmp_path / "weights.npz"
    np.savez(npz, **tf_import.export_tf_vars(variables))

    log_dir = tmp_path / "imported"
    cli.main([
        "--npz", str(npz), "--model", "pointasnl_sem_seg_res",
        "--num_class", "5", "--num_point", "256", "--log_dir", str(log_dir),
    ])

    assert load_args(str(log_dir))["model"] == "pointasnl_sem_seg_res"
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, 4, 2e5, 0.7))
    state = create_train_state(
        model, jnp.zeros((1, 256, 6), jnp.float32), tx=tx,
        rng=jax.random.PRNGKey(0),
    )
    state = restore_checkpoint(state, str(log_dir / "checkpoints"), "best")
    got = tf_import._flatten(state.params)
    want = tf_import._flatten(variables["params"])
    for path in want:
        np.testing.assert_array_equal(
            np.asarray(got[path]), np.asarray(want[path]), err_msg=str(path)
        )
