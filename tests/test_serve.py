"""Serving-export tests: artifact round-trip + CLI + parity with direct apply."""

import jax
import jax.numpy as jnp
import numpy as np

from pointasnl_tpu.models import PointASNLCls
from pointasnl_tpu import serve


def _init(model, x):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return model.init(rngs, x, training=False, bn_momentum=0.9)


def test_export_roundtrip_matches_apply(tmp_path, rng):
    model = PointASNLCls(num_class=7, adaptive_sample=True)
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    variables = _init(model, x)
    blob = serve.export_model(model, variables, batch_size=2, num_point=128,
                              metadata={"model": "pointasnl_cls"})
    path = tmp_path / "m.jaxexp"
    serve.save_exported(str(path), blob)

    art = serve.load_exported(str(path))
    assert art.header["model"] == "pointasnl_cls"
    assert art.header["num_point"] == 128
    got = np.asarray(art(x))
    want, _ = model.apply(variables, x, training=False, bn_momentum=0.9)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_export_cli_from_trained_logdir(tmp_path, rng):
    from pointasnl_tpu.cli import export_model as cli
    from pointasnl_tpu.train import create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.checkpoint import CheckpointManager
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.utils import save_args

    model = PointASNLCls(num_class=5, adaptive_sample=False)
    x = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, 1, 2e5, 0.7))
    state = create_train_state(model, x, tx=tx, rng=jax.random.PRNGKey(0))

    log_dir = tmp_path / "trained"
    save_args({"model": "pointasnl_cls", "num_point": 128, "num_class": 5,
               "batch_size": 1}, str(log_dir))
    CheckpointManager(str(log_dir / "checkpoints")).save(state, epoch=0, is_best=True)

    out = tmp_path / "model.jaxexp"
    cli.main(["--model_path", str(log_dir), "--ckpt", "best",
              "--batch_size", "1", "--out", str(out)])
    art = serve.load_exported(str(out))
    logits = np.asarray(art(x))
    want, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, training=False, bn_momentum=0.9)
    np.testing.assert_allclose(logits, np.asarray(want), rtol=1e-5, atol=1e-5)
