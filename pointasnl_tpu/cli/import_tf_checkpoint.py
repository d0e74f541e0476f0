"""Import a reference TF1 pretrained checkpoint into a tester-ready log dir.

The reference publishes pretrained weights (/root/reference/README.md:92-94,
e.g. pointasnl_sem_seg_res on ScanNet at 66.93 mIoU) as tf.train.Saver
checkpoints. Extract them to an npz once in any TF-capable environment (see
utils/tf_import.py's docstring for the 4-line snippet), then:

    python -m pointasnl_tpu.cli.import_tf_checkpoint \
        --npz weights.npz --model pointasnl_sem_seg_res \
        --num_point 10240 --with_rgb True --log_dir log/imported

The resulting log dir contains args.txt plus a checkpoint the matching
tester restores directly, e.g.:

    python -m pointasnl_tpu.cli.test_scannet_grid --model_path log/imported ...
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--npz", required=True, help="npz extracted from the TF ckpt")
    p.add_argument("--model", default="pointasnl_sem_seg_res")
    p.add_argument("--num_class", type=int, default=21)
    p.add_argument("--num_point", type=int, default=10240)
    p.add_argument("--batch_size", type=int, default=4,
                   help="recorded in args.txt for the tester's default")
    p.add_argument("--with_rgb", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--log_dir", required=True)
    return p.parse_args(argv)


def main(argv=None):
    flags = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.models import get_model_class
    from pointasnl_tpu.train import create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.checkpoint import CheckpointManager
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.utils import save_args
    from pointasnl_tpu.utils.tf_import import import_npz

    feature_channel = 3 if (flags.with_rgb and "seg" in flags.model) else 0
    cls = get_model_class(flags.model)
    kwargs = {"num_class": flags.num_class}
    if "seg" in flags.model:
        kwargs["feature_channel"] = feature_channel
    model = cls(**kwargs)

    example = jnp.zeros((1, flags.num_point, 3 + feature_channel), jnp.float32)
    tx = make_optimizer(
        "adam", staircase_lr_schedule(1e-3, flags.batch_size, 2e5, 0.7)
    )
    state = create_train_state(model, example, tx=tx, rng=jax.random.PRNGKey(0))

    variables = import_npz(
        flags.npz, {"params": state.params, "batch_stats": state.batch_stats}
    )
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )

    os.makedirs(flags.log_dir, exist_ok=True)
    save_args(
        {
            "model": flags.model,
            "num_class": flags.num_class,
            "num_point": flags.num_point,
            "batch_size": flags.batch_size,
            "with_rgb": flags.with_rgb,
            "imported_from": os.path.abspath(flags.npz),
        },
        flags.log_dir,
    )
    # Checkpoints live directly in log_dir — where every tester's
    # --model_path restore looks (the r5 validator's dry test caught the
    # original "checkpoints/" subdir, which no tester ever read).
    mgr = CheckpointManager(flags.log_dir)
    path = mgr.save(state, epoch=0, is_best=True)
    print(f"imported {flags.npz} -> {path} (aliases: latest, best)")
    return path


if __name__ == "__main__":
    main()
