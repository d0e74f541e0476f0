"""Export a trained model as a self-contained serving artifact.

Reads the trainer's args.txt + checkpoint from --model_path (the same
contract every tester uses), bakes the weights into the jitted eval-mode
forward, and writes a `.jaxexp` StableHLO artifact loadable with
pointasnl_tpu.serve.load_exported — no model code needed at serving time.

Run on the platform you will serve on (artifacts are single-platform).
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True, help="trainer log dir (args.txt + checkpoints/)")
    p.add_argument("--ckpt", default="best", help="best | latest | epoch number")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_point", type=int, default=None,
                   help="override args.txt (e.g. whole-scene sizes)")
    p.add_argument("--num_class", type=int, default=None)
    p.add_argument("--out", required=True)
    return p.parse_args(argv)


def main(argv=None):
    flags = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.models import get_model_class
    from pointasnl_tpu.serve import export_model, save_exported
    from pointasnl_tpu.train import create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.checkpoint import restore_checkpoint
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.utils import load_args

    train_args = load_args(flags.model_path)
    model_name = train_args["model"]
    num_point = flags.num_point or train_args["num_point"]
    num_class = flags.num_class or train_args.get("num_class", 21)
    with_rgb = train_args.get("with_rgb", False)
    feature_channel = 3 if (with_rgb and "seg" in model_name) else 0

    cls = get_model_class(model_name)
    kwargs = {"num_class": num_class}
    if "seg" in model_name:
        kwargs["feature_channel"] = feature_channel
    model = cls(**kwargs)

    example = jnp.zeros(
        (flags.batch_size, num_point, 3 + feature_channel), jnp.float32
    )
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, flags.batch_size, 2e5, 0.7))
    state = create_train_state(model, example, tx=tx, rng=jax.random.PRNGKey(0))
    state = restore_checkpoint(
        state, os.path.join(flags.model_path, "checkpoints"), flags.ckpt
    )

    blob = export_model(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        batch_size=flags.batch_size,
        num_point=num_point,
        feature_channel=feature_channel,
        metadata={"model": model_name, "ckpt": str(flags.ckpt),
                  "step": int(state.step)},
    )
    save_exported(flags.out, blob)
    print(f"exported {model_name} ({flags.batch_size}x{num_point}) "
          f"-> {flags.out} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
