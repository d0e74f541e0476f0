"""One-command validator for the reference's published pretrained weights.

The reference publishes a pretrained ScanNet checkpoint
(/root/reference/README.md:92-94: pointasnl_sem_seg_res, 66.93 val mIoU,
tested via test_scannet_grid.py). This build environment has zero egress, so
real-weight parity cannot be closed here — this CLI is the ready-to-run
closure for when the checkpoint IS reachable:

  1. extract the TF1 ckpt to an npz (once, in any TF-capable env —
     utils/tf_import.py's docstring has the 4-line snippet; if TensorFlow is
     importable, pass --ckpt and this CLI extracts in-process);
  2. run:

    python -m pointasnl_tpu.cli.validate_tf_checkpoint \
        --npz weights.npz --data data/Scannet --log_dir log/validate_ref

  which imports the weights (utils/tf_import.py name mapping), runs the
  grid tester's full possibility-voted evaluation on the validation split
  (cli/test_scannet_grid.py — the reference's protocol), prints the mIoU,
  and compares it against --expected_miou (default 0.6693) within
  --tolerance (default 0.01 — vote-order noise, not weight noise).

Exit status: 0 when |mIoU - expected| <= tolerance (or when --expected_miou
is 0, reporting only), 1 otherwise.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile


def parse_args(argv=None):
    p = argparse.ArgumentParser("validate_tf_checkpoint", description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--npz", help="npz extracted from the TF1 checkpoint")
    src.add_argument(
        "--ckpt",
        help="TF1 checkpoint prefix (requires TensorFlow importable; "
        "otherwise extract to --npz first)",
    )
    p.add_argument("--data", required=True, help="ScanNet grid dataset root")
    p.add_argument("--model", default="pointasnl_sem_seg_res")
    p.add_argument("--num_class", type=int, default=21)
    p.add_argument("--num_point", type=int, default=10240)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--with_rgb", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--num_votes", type=float, default=10.0)
    p.add_argument("--max_rounds", type=int, default=100)
    p.add_argument(
        "--log_dir", default=None,
        help="where to keep the imported checkpoint + tester dump "
        "(default: a temp dir, deleted afterwards)",
    )
    p.add_argument(
        "--expected_miou", type=float, default=0.6693,
        help="published reference number to compare against; 0 = report only",
    )
    p.add_argument("--tolerance", type=float, default=0.01)
    return p.parse_args(argv)


def _extract_ckpt_to_npz(ckpt: str, out_npz: str) -> None:
    try:
        from tensorflow.python.training import py_checkpoint_reader
    except ImportError as e:
        raise SystemExit(
            "--ckpt needs TensorFlow to read TF1 checkpoints and this "
            "environment has none. Extract once elsewhere:\n"
            "  import numpy as np\n"
            "  from tensorflow.python.training import py_checkpoint_reader\n"
            f"  r = py_checkpoint_reader.NewCheckpointReader({ckpt!r})\n"
            "  np.savez('weights.npz', **{n: r.get_tensor(n)\n"
            "           for n in r.get_variable_to_shape_map()})\n"
            "then rerun with --npz weights.npz"
        ) from e
    import numpy as np

    r = py_checkpoint_reader.NewCheckpointReader(ckpt)
    np.savez(out_npz, **{n: r.get_tensor(n)
                         for n in r.get_variable_to_shape_map()})


def main(argv=None):
    flags = parse_args(argv)

    from pointasnl_tpu.cli import import_tf_checkpoint, test_scannet_grid

    workdir = flags.log_dir
    tmp = None
    if workdir is None:
        tmp = tempfile.TemporaryDirectory(prefix="validate_tf_ckpt_")
        workdir = tmp.name
    os.makedirs(workdir, exist_ok=True)
    try:
        npz = flags.npz
        if npz is None:
            npz = os.path.join(workdir, "extracted_weights.npz")
            _extract_ckpt_to_npz(flags.ckpt, npz)

        import_dir = os.path.join(workdir, "imported")
        import_tf_checkpoint.main([
            "--npz", npz,
            "--model", flags.model,
            "--num_class", str(flags.num_class),
            "--num_point", str(flags.num_point),
            "--batch_size", str(flags.batch_size),
            "--with_rgb", str(flags.with_rgb),
            "--log_dir", import_dir,
        ])

        miou = test_scannet_grid.main([
            "--data", flags.data,
            "--model_path", import_dir,
            "--dump_dir", os.path.join(workdir, "dump"),
            "--num_votes", str(flags.num_votes),
            "--max_rounds", str(flags.max_rounds),
            "--split", "validation",
        ])
        if miou is None:
            raise SystemExit("tester returned no mIoU (wrong split?)")
        print(f"validate_tf_checkpoint: voted mIoU = {miou:.4f} "
              f"(published reference: {flags.expected_miou:.4f})")
        if flags.expected_miou > 0:
            ok = abs(miou - flags.expected_miou) <= flags.tolerance
            print("PARITY OK" if ok else "PARITY MISMATCH")
            if not ok:
                sys.exit(1)
        return miou
    finally:
        if tmp is not None:
            tmp.cleanup()


if __name__ == "__main__":
    main()
