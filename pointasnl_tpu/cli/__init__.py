"""CLI train/eval drivers mirroring the reference's 10 entry points."""
