"""Unit tests for __graft_entry__'s driver-side helpers (no backend).

The dryrun's certification artifacts depend on two small pieces of
machinery that deserve their own teeth: the fd-level stderr line filter
(suppresses the benign cpu_aot_loader E-lines on the in-process path) and
the extended-check cost table staying in sync with the check functions.
"""

import os
import subprocess
import sys

import __graft_entry__ as g


def test_stderr_line_filter_drops_only_matching_lines(capfd):
    with g._StderrLineFilter():
        os.write(2, b"keep one\n")
        os.write(2, b"E0820 cpu_aot_loader.cc:210] pseudo-feature noise\n")
        os.write(2, b"keep two\npartial cpu_aot_loader line\nkeep three\n")
    os.write(2, b"after restore\n")
    err = capfd.readouterr().err
    assert "keep one\n" in err and "keep two\n" in err and "keep three\n" in err
    assert "after restore" in err
    assert "cpu_aot_loader" not in err


def test_stderr_filter_subprocess_writers_are_filtered():
    """Children spawned inside the scope inherit the filtered fd 2."""
    r, w = os.pipe()
    saved = os.dup(2)
    os.dup2(w, 2)
    os.close(w)
    try:
        with g._StderrLineFilter():
            subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.stderr.write('child cpu_aot_loader noise\\n');"
                 "sys.stderr.write('child signal\\n')"],
                check=True,
            )
    finally:
        os.dup2(saved, 2)
        os.close(saved)
    data = os.read(r, 65536).decode()
    os.close(r)
    assert "child signal" in data
    assert "cpu_aot_loader" not in data


def test_extended_check_table_matches_check_functions():
    """Every estimate row resolves to a runnable check function and every
    check_* function is listed (a renamed check must not silently vanish
    from the dryrun)."""
    table = {name for name, _ in g._EXTENDED_CHECKS}
    impls = {
        "ring_attention_2d_mesh": g.check_ring_attention,
        "sharded_geometry_parity": g.check_sharded_geometry,
        "sharded_train_step": g.check_sharded_train_step,
        "sharded_scan_forward": g.check_sharded_scan_forward,
        "sharded_scan_train_step": g.check_sharded_scan_train_step,
    }
    assert table == set(impls)
    for name, est in g._EXTENDED_CHECKS:
        assert est > 0
        assert callable(impls[name])
