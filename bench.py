"""Benchmark: end-to-end training throughput of the flagship configs.

Runs the jitted train step on the available accelerator for:
  - modelnet40_cls: pointasnl_cls + AS, B=16, N=1024 (reference train.py:18-35)
  - scannet_seg_res: pointasnl_sem_seg_res, B=4, N=10240 (reference
    ScanNet grid recipe, README.md:80-84)
each in float32 and bfloat16 compute, reporting points/sec/chip, step time,
and MFU (XLA cost-analysis FLOPs / step time / chip peak).

Prints ONE JSON line. The primary metric stays the cls-train throughput for
round-over-round comparability; all runs are in "entries", including the
batch-scaled variants and a 131k-point whole-scene single-pass inference
entry (the scene-scale capability the reference's crop pipeline cannot
express; skipped gracefully if it cannot run).

Crash/timeout safety (r4/r5): every completed entry is persisted to
`bench_partial.json` immediately, and the bench runs under a wall-clock
budget (env BENCH_BUDGET_S, default 1050 s — the driver kills at ~20 min).
When the budget's SIGALRM fires, or the driver sends SIGTERM/SIGINT, the
single JSON line is printed from whatever completed so far and the process
exits 0 — a kill mid-entry can no longer lose the finished measurements
(round-3 failure mode: rc=124 after entry 6 of 8 with nothing parseable on
stdout). `skipped_entries` is always honest (r5): it carries budget-gated
skips, the entry in flight when a signal fired, and every planned-but-
unreached config — the r4 artifact's `[]` after losing 3 of 4 entries can't
recur. Entries are ordered so the primary metric and the two recipe configs
land first, and an entry is only started if the remaining budget plausibly
covers it.

Baseline note: the reference publishes no throughput numbers (SURVEY.md §6)
— accuracy only. "vs_baseline" is therefore measured against an ESTIMATE
(flagged in the output): ~0.30 s/step for the TF1+CUDA10 single-GPU cls
config, dominated by its per-layer host kNN round trips (tf.py_func at
/root/reference/utils/pointasnl_util.py:62). Treat it as an order-of-
magnitude anchor, not a measurement.

Methodology note (r2): timing is forced by FETCHING a value computed from
the final step of the chain. r1's numbers (and the r1-recorded 7.2M pts/s
headline) used block_until_ready, which the tunneled TPU runtime satisfies
before execution completes — those numbers were overlap illusions, ~100x
too fast. Fetch-forced sustained throughput is what a real training loop
experiences (it fetches metrics every step).

MFU note: the denominator is the chip's bf16 MXU peak for both precisions —
XLA's default f32 matmul path on TPU also runs through bf16 MXU passes.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_ESTIMATE_POINTS_PER_SEC = 16 * 1024 / 0.30  # ≈54,613 — see docstring

# Chip peak dense-matmul FLOP/s (bf16 MXU) by jax device_kind.
PEAK_FLOPS_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v6e": 918e12,
}

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
_PARTIAL_PATH = os.path.join(_REPO_DIR, "bench_partial.json")

# Mutable run state shared with the signal handlers.
# "in_flight" is the entry being measured right now; "pending" is every
# planned-but-not-started config. Both feed skipped_entries when the alarm
# fires mid-run, so a reader can always tell "completed everything" from
# "lost N configs to the alarm" (VERDICT r4 item 2: the r4 artifact showed
# skipped_entries [] after losing 3 of 4 entries).
_STATE: dict = {
    "entries": [],
    "skipped_entries": [],
    "in_flight": None,
    "pending": [],
    "eval_points_per_sec_per_chip": None,
    "device_kind": None,
    "emitted": False,
    "deadline": None,
}


def _remaining() -> float:
    return _STATE["deadline"] - time.monotonic()


def _result_json() -> str:
    entries = _STATE["entries"]
    primary = next(
        (e for e in entries if e["config"] == "modelnet40_cls"
         and e["dtype"] == "float32"),
        entries[0] if entries else None,
    )
    skipped = list(_STATE["skipped_entries"])
    if _STATE["in_flight"] is not None:
        skipped.append(dict(_STATE["in_flight"], reason="in_flight_at_exit"))
    skipped.extend(dict(p, reason="not_reached") for p in _STATE["pending"])
    return json.dumps(
        {
            "metric": "modelnet40_cls_train_points_per_sec_per_chip",
            "value": primary["points_per_sec_per_chip"] if primary else None,
            "unit": "points/sec/chip",
            "vs_baseline": round(
                primary["points_per_sec_per_chip"]
                / BASELINE_ESTIMATE_POINTS_PER_SEC,
                3,
            ) if primary else None,
            "baseline_is_estimate": True,
            "baseline_note": (
                "reference publishes no throughput; baseline is an "
                "estimated 0.30 s/step for the TF1+CUDA10 cls config"
            ),
            "device_kind": _STATE["device_kind"],
            "eval_points_per_sec_per_chip": _STATE[
                "eval_points_per_sec_per_chip"
            ],
            "entries": entries,
            "skipped_entries": skipped,
        }
    )


def _persist_partial() -> None:
    try:
        tmp = _PARTIAL_PATH + ".tmp"
        with open(tmp, "w") as f:
            f.write(_result_json() + "\n")
        os.replace(tmp, _PARTIAL_PATH)
    except OSError:
        pass  # persistence is best-effort; never fail the bench on it


def _emit_and_exit(why: str) -> None:
    """Print the one JSON line from whatever completed and exit 0."""
    if _STATE["emitted"]:
        os._exit(0)
    _STATE["emitted"] = True
    print(f"# bench: emitting early ({why}); "
          f"{len(_STATE['entries'])} entries completed",
          file=sys.stderr, flush=True)
    print(_result_json(), flush=True)
    _persist_partial()
    # os._exit: a python exit would run jax atexit hooks (and possibly hang
    # on the tunneled runtime) — the JSON line is already on stdout.
    os._exit(0)


def _install_budget(budget_s: float) -> None:
    _STATE["deadline"] = time.monotonic() + budget_s

    def on_signal(signum, frame):
        _emit_and_exit(f"signal {signum}")

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)
    signal.signal(signal.SIGALRM, on_signal)
    signal.alarm(max(1, int(budget_s)))


def _flops_of(compiled) -> float | None:
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = cost.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def bench_one(name: str, task: str, batch_size: int, num_point: int, dtype: str,
              n_iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.models import PointASNLCls, PointASNLSemSegRes
    from pointasnl_tpu.nn import precision
    from pointasnl_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        make_train_step,
        staircase_lr_schedule,
    )
    from pointasnl_tpu.train.state import make_optimizer

    # Progress to stderr: on a cold host every entry recompiles through the
    # remote compile service (30-120 s each), so a silent 30-minute run is
    # indistinguishable from a hang without this.
    print(f"# bench_one {name} {dtype} B={batch_size} N={num_point} ...",
          file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(batch_size, num_point, 3).astype(np.float32))
    if task == "cls":
        batch = {
            "points": points,
            "labels": jnp.asarray(rng.randint(0, 40, size=(batch_size,))),
        }
    else:
        batch = {
            "points": points,
            "labels": jnp.asarray(rng.randint(0, 21, size=(batch_size, num_point))),
            "smpw": jnp.ones((batch_size, num_point), jnp.float32),
        }

    with precision.compute_dtype(dtype):
        if task == "cls":
            model = PointASNLCls(num_class=40, adaptive_sample=True)
        else:
            model = PointASNLSemSegRes(num_class=21)
        tx = make_optimizer(
            "adam", staircase_lr_schedule(1e-3, batch_size, 200000.0, 0.7)
        )
        state = create_train_state(model, points, tx=tx, rng=jax.random.PRNGKey(0))
        step = make_train_step(
            bn_schedule=bn_momentum_schedule(batch_size, 200000.0),
            task=task,
            donate=True,
        )
        key = jax.random.PRNGKey(1)

        # Warmup / compile. The FLOPs cost-analysis compile comes AFTER the
        # warmup so it hits the just-populated persistent cache — doing it
        # first doubled the cold-compile cost of every entry (lower().compile()
        # does not share the jit's in-process executable cache).
        state, m = step(state, batch, key)
        float(m["loss"])
        flops = _flops_of(step.lower(state, batch, key).compile())

        # Timing: the chain is forced by FETCHING a value computed from the
        # final step. block_until_ready through the tunneled TPU runtime has
        # been observed to return before execution (r1's numbers were overlap
        # illusions, 100x too fast); a fetched loss cannot lie.
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, m = step(state, batch, key)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n_iters

    peak = PEAK_FLOPS_BF16.get(jax.devices()[0].device_kind)
    print(f"# bench_one {name} {dtype}: {dt * 1e3:.2f} ms/step",
          file=sys.stderr, flush=True)
    return {
        "config": name,
        "dtype": dtype,
        "batch_size": batch_size,
        "num_point": num_point,
        "points_per_sec_per_chip": round(batch_size * num_point / dt, 1),
        "train_step_ms": round(dt * 1e3, 3),
        "flops_per_step": flops,
        "mfu": round(flops / dt / peak, 4) if (flops and peak) else None,
    }


def bench_whole_scene(n: int = 131072, block: int = 4096,
                      n_iters: int = 4) -> dict | None:
    """Single-pass whole-scene seg inference on one chip — the scene-scale
    capability entry (memory-bounded NL attention + spatially-pruned kNN;
    the reference must chop scenes into 8-10k crops, and a dense NL map at
    this N could not exist: ~8.6 GB at layer1 alone). Surface-like scene at
    indoor-scan density (extent 6.0 @ 131k, CLAUDE.md). Returns None instead
    of failing the bench if this entry cannot run."""
    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.data.synthetic import surface_scene
    from pointasnl_tpu.models import PointASNLSemSegRes

    print(f"# bench_whole_scene N={n} ...", file=sys.stderr, flush=True)
    try:
        rng = np.random.RandomState(0)
        n = n - n % 256
        points = jnp.asarray(surface_scene(rng, 1, n, extent=6.0))
        model = PointASNLSemSegRes(num_class=21, nl_kv_block_size=block)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            points[:, :2048],  # init small; params are shape-agnostic
            training=False,
            bn_momentum=0.9,
        )

        def one(pts):
            logits, _ = model.apply(
                variables, pts, training=False, bn_momentum=0.9
            )
            return pts + logits.sum() * 1e-12  # chain iterations

        run = jax.jit(one)
        x = run(points)
        float(x[0, 0, 0])  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n_iters):
            x = run(x)
        _ = float(x[0, 0, 0])
        dt = (time.perf_counter() - t0) / n_iters
        return {
            "config": "whole_scene_single_pass",
            "dtype": "float32",
            "batch_size": 1,
            "num_point": n,
            "points_per_sec_per_chip": round(n / dt, 1),
            "forward_ms": round(dt * 1e3, 1),
        }
    except Exception as e:  # never fail the whole bench on this entry
        # stderr: stdout must stay exactly one JSON line for the driver
        print(f"# whole-scene entry skipped: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
        return None


def bench_eval_throughput(n_iters: int = 20) -> float:
    """Forward-only (inference) throughput on the cls config,
    dependency-chained so the tunnel cannot overlap dispatches."""
    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.models import PointASNLCls
    from pointasnl_tpu.train import create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.state import make_optimizer

    print("# bench_eval_throughput ...", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(16, 1024, 3).astype(np.float32))
    model = PointASNLCls(num_class=40, adaptive_sample=True)
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, 16, 200000.0, 0.7))
    state = create_train_state(model, points, tx=tx, rng=jax.random.PRNGKey(0))

    @jax.jit
    def chained_predict(st, pts):
        logits, _ = st.apply_fn(
            {"params": st.params, "batch_stats": st.batch_stats},
            pts,
            training=False,
            bn_momentum=0.9,
        )
        return pts + logits.sum() * 1e-12

    x = chained_predict(state, points)
    float(x[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        x = chained_predict(state, x)
    _ = float(x[0, 0, 0])  # fetch = the only trustworthy completion barrier
    return 16 * 1024 * n_iters / (time.perf_counter() - t0)


# Ordered so the primary metric (cls f32) and the two recipe configs
# (train.py:18-35 cls; README.md:80-84 grid seg) complete first on a
# budget-constrained cold host; eval throughput third (it fills the
# headline JSON field, and on a 1-CPU host each entry costs ~4-6 min of
# trace+lower that the executable cache cannot skip — the driver window
# fits ~3 entries); batch-scaled variants (r3: the recipe batch sizes
# under-feed the chip) and the whole-scene capability entry follow.
PLAN = [
    ("modelnet40_cls", "cls", 16, 1024, "float32"),
    ("scannet_seg_res", "seg", 4, 10240, "float32"),
    ("eval_throughput", None, 16, 1024, "float32"),
    ("modelnet40_cls", "cls", 16, 1024, "bfloat16"),
    ("scannet_seg_res", "seg", 4, 10240, "bfloat16"),
    ("modelnet40_cls_b64", "cls", 64, 1024, "bfloat16"),
    ("scannet_seg_res_b16", "seg", 16, 10240, "float32"),
    ("scannet_seg_res_b16", "seg", 16, 10240, "bfloat16"),
    ("whole_scene_single_pass", None, 1, 131072, "float32"),
]


def main():
    # Default budget: the driver's kill window is ~20 min; 1050 s leaves
    # ~2.5 min for the emit + any in-flight dispatch to drain. r4's 900 s
    # default fired during the seg f32 cold compile (~10 min through the
    # remote compile service) and lost the flagship entry.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1050"))
    _install_budget(budget_s)

    # Seed the skip accounting BEFORE backend init (~1 min through the
    # tunnel): an alarm that fires during init must still report every
    # planned config as not_reached instead of an ambiguous empty list.
    _STATE["pending"] = [
        {"config": name, "dtype": dtype} for name, _, _, _, dtype in PLAN
    ]

    import jax

    # Persistent compilation cache: a cold host recompiles every entry
    # through the remote compile service (~30-120 s each; a full bench run
    # was measured at 30+ min cold). If the backend supports executable
    # serialization this turns re-runs into minutes; if not, jax warns and
    # proceeds — never fatal. On the TPU backend serialized executables are
    # host-ISA independent; if this ever resolves to CPU, segregate per host
    # fingerprint (the SIGILL class utils/cache.py exists to prevent).
    cache_dir = os.path.join(_REPO_DIR, ".jax_cache_tpu")
    if jax.default_backend() == "cpu":
        from pointasnl_tpu.utils.cache import host_cache_dir

        cache_dir = host_cache_dir(cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _STATE["device_kind"] = jax.devices()[0].device_kind

    for name, task, bs, np_, dtype in PLAN:
        _STATE["pending"].pop(0)
        # Only skip an entry when the remaining budget is clearly hopeless
        # (under a cold-compile floor). Starting an entry that doesn't finish
        # costs nothing — the SIGALRM handler emits whatever completed (and
        # records the in-flight + unreached configs as skips) — but skipping
        # one that would have finished loses a measurement, so the gate is
        # deliberately aggressive. (An earlier 1.3x-slowest gate let the
        # first entry's one-off backend-init + cold-compile cost veto every
        # later, cheaper entry.)
        need = 60.0
        if _remaining() < need:
            _STATE["skipped_entries"].append(
                {"config": name, "dtype": dtype, "reason": "budget"}
            )
            print(f"# skipping {name} {dtype}: {_remaining():.0f}s left "
                  f"< {need:.0f}s needed", file=sys.stderr, flush=True)
            continue
        _STATE["in_flight"] = {"config": name, "dtype": dtype}
        if name == "eval_throughput":
            _STATE["eval_points_per_sec_per_chip"] = round(
                bench_eval_throughput(), 1
            )
        elif name == "whole_scene_single_pass":
            scene = bench_whole_scene()
            if scene is not None:
                _STATE["entries"].append(scene)
        else:
            _STATE["entries"].append(bench_one(name, task, bs, np_, dtype))
        _STATE["in_flight"] = None
        _persist_partial()

    signal.alarm(0)
    _STATE["emitted"] = True
    print(_result_json(), flush=True)
    _persist_partial()


if __name__ == "__main__":
    main()
