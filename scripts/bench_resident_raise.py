"""A/B the raised-VMEM resident kNN scan vs the spatial kernel at 12k-65k.

RESIDENT_RAISED_MAX_N extends the VMEM-resident full-scan rung past the
default 16 MB scoped-VMEM budget via pltpu.CompilerParams(vmem_limit_bytes)
(knn.py). This decides the routing question it reopens: for
12288 < N <= 65536, does the O(N^2) resident scan beat the Morton/sphere-
pruned spatial kernel (the current route), on both surface-like and
gaussian data? Self-kNN (query == support), k=32, B=1 — the whole-scene
regime; fully-jitted chained timing (CLAUDE.md timing trap).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_resident_raise.py
"""

import time

import jax
import numpy as np

from pointasnl_tpu.data.synthetic import gaussian_cloud, surface_scene
from pointasnl_tpu.ops.pallas import knn as pknn
from pointasnl_tpu.ops.pallas import knn_spatial as pks

K = 32


def timeit(fn, x, iters=10):
    step = jax.jit(lambda c: c * (1 + fn(c)[0][0, 0, 0] * 1e-30))
    x = step(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    for n in (16384, 32768, 65536):
        # constant areal density matched to the 131k/extent-6.0 reference
        # scene (CLAUDE.md): extent ~ sqrt(n)
        ext = 6.0 * (n / 131072.0) ** 0.5
        for name, cloud in (
            ("surface", surface_scene(rng, 1, n, extent=ext)),
            ("gaussian", gaussian_cloud(rng, 1, n)),
        ):
            x = jax.numpy.asarray(cloud)
            try:
                t_res = timeit(lambda c: pknn._knn_scan(K, c, c), x)
            except Exception as e:  # compile failure past the raised budget
                t_res = float("nan")
                print(f"N={n} {name}: resident FAILS {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
            t_sp = timeit(lambda c: pks.knn_point(K, c, c), x)
            print(f"N={n} {name}: resident-raised {t_res:.1f} ms | "
                  f"spatial {t_sp:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
