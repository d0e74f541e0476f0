"""Sweep the spatial kNN at CROP scale (layer0 self-kNN, 4 x 10240^2, k=32).

VERDICT r2 item 4b: layer0's self-kNN is ~25 ms of the 72 ms seg step on
the resident full-scan kernel; the Morton/sphere-pruned spatial kernel was
within 29.9-vs-34.1 ms on surface-like data with whole-scene tuning
(SEG_W=512). This sweeps (seg_w, tile_m) at crop scale on BOTH
distributions, plus the resident baseline, fetch-forced.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_knn_crop.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pointasnl_tpu.data.synthetic import gaussian_cloud, surface_scene
from pointasnl_tpu.ops.pallas import knn as pknn
from pointasnl_tpu.ops.pallas import knn_spatial as pks


def timeit(fn, x, iters=20):
    # FULLY-JITTED chain (CLAUDE.md timing trap): the cloud->cloud dependency
    # lives inside one dispatch, so iterations serialize on device without
    # per-iteration eager round-trips through the tunnel.
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
    B, N, K = 4, 10240, 32
    clouds = {
        "surface": jnp.asarray(surface_scene(rng, B, N)),
        "gaussian": jnp.asarray(gaussian_cloud(rng, B, N)),
    }
    for name, x in clouds.items():
        t = timeit(lambda c: pknn._knn_scan(K, c, c), x)
        print(f"{name}: resident baseline {t:.2f} ms", flush=True)
        for seg_w in (256, 512, 1024):
            for tile_m in (128, 256):
                try:
                    t = timeit(
                        lambda c, s=seg_w, m=tile_m: pks.knn_point(
                            K, c, c, seg_w=s, tile_m=m
                        ),
                        x,
                    )
                    print(f"{name}: spatial seg_w={seg_w} tile_m={tile_m} "
                          f"{t:.2f} ms", flush=True)
                except Exception as e:
                    print(f"{name}: spatial seg_w={seg_w} tile_m={tile_m} "
                          f"FAILS {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
