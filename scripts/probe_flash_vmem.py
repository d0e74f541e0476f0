"""Probe the real scoped-VMEM boundary of the flash-attention kernels.

Compiles (not just traces) forward+backward at increasing KV length N on the
current backend and reports pass/fail, so fits_vmem()'s analytic working-set
model can be checked against the hardware truth. Run on the TPU chip:

    python scripts/probe_flash_vmem.py [C=64] [D=64]
"""

import sys

import jax
import jax.numpy as jnp

from pointasnl_tpu.ops.pallas import flash_attention as fa
from pointasnl_tpu.ops.pallas.flash_attention import (
    _bwd_working_set_bytes,
    fits_vmem,
    flash_attention,
)

if "--raw" in sys.argv:  # probe past the guard to find the hardware boundary
    sys.argv.remove("--raw")
    fa.fits_vmem = lambda *a: True


def try_compile(n: int, c: int, d: int) -> str:
    q = jnp.zeros((1, 256, c), jnp.float32)
    k = jnp.zeros((1, n, c), jnp.float32)
    v = jnp.zeros((1, n, d), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v))

    try:
        jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(q, k, v).compile()
        return "compiles"
    except ValueError as e:  # fits_vmem guard
        return f"guarded: {str(e)[:60]}"
    except Exception as e:
        return f"FAILS: {type(e).__name__}: {str(e)[:120]}"


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    d = int(sys.argv[2]) if len(sys.argv) > 2 else c
    print(f"backend={jax.devices()[0].platform} C={c} D={d}")
    for n in (8192, 10240, 12288, 16384, 20480, 24576, 28672, 32768, 40960):
        ws = _bwd_working_set_bytes(n, c, d)
        print(
            f"N={n:6d} model={ws / 2**20:6.2f} MiB "
            f"fits_vmem={fits_vmem(n, c, d)} -> {try_compile(n, c, d)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
