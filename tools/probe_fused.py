"""Probe Mosaic compilation of build_grid_fused at bench-relevant shapes.

Run on the real TPU to see which (S, h, Cpad) configs compile and what
Mosaic's actual scoped-VMEM demand is (from the error message), so the
caller's gate can be calibrated against reality rather than a hand model.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from yag_slam_tpu.matching.pallas_kernels import (
    build_grid_fused, fused_build_vmem_bytes, _round_up,
)
from yag_slam_tpu.matching import correlation as C


def probe(S, h, M=2560):
    Cpad = _round_up(S + 2 * h, 128)
    taps = tuple(float(v) for v in C.gaussian_kernel_1d(0.01, 0.01 * h / 2))
    est = fused_build_vmem_bytes(S, h, Cpad)
    sy = jnp.zeros((1, M), dtype=jnp.int32)
    sx = jnp.zeros((1, M), dtype=jnp.int32)
    lim = jnp.full((1, 2), S, dtype=jnp.int32)
    mu = jnp.full((1,), M, dtype=jnp.int32)
    try:
        fn = jax.jit(
            lambda a, b, c, d: build_grid_fused(
                a, b, c, d, S=S, h=h, taps=taps, Cpad=Cpad
            )
        )
        fn.lower(sy, sx, lim, mu).compile()
        print(f"S={S} h={h} Cpad={Cpad} est={est/1e6:.2f}MB  OK")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"S={S} h={h} Cpad={Cpad} est={est/1e6:.2f}MB  FAIL: {msg}")
        return False


if __name__ == "__main__":
    print(jax.devices())
    for S in (512, 768, 1024, 1280, 1536, 1792, 2048):
        probe(S, 10)
