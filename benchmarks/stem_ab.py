"""A/B the stem lowering on the real chip: direct k7 s2 1->16 conv (the
reference's shape, unet_small.py:35-37 — measured 2.5 TF/s, the worst MXU
shape in the model) vs the space-to-depth 4-phase k4 s1 conv
(models/detector._Stem).

Correctness is asserted first (same sums up to bf16 rounding), then both are
timed with scalar-fetch amortized enqueue (benchmarks/_timing.py — the
tunnel moves ~40 MB/s, so the fence fetches one element, never the output).

Run from the repo root (TPU attached): python benchmarks/stem_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

from _timing import timed  # benchmarks/_timing.py: scalar-fetch fence
from cet_pick_tpu.models.detector import _Stem

TD, H, W, F = 70, 512, 512, 16



def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(TD, H, W, 1).astype(np.float32)).astype(jnp.bfloat16)
    stem = _Stem(F, dtype=jnp.bfloat16)
    v = stem.init(jax.random.PRNGKey(0), x)
    kern = v["params"]["kernel"].astype(jnp.bfloat16)

    @jax.jit
    def direct(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    s2d_full = jax.jit(lambda x: stem.apply(v, x))
    a = np.asarray(direct(x, kern), np.float32)
    b = np.asarray(s2d_full(x), np.float32)
    scale = max(1.0, np.abs(a).max())
    print(f"maxdiff {np.abs(a - b).max():.2e} (rel {np.abs(a-b).max()/scale:.2e})")

    direct_s = jax.jit(lambda x, k: jnp.sum(direct(x, k).astype(jnp.float32)))
    s2d_s = jax.jit(lambda x: jnp.sum(stem.apply(v, x).astype(jnp.float32)))
    flops = 2 * TD * (H // 2) * (W // 2) * 49 * 1 * F
    for name, fn, args in [("direct k7s2", direct_s, (x, kern)),
                           ("s2d 4-phase k4", s2d_s, (x,))]:
        t = timed(fn, *args)
        print(f"{name:<16} {t*1e3:7.2f} ms  {flops/t/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main()
