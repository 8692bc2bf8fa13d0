"""A/B on the real chip: XLA blocked gram row-stats vs the Pallas fused
kernel (ops/pallas_gram.py) at the refine step's per-sample shape
(2N = 24576, C = 32, temp 0.07).

The XLA path materializes each (block, 2N) sims stripe in HBM; the kernel
keeps feats VMEM-resident and never materializes sims. Correctness is
asserted on-chip first (values + grads vs the XLA path), then both are
timed with the scalar-fetch fence (benchmarks/_timing.py).

Run from the repo root (TPU attached): python benchmarks/gram_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import timed  # benchmarks/_timing.py: scalar-fetch fence


def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.ops.pallas_gram import gram_row_stats
    from cet_pick_tpu.train.losses import _row_stats_blocked

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    m, c, temp = 24576, 32, 0.07
    f = rng.standard_normal((m, c)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    feats = jnp.asarray(f)
    pos = jnp.asarray((rng.random(m) < 0.002).astype(np.float32))
    other = jnp.asarray((rng.random(m) < 0.9).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    def val_xla(ff):
        ps, os_, ts, _ = _row_stats_blocked(ff, pos, other, temp, block=1024)
        return (w * ps).sum() + (w * os_).sum() + (w * ts).sum()

    def make_val_pl(rb):
        def val_pl(ff):
            ps, os_, ts = gram_row_stats(ff, pos, other, temp, rb, False)
            return (w * ps).sum() + (w * os_).sum() + (w * ts).sum()
        return val_pl

    vx = jax.jit(val_xla)
    gx = jax.jit(jax.grad(val_xla))
    print(f"xla   value {timed(vx, feats)*1e3:7.2f} ms   "
          f"grad {timed(gx, feats)*1e3:7.2f} ms   v={float(vx(feats)):.4f}")
    gref = np.asarray(gx(feats))

    for rb in (16, 32, 64, 128):
        try:
            vp = jax.jit(make_val_pl(rb))
            gp = jax.jit(jax.grad(make_val_pl(rb)))
            v = float(vp(feats))
            g = np.asarray(gp(feats))
            dv = abs(v - float(vx(feats))) / max(abs(float(vx(feats))), 1e-9)
            dg = float(np.max(np.abs(g - gref)) / max(np.max(np.abs(gref)), 1e-9))
            tv = timed(vp, feats)
            tg = timed(gp, feats)
            print(f"pl rb={rb:<3} value {tv*1e3:7.2f} ms   "
                  f"grad {tg*1e3:7.2f} ms   dv={dv:.2e} dg={dg:.2e}")
        except Exception as e:
            print(f"pl rb={rb:<3} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
