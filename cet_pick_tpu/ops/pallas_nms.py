"""Pallas TPU kernel: fused sigmoid + 3D max-pool NMS in one HBM pass.

The decode hot path (reference cet_pick/models/decode.py:27-33 + the
``_sigmoid`` clamp of models/utils.py:167-169) reads the heatmap once for the
max-pool, once for the equality compare, and once for the sigmoid when left
to separate ops. This kernel streams z-slabs HBM -> VMEM with a
double-buffered DMA pipeline and does everything on the VPU in one pass:

    p = clip(sigmoid(h), 1e-4, 1-1e-4)
    out[z, y, x] = p[z, y, x] * [p[z, y, x] == max over the (3, k, k) window]

(the comparison runs on clipped probabilities, not logits: the clamp
saturates strong peaks to the same 0.9999, and those ties must all survive
exactly as in the reference's sigmoid -> clamp -> maxpool order). The
rectangular window max is separable: 3 z-taps, then k y-taps and k x-taps on
the z-max — 3 + 2(k-1) shifted VPU maxes per slab instead of 3k^2 window
reads.

Borders use -inf halos, matching torch max_pool3d's implicit -inf padding.
Falls back transparently to the XLA reduce_window path off-TPU; interpret
mode makes the kernel testable on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # -inf stand-in (finite to keep VPU comparisons well-defined)


def _slab_dma(hbm_ref, slab_ref, sem_ref, step, slot, tz):
    """Async copy of input slab `step` into double-buffer slot `slot`."""
    return pltpu.make_async_copy(
        hbm_ref.at[pl.ds(step * tz, tz + 2)], slab_ref.at[slot],
        sem_ref.at[slot],
    )


def _nms_slab_kernel(hbm_ref, out_ref, slab_ref, sem_ref, *, tz, kernel,
                     nsteps):
    """Grid step i: NMS for output slices [i*tz, (i+1)*tz).

    hbm_ref:  z-padded logits (D + 2, H, W) in ANY/HBM.
    slab_ref: VMEM scratch (2, tz + 2, H, W) — double-buffered input slabs:
              while slab i computes, slab i+1's HBM->VMEM DMA is in flight
              (scratch and semaphores persist across the sequential TPU grid).
    out_ref:  (tz, H, W) VMEM block; pallas pipelines the writeback.
    """
    i = pl.program_id(0)
    p = kernel // 2
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        _slab_dma(hbm_ref, slab_ref, sem_ref, 0, 0, tz).start()

    @pl.when(i + 1 < nsteps)
    def _():
        _slab_dma(hbm_ref, slab_ref, sem_ref, i + 1, nxt, tz).start()

    _slab_dma(hbm_ref, slab_ref, sem_ref, i, slot, tz).wait()
    # clipped probabilities FIRST: the clamp saturates strong peaks to
    # 0.9999, so nearby saturated maxima tie and all survive — comparing
    # raw logits instead would break exact parity with the reference's
    # sigmoid -> clamp -> maxpool order (models/utils.py:167, decode.py:27)
    slab = jnp.clip(jax.nn.sigmoid(slab_ref[slot]), 1e-4, 1.0 - 1e-4)

    center = slab[1 : 1 + tz]
    # z-max over the 3-tap window (the reference fixes kernel_z = 3,
    # decode.py:30-31)
    zmax = jnp.maximum(jnp.maximum(slab[0:tz], center), slab[2 : 2 + tz])
    # separable in-plane max with below-range halo
    padded = jnp.pad(zmax, ((0, 0), (p, p), (p, p)), constant_values=-1.0)
    h = center.shape[1]
    w = center.shape[2]
    ymax = padded[:, 0:h, :]
    for dy in range(1, kernel):
        ymax = jnp.maximum(ymax, padded[:, dy : dy + h, :])
    m = ymax[:, :, 0:w]
    for dx in range(1, kernel):
        m = jnp.maximum(m, ymax[:, :, dx : dx + w])

    keep = (center == m).astype(jnp.float32)
    out_ref[:] = center * keep


def _pick_tz(d, h, w, vmem_budget=8 * 1024 * 1024):
    """Largest tz dividing d with 2 slabs + out block within the VMEM budget."""
    for tz in (16, 8, 4, 2, 1):
        if d % tz:
            continue
        need = (2 * (tz + 2) + tz) * h * w * 4
        if need <= vmem_budget:
            return tz
    return 1


@partial(jax.jit, static_argnames=("kernel", "interpret"))
def fused_sigmoid_nms(logits, kernel=3, interpret=False):
    """One-pass sigmoid + keep-mask NMS of a (D, H, W) logit volume."""
    d, h, w = logits.shape
    tz = _pick_tz(d, h, w)
    padded = jnp.pad(logits, ((1, 1), (0, 0), (0, 0)), constant_values=NEG)
    grid = (d // tz,)
    return pl.pallas_call(
        partial(_nms_slab_kernel, tz=tz, kernel=kernel, nsteps=grid[0]),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tz, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 2, h, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded.astype(jnp.float32))


def pallas_available():
    """True when running on a real TPU backend (not interpret-only)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
