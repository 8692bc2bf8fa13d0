"""A/B: Pallas fused dilated-conv head kernel vs the XLA z-tap lowering.

The Pallas kernel (ops/pallas_head.py) fuses the shifted z-add + ReLU into
the conv's VMEM epilogue, eliminating the (D, H, W, 3F) intermediate's HBM
round-trip (~2x4 ms on the bench tile). This script decides — on the real
chip — whether that beats the XLA path (models/detector._ZTapDilatedConv);
the loser stays out of the model, as with benchmarks/decode_ab.py.

Run from the repo root with a TPU attached: python benchmarks/pallas_head_ab.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from _timing import timed  # benchmarks/_timing.py: scalar-fetch fence
from cet_pick_tpu.ops.pallas_head import ztap_dilated_conv


D,H,W,C,F = 70,256,256,32,32
x = jnp.asarray(np.random.default_rng(0).standard_normal((1,D,H,W,C))*0.1, jnp.bfloat16)
k = jnp.asarray(np.random.default_rng(1).standard_normal((3,3,3,C,F))*0.1, jnp.bfloat16)

# XLA ztap (current production path)
@jax.jit
def xla_ztap(x, k):
    b,d,h,w,c = x.shape
    k2 = jnp.transpose(k,(1,2,3,0,4)).reshape(3,3,c,3*F)
    u = jax.lax.conv_general_dilated(x.reshape(b*d,h,w,c), k2, (1,1), "SAME",
        rhs_dilation=(4,4), dimension_numbers=("NHWC","HWIO","NHWC")).reshape(b,d,h,w,3,F)
    up = jnp.pad(u, ((0,0),(1,1),(0,0),(0,0),(0,0),(0,0)))
    return jnp.maximum(up[:,:-2,:,:,0]+up[:,1:-1,:,:,1]+up[:,2:,:,:,2], 0)

xla_sum = jax.jit(lambda x,k: jnp.sum(xla_ztap(x,k).astype(jnp.float32)))

def pallas_fn(hb):
    return jax.jit(lambda x,k: ztap_dilated_conv(x, k, dilation=4, relu=True, hb=hb))

def pallas_sum(hb):
    return jax.jit(lambda x,k: jnp.sum(
        ztap_dilated_conv(x, k, dilation=4, relu=True, hb=hb).astype(jnp.float32)))

# correctness first (small tolerance: bf16)
ref = np.asarray(xla_ztap(x, k), np.float32)
for hb in (16,):
    try:
        out = np.asarray(pallas_fn(hb)(x, k), np.float32)
        print(f"hb={hb} max|diff| vs xla:", np.abs(out - ref).max())
    except Exception as e:
        print(f"hb={hb} FAILED: {type(e).__name__}: {str(e)[:300]}")

flops = 2*D*H*W*27*C*F
t = timed(xla_sum, x, k)
print(f"xla ztap        {t*1e3:7.2f} ms  {flops/t/1e12:6.2f} TF/s ({100*flops/t/197e12:.1f}% MFU)")
for hb in (8, 16):  # hb=32 exceeds VMEM (compiler crash)
    try:
        fn = pallas_sum(hb)
        t = timed(fn, x, k)
        print(f"pallas hb={hb:<3}   {t*1e3:7.2f} ms  {flops/t/1e12:6.2f} TF/s ({100*flops/t/197e12:.1f}% MFU)")
    except Exception as e:
        print(f"pallas hb={hb} bench FAILED: {type(e).__name__}: {str(e)[:200]}")
