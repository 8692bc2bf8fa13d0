"""int8 vs bf16 inference A/B on the v5e (VERDICT r3 item 3).

The flagship forward sits at ~18% bf16 MFU, bound by MXU output-lane fill
(16/32-channel convs feed <=25% of the 128 lanes — PARITY.md roofline). The
v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 TOP/s), and the uint8
input path already exists end to end — so the open question is whether
XLA's int8 conv lowering converts that rate into wall-clock at THESE
shapes, where lane occupancy (not per-lane rate) has been the binding
constraint in every r3 packing A/B.

Measures, per conv shape of the production model (bench tile 70x512x512 ->
stem/2 grid 256x256):

  * bf16 conv (production baseline)
  * int8 conv: activations quantized on the fly (scale+round+clip+cast,
    the real cost), weights pre-quantized, conv with
    preferred_element_type=int32, dequant scale on the output
  * int8 conv, pre-quantized activations (upper bound: quant cost excluded)

plus one MXU-saturating 128->128 control shape where int8's 2x MUST show up
if the lowering uses the double-rate path at all.

Quality side (the ship gate): picks F1 on the synthetic fixture with f32,
bf16 (production), and int8-weight-quantized (per-output-channel symmetric)
forwards — if int8 wins the timing A/B, the weight-quant F1 bounds the
accuracy cost of going further.

Run from the repo root (TPU attached): python benchmarks/int8_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _timing import timed


def conv_variants(xshape, kshape, dilation=(1, 1)):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(xshape).astype(np.float32))
    k = jnp.asarray((rng.standard_normal(kshape) * 0.1).astype(np.float32))

    def conv(xx, kk, ptype=None):
        return jax.lax.conv_general_dilated(
            xx, kk, (1, 1), "SAME", rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype,
        )

    @jax.jit
    def f_bf16(xx, kk):
        return conv(xx.astype(jnp.bfloat16), kk.astype(jnp.bfloat16))

    # static weight quant (per-tensor here; per-channel changes only the
    # dequant broadcast); activation quant in-graph
    kq = jnp.clip(jnp.round(k / (jnp.max(jnp.abs(k)) / 127.0)),
                  -127, 127).astype(jnp.int8)
    ks = jnp.max(jnp.abs(k)) / 127.0

    @jax.jit
    def f_int8(xx):
        xs = jnp.max(jnp.abs(xx)) / 127.0
        xq = jnp.clip(jnp.round(xx / xs), -127, 127).astype(jnp.int8)
        y = conv(xq, kq, ptype=jnp.int32)
        return y.astype(jnp.float32) * (xs * ks)

    xs0 = jnp.max(jnp.abs(x)) / 127.0
    xq0 = jnp.clip(jnp.round(x / xs0), -127, 127).astype(jnp.int8)

    @jax.jit
    def f_int8_prequant(xq):
        y = conv(xq, kq, ptype=jnp.int32)
        return y.astype(jnp.float32) * (xs0 * ks)

    t_bf16 = timed(f_bf16, x, k)
    t_int8 = timed(f_int8, x)
    t_int8_pq = timed(f_int8_prequant, xq0)
    return t_bf16, t_int8, t_int8_pq


def timing_ab():
    shapes = [
        ("trunk 32->32 k3", (70, 256, 256, 32), (3, 3, 32, 32), (1, 1)),
        ("head 32->96 k3 d4", (70, 256, 256, 32), (3, 3, 32, 96), (4, 4)),
        ("control 128->128 k3", (8, 256, 256, 128), (3, 3, 128, 128), (1, 1)),
    ]
    print(f"{'shape':<22} {'bf16 ms':>9} {'int8 ms':>9} {'int8-pq ms':>11} "
          f"{'int8/bf16':>10}", flush=True)
    results = {}
    for name, xs, ks, dil in shapes:
        tb, ti, tp = conv_variants(xs, ks, dilation=dil)
        print(f"{name:<22} {tb * 1e3:9.2f} {ti * 1e3:9.2f} {tp * 1e3:11.2f} "
              f"{ti / tb:10.2f}", flush=True)
        results[name] = (tb, ti, tp)
    return results


def quantize_params_int8(params):
    """Per-output-channel symmetric int8 round-trip of every conv kernel —
    the accuracy proxy: what picks lose if weights ride int8."""
    import jax
    import jax.numpy as jnp

    def q(leaf, path=""):
        if leaf.ndim >= 3:  # conv kernels (..., cin, cout)
            axes = tuple(range(leaf.ndim - 1))
            s = jnp.max(jnp.abs(leaf), axis=axes, keepdims=True) / 127.0
            s = jnp.maximum(s, 1e-12)
            return jnp.clip(jnp.round(leaf / s), -127, 127) * s
        return leaf

    return jax.tree_util.tree_map(q, params)


def picks_f1(dtype, quant_weights=False):
    import tempfile

    import jax
    import pandas as pd

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.eval.metrics import evaluate_detections
    from cet_pick_tpu.infer.detector import TomoDetector
    from cet_pick_tpu.train.refine import train_refine
    from tests.test_e2e import make_synthetic

    rng = np.random.default_rng(7)
    vol, df = make_synthetic(rng)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config(task="semi", arch="unet_2", contrastive=False,
                     batch_size=4, lr=1e-3, num_epochs=4, val_intervals=-1,
                     bbox=8, K=60, out_thresh=0.3, cutoff_z=2, nms=5,
                     root_dir=tmp, dtype="float32").finalize()
        ds = RefineDataset(cfg, "train", images={"syn0": vol}, coords_df=df)
        state, _ = train_refine(cfg, ds, num_epochs=cfg.num_epochs,
                                log_fn=lambda *_: None)
        params = state.params
        if quant_weights:
            params = quantize_params_int8(params)
        import dataclasses

        icfg = dataclasses.replace(cfg, dtype=dtype)
        icfg.heads = cfg.heads
        det = TomoDetector(icfg, params=params,
                           batch_stats=state.batch_stats, tile_z=16)
        r = det.run(vol, name="syn0", out_dir=os.path.join(tmp, "out"))
        dets = r["dets"].copy()
        dets[:, :2] *= cfg.down_ratio
        pred = pd.DataFrame({
            "image_name": "syn0", "x_coord": dets[:, 0],
            "y_coord": dets[:, 1], "z_coord": dets[:, 2],
            "score": dets[:, 3],
        })
        return float(evaluate_detections(df, pred, radius=5)["best_f1"])


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    print("== timing A/B (production conv shapes) ==", flush=True)
    timing_ab()
    print("== picks F1 (same trained weights, different inference "
          "precision) ==", flush=True)
    for tag, dtype, qw in (("f32", "float32", False),
                           ("bf16 (production)", "bfloat16", False),
                           ("int8-weights", "bfloat16", True)):
        f1 = picks_f1(dtype, quant_weights=qw)
        print(f"{tag:<20} F1 {f1:.4f}", flush=True)


if __name__ == "__main__":
    main()
