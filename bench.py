"""End-to-end picking benchmark: tutorial-size tomogram -> coordinates.

Measures the refinement-inference hot path on one chip — tiled slice-UNet +
3D-head forward, fused sigmoid/NMS/top-K decode — on synthetic 256x512x512
volumes (the reference tutorial's tomogram size, docs/quick_tutorial.md:13-14).
Prints ONE JSON line.

Two numbers are reported (VERDICT round-1 asked for the split):

* ``value`` / ``e2e_voxels_per_sec`` — end to end per distinct tomogram:
  host->device transfer (uint8, 4x smaller), forward, decode, result fetch.
  Volume N+1's transfer is dispatched before volume N's compute is drained,
  so the link and the TPU overlap (jax transfers are async). The headline is
  the MEDIAN of 3 interleaved trials per schedule (per-trial times + tunnel
  probes are in the JSON) — single trials through the axon tunnel swing
  0.6-3.4x.
* ``compute_voxels_per_sec`` + ``mfu_pct`` — device-resident forward+decode
  only (volume already in HBM), with the model's measured FLOP cost from
  XLA's cost analysis, against the v5e bf16 peak (197 TFLOP/s).

Baseline: the driver target of <10 s end-to-end for a 512^3 tomogram on a
v5e-8 (BASELINE.json). Scaled to this volume on ONE chip, the target rate is
512^3 voxels / 10 s / 8 chips = 1.678e6 voxels/s/chip; vs_baseline is the
measured E2E voxels/s/chip over that rate (>1 beats the target).

Timing notes for this runtime (CLAUDE.md): ``block_until_ready`` does not
block through the axon tunnel, so every phase ends with a small
``np.asarray`` fetch of the (K, 5) detection table, which forces completion.
"""

import json
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # TPU v5e per-chip bf16 peak FLOP/s

# Tunnel health probes live in the package so `cet_pick_tpu doctor` and this
# benchmark report from the same measured reference points. The tunnel has
# been observed independently degraded ~200x for >1 h mid-session — a
# benchmark run in that state records garbage, so probe first and wait
# (bounded) for recovery.
from cet_pick_tpu.utils.health import (  # noqa: E402
    probe_tunnel,
    wait_for_healthy_tunnel,
)


def main():
    import jax

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.infer.detector import TomoDetector
    from cet_pick_tpu.io.loader import preprocess_quantized
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state

    matmul_ms, link_mbps, tunnel_healthy = wait_for_healthy_tunnel()

    D, H, W = 256, 512, 512
    config = Config(task="semi", arch="unet_4", K=900, nms=3,
                    dtype="bfloat16").finalize()
    model = create_detector(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0), np.zeros((1, 8, 64, 64), np.float32)
    )
    det = TomoDetector(config, params=state.params,
                       batch_stats=state.batch_stats, tile_z=64)

    rng = np.random.default_rng(0)
    # three distinct tomograms in the loader's real output representation:
    # uint8 + dequantization bounds (preprocess_quantized == preprocess
    # bit-for-bit); uint8 ships 4x fewer bytes over the host->device link
    vols = [
        preprocess_quantized(rng.standard_normal((D, H, W)).astype(np.float32))
        for _ in range(3)
    ]

    # warmup: compile forward + decode
    hm, dets = det.process(*vols[0])
    np.asarray(dets)

    # ---- compute-only: volume resident in HBM, forward + decode + tiny fetch
    v_dev = jax.device_put(vols[0][0])
    np.asarray(v_dev[:1, :1, :1])  # drain the transfer
    comp_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        hm, dets = det.process(v_dev, vols[0][1], vols[0][2])
        np.asarray(dets)
        comp_times.append(time.perf_counter() - t0)
    t_comp = float(np.min(comp_times))
    compute_vps = D * H * W / t_comp

    # measured model cost: FLOPs of one compiled z-tile forward, scaled to
    # the number of voxels it covers
    flops_per_voxel = _tile_flops_per_voxel(det, H, W)
    tflops = compute_vps * flops_per_voxel / 1e12
    mfu = 100.0 * tflops * 1e12 / V5E_BF16_PEAK

    # ---- end to end over distinct tomograms, two schedules:
    # (a) sequential: transfer -> compute -> fetch per volume;
    # (b) pipelined: volume i+1's device_put dispatched before volume i is
    #     drained (the right schedule on a directly-attached TPU; through
    #     a serializing host tunnel the two in-flight transfers can contend,
    #     so both are measured and the better one is the headline).
    def run_sequential():
        times = []
        for v, lo, hi in vols:
            t0 = time.perf_counter()
            hm, dets = det.process(v, lo, hi)
            np.asarray(dets)
            times.append(time.perf_counter() - t0)
        return float(np.mean(times))

    def run_pipelined():
        put = [jax.device_put(vols[0][0])]
        times = []
        for i, (v, lo, hi) in enumerate(vols):
            t0 = time.perf_counter()
            if i + 1 < len(vols):
                put.append(jax.device_put(vols[i + 1][0]))  # async
            hm, dets = det.process(put[i], lo, hi)
            np.asarray(dets)
            times.append(time.perf_counter() - t0)
        return float(np.mean(times))

    # N interleaved trials of each schedule, alternating so a tunnel drift
    # hits both equally, with a per-trial tunnel probe; the HEADLINE is the
    # MEDIAN of the better schedule (trials through the axon tunnel swing
    # 0.6-3.4x — VERDICT r3 weak #1: a single trial is not an artifact of
    # record), and the per-trial lists are kept in the JSON for the spread.
    N_TRIALS = 3
    seq_trials, pipe_trials, trial_probes = [], [], []
    for _ in range(N_TRIALS):
        seq_trials.append(run_sequential())
        pipe_trials.append(run_pipelined())
        pm, pl = probe_tunnel()
        trial_probes.append({"matmul_ms": round(pm, 2),
                             "link_mbps": round(pl, 1)})
    t_seq = float(np.median(seq_trials))
    t_pipe = float(np.median(pipe_trials))
    t_e2e = min(t_seq, t_pipe)
    e2e_vps = D * H * W / t_e2e

    target = 512 ** 3 / 10.0 / 8.0  # driver target, per chip
    print(json.dumps({
        "metric": "pick_voxels_per_sec_per_chip",
        "value": round(e2e_vps, 1),
        "unit": "voxel/s",
        "vs_baseline": round(e2e_vps / target, 3),
        # the chip-only ratio: compute-resident voxel rate over the same
        # target. The e2e ratio above rides the 28-77 MB/s axon tunnel
        # (~89% of e2e time is the host link, VERDICT r4 weak #2), so this
        # field separates chip progress from tunnel weather round to round.
        "vs_baseline_compute": round(compute_vps / target, 3),
        "compute_voxels_per_sec": round(compute_vps, 1),
        "compute_tflops": round(tflops, 2),
        "mfu_pct": round(mfu, 2),
        "flops_per_voxel": round(flops_per_voxel, 1),
        "e2e_s_per_volume": round(t_e2e, 3),
        "e2e_s_sequential": round(t_seq, 3),
        "e2e_s_pipelined": round(t_pipe, 3),
        "e2e_trials_sequential": [round(t, 3) for t in seq_trials],
        "e2e_trials_pipelined": [round(t, 3) for t in pipe_trials],
        "per_trial_tunnel": trial_probes,
        "compute_s_per_volume": round(t_comp, 3),
        "compute_trials": [round(t, 3) for t in comp_times],
        "tunnel_matmul_ms": round(matmul_ms, 2),
        "tunnel_link_mbps": round(link_mbps, 1),
        "tunnel_healthy": tunnel_healthy,
    }))


def _tile_flops_per_voxel(det, H, W):
    """FLOPs/input-voxel of the compiled tile forward via XLA cost analysis."""
    import jax
    import jax.numpy as jnp

    infer = det.infer
    tile_d = infer.tile_z + 2 * infer.halo
    x = jnp.zeros((1, tile_d, H, W), jnp.float32)

    def fwd(variables, tile):
        return infer.model.apply(variables, tile, train=False)

    try:
        lowered = jax.jit(fwd).lower(infer.variables, x)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            return flops / (tile_d * H * W)
    except Exception as e:  # pragma: no cover - depends on runtime
        import sys

        print(f"cost analysis unavailable ({type(e).__name__}: {e}); "
              "using round-1 measured FLOPs/voxel", file=sys.stderr)
    return 100.7e3  # round-1 measured fallback (VERDICT.md)


if __name__ == "__main__":
    main()
