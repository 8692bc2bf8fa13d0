"""Runtime health diagnostics: device probe + known-healthy reference points.

The production deployment this framework targets runs TPU chips behind a
remote runtime (here: the axon tunnel), whose dispatch latency, link
bandwidth, and compile service each degrade INDEPENDENTLY hour to hour
(CLAUDE.md measured modes: matmul 2.3 -> 25+ ms, link 40 -> 15 MB/s, the
same train-step compile 28.9 s vs 1,540 s). A benchmark or picking run
started inside a degraded window records garbage; these probes give every
entry point (bench.py, `cet_pick_tpu doctor`) one shared, measured answer
to "is the device path healthy right now".

No reference equivalent — the reference assumes a locally attached GPU.
"""

from __future__ import annotations

import time

import numpy as np

# Known-healthy reference points for a v5e behind the axon tunnel: a chained
# 2048^2 bf16 matmul amortizes to ~2.3 ms/matmul and the host->device link
# moves ~40 MB/s (re-measured across round-3 sessions).
HEALTHY_MATMUL_MS = 2.3
HEALTHY_LINK_MBPS = 40.0


def probe_tunnel():
    """Measure (matmul_ms, link_mbps) against the known-healthy numbers.

    matmul_ms: amortized per-matmul time of a 20-deep chained 2048^2 bf16
    matmul (device compute + one dispatch, the dispatch cost amortized out).
    link_mbps: host->device bandwidth of one 8 MB uint8 transfer (the E2E
    picking path's dtype). Both end with a tiny ``np.asarray`` fetch —
    ``block_until_ready`` does not block through remote runtimes.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def chain(a):
        return jax.lax.fori_loop(0, 20, lambda i, c: c @ a * 0.001, a)

    np.asarray(chain(x).ravel()[:1])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chain(x).ravel()[:1])
    matmul_ms = (time.perf_counter() - t0) / 20 * 1e3

    buf = np.zeros((8 << 20,), np.uint8)  # 8 MB, the E2E path's dtype
    t0 = time.perf_counter()
    dev = jax.device_put(buf)
    np.asarray(dev[:1])
    link_mbps = 8.0 / (time.perf_counter() - t0)
    return matmul_ms, link_mbps


def wait_for_healthy_tunnel(max_tries=5, sleep_s=60):
    """Return the final (matmul_ms, link_mbps, healthy); retries with sleeps
    while the tunnel looks degraded (>3x off either reference point).

    The reference points describe the TPU-behind-axon setup; on any other
    backend (CPU-only checkout, where the emulated matmul would always read
    as 'degraded' and burn 5 minutes of retries) the probe is skipped."""
    import sys

    import jax

    if jax.default_backend() != "tpu":
        return float("nan"), float("nan"), True
    for attempt in range(max_tries):
        matmul_ms, link_mbps = probe_tunnel()
        healthy = (matmul_ms < 3 * HEALTHY_MATMUL_MS
                   and link_mbps > HEALTHY_LINK_MBPS / 3)
        if healthy or attempt == max_tries - 1:
            return matmul_ms, link_mbps, healthy
        print(f"tunnel degraded (matmul {matmul_ms:.1f} ms vs "
              f"~{HEALTHY_MATMUL_MS}, link {link_mbps:.1f} MB/s vs "
              f"~{HEALTHY_LINK_MBPS:.0f}); retry {attempt + 1}/{max_tries} "
              f"in {sleep_s}s", file=sys.stderr)
        time.sleep(sleep_s)
    return matmul_ms, link_mbps, False  # pragma: no cover


def diagnostics(probe: bool = True) -> dict:
    """One JSON-able health report for `cet_pick_tpu doctor`.

    Always cheap on CPU checkouts (the tunnel probe only runs on TPU
    backends); on TPU it measures dispatch+compute and link bandwidth once
    (no retries — doctor reports the state NOW, bench.py is the one that
    waits for recovery)."""
    import jax

    backend = jax.default_backend()
    devices = jax.devices()
    report = {
        "jax_version": jax.__version__,
        "backend": backend,
        "device_count": len(devices),
        "device_kinds": sorted({d.device_kind for d in devices}),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
    # compile + dispatch smoke: any failure here means no command can run
    t0 = time.perf_counter()
    import jax.numpy as jnp

    val = float(np.asarray(jax.jit(lambda a: (a * 2 + 1).sum())(
        jnp.ones((128, 128), jnp.float32))))
    report["compile_smoke_s"] = round(time.perf_counter() - t0, 3)
    report["compile_smoke_ok"] = val == 128.0 * 128.0 * 3.0
    if probe and backend == "tpu":
        matmul_ms, link_mbps = probe_tunnel()
        report.update({
            "matmul_ms": round(matmul_ms, 2),
            "matmul_healthy_ms": HEALTHY_MATMUL_MS,
            "link_mbps": round(link_mbps, 1),
            "link_healthy_mbps": HEALTHY_LINK_MBPS,
            "healthy": bool(matmul_ms < 3 * HEALTHY_MATMUL_MS
                            and link_mbps > HEALTHY_LINK_MBPS / 3),
        })
    else:
        report["healthy"] = bool(report["compile_smoke_ok"])
    return report
