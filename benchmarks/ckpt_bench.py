"""Checkpoint-save cost on the real device path (the per-epoch residual).

Every epoch of every train loop ends in ``save_checkpoint(model_last)``;
flax's ``serialization.to_bytes`` walks the state pytree and ``np.asarray``s
each leaf SEQUENTIALLY — through the axon tunnel each fetch is a blocking
~8 ms round trip plus its bytes at the measured ~40 MB/s, so a few hundred
leaves serialize into seconds that the train loop spends idle.

Measures, for the flagship unet_4 refine state:
  a) save_checkpoint as shipped
  b) the same with one async-prefetch pass first (copy_to_host_async on
     every leaf, then serialize) — RTTs overlap, bandwidth is paid once
  c) the device-side jnp.copy snapshot cost (what a DP-safe write-behind
     hand-off pays on the main thread)

Run from the repo root (TPU attached):
    python benchmarks/ckpt_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.train.state import create_train_state, save_checkpoint

    cfg = Config(task="semi", arch="unet_4", dataset="synthetic").finalize()
    model = create_detector(cfg)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        np.zeros((1, 6, 64, 64), np.float32),
    )
    leaves = jax.tree_util.tree_leaves(
        {"params": state.params, "opt_state": state.opt_state,
         "batch_stats": state.batch_stats})
    nbytes = sum(np.dtype(l.dtype).itemsize * l.size for l in leaves)
    print(f"state: {len(leaves)} leaves, {nbytes / 1e6:.1f} MB")

    out = "/tmp/ckpt_bench"
    # warm both paths once (directory creation, msgpack, device sync)
    save_checkpoint(out, state, cfg)

    for name in ("save_as_shipped", "save_prefetched"):
        times = []
        for _ in range(5):
            # re-place the state on device so every trial pays real fetches
            st = jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x)), state)
            np.asarray(jax.tree_util.tree_leaves(st.params)[0])  # settle
            t0 = time.perf_counter()
            if name == "save_prefetched":
                for l in jax.tree_util.tree_leaves(
                        {"p": st.params, "o": st.opt_state,
                         "b": st.batch_stats}):
                    if hasattr(l, "copy_to_host_async"):
                        l.copy_to_host_async()
            save_checkpoint(out, st, cfg)
            times.append(time.perf_counter() - t0)
        print(f"{name}: median {np.median(times) * 1e3:.0f} ms "
              f"(trials {[f'{t * 1e3:.0f}' for t in times]})")

    # device-side snapshot (DP write-behind hand-off cost)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        snap = jax.tree_util.tree_map(jnp.copy, state.params)
        np.asarray(jax.tree_util.tree_leaves(snap)[0][..., :1])
        times.append(time.perf_counter() - t0)
    print(f"jnp.copy snapshot (params only): median "
          f"{np.median(times) * 1e3:.0f} ms")

    # what the train loops actually pay now: AsyncCheckpointer.save()'s
    # caller-thread cost (device snapshot enqueue + host-copy kickoff);
    # the fetch/serialize/write drain behind the next epoch's compute
    from cet_pick_tpu.train.state import AsyncCheckpointer, checkpoint_payload

    with AsyncCheckpointer() as ckpt:
        enq = []
        for _ in range(5):
            t0 = time.perf_counter()
            ckpt.save(out, checkpoint_payload(state), cfg)
            enq.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
    drain_tail = time.perf_counter() - t0  # close() ran in __exit__
    print(f"write-behind save enqueue: median {np.median(enq) * 1e3:.0f} ms "
          f"(trials {[f'{t * 1e3:.0f}' for t in enq]}); "
          f"final drain {drain_tail * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
