"""Worker process for the multi-host DP test (2 processes x 4 CPU devices).

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process initializes jax.distributed over gRPC, contributes its local
half of a deterministic global batch, runs ONE data-parallel train step over
the global 8-device mesh, and prints the (globally identical) loss.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cet_pick_tpu.config import Config
    from cet_pick_tpu.models.detector import create_detector
    from cet_pick_tpu.parallel.mesh import (
        init_distributed, make_multihost_dp_train_step,
    )
    from cet_pick_tpu.train.state import create_train_state

    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    n_global = len(jax.devices())
    assert n_global == 4 * nproc, f"global devices {n_global}"

    config = Config(task="semi", arch="unet_2", contrastive=True,
                    batch_size=n_global, tau=0.1, temp=0.07, thresh=0.5,
                    cr_weight=0.1, lr=1e-3).finalize()
    model = create_detector(config)

    # deterministic GLOBAL batch; each host slices its local part
    rng = np.random.default_rng(0)
    b, p, d, h, w = n_global, 2, 6, 32, 32
    batch = {
        "input": rng.standard_normal((b, p, d, h, w)).astype(np.float32),
        "hm": np.where(rng.random((b, p, d, h // 2, w // 2)) < 0.01,
                       1.0, -1.0).astype(np.float32),
        "flip_prob": rng.random(b).astype(np.float32),
    }
    batch["hm"][:, 0, 3, 8, 8] = 1.0  # PU loss needs positives

    local = {k: v[pid * (b // nproc) : (pid + 1) * (b // nproc)]
             for k, v in batch.items()}

    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        batch["input"][: b // nproc].reshape(-1, d, h, w),
    )
    step, place_state, place_batch = make_multihost_dp_train_step(model, config)
    state, metrics = step(place_state(state), place_batch(local))
    # fetch only addressable shards -> the replicated scalar is host-local
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    print(f"MULTIHOST pid={pid} loss={loss:.6f}", flush=True)
    assert np.isfinite(loss)


if __name__ == "__main__":
    main()
