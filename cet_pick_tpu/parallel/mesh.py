"""Device mesh + sharded training / inference.

TPU-native replacement for the reference's two multi-device paths
(reference: cet_pick/models/data_parallel.py:108-117 custom chunked
DataParallel; cet_pick/main.py:24-41 + trains/base_trainer.py:229-238
torch.distributed DDP over NCCL):

* **Data parallelism** — one ``jax.sharding.Mesh`` with a ``data`` axis;
  the global batch is sharded over it with ``NamedSharding``; parameters and
  optimizer state are replicated. Because the jitted train step's outputs
  (new params) are marked replicated, XLA's GSPMD partitioner inserts the
  gradient ``all-reduce`` over ICI automatically — no NCCL, no scatter/gather
  modules, no uneven chunk sizes (devices are homogeneous).
* **Spatial parallelism** — the volume analog of sequence parallelism: a
  whole-tomogram forward is sharded along H (and optionally W) across the
  ``space`` axis. XLA inserts the convolution halo exchanges itself, so the
  dilated 3D head's receptive field is handled without manual halo code.

BatchNorm under DP: **SyncBatchNorm semantics for free.** Under GSPMD the
train step is one program over the global batch; BatchNorm's batch-mean
reduces over the sharded axis, so the partitioner inserts the cross-device
all-reduce automatically. The updated running statistics are bit-comparable
to a single-device run over the same global batch
(tests/test_parallel.py::test_dp_step_matches_single_device asserts this) —
matching the reference's DDP SyncBatchNorm conversion (main.py:52-53)
without any pmean plumbing. (Per-device statistics would only appear under
per-device programs a la pmap, which this framework does not use.)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (),
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh over the visible devices.

    shape=() means "all devices on one data axis". For multi-axis meshes
    (e.g. (4, 2) over ("data", "space")) the device count must factor
    accordingly.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = (len(devices),)
        axis_names = tuple(axis_names[:1])
    n = int(np.prod(shape))
    if len(shape) != len(axis_names) and len(axis_names) == 1:
        # the DP train loops and spatial inference consume ONE mesh axis; a
        # multi-dim --mesh_shape (e.g. a 2x4 layout) rides its total device
        # count on that axis instead of crashing in Mesh() with an opaque
        # ndim/axis_names mismatch
        shape = (n,)
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard every leaf of a batch dict along its leading axis."""

    def put(x):
        spec = P(axis) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def spatial_sharding(mesh: Mesh, axis: str = "space", h_dim: int = 2):
    """NamedSharding for a (B, D, H, W) volume sharded along H.

    This is the "context parallelism for volumes" design point from
    SURVEY.md §5: XLA partitions the slice-wise 2D convs and the dilated 3D
    head spatially and inserts halo exchanges over ICI.
    """
    spec = [None, None, None, None]
    spec[h_dim] = axis
    return NamedSharding(mesh, P(*spec))


def make_dp_train_step(model, config, mesh: Mesh, axis: str = "data"):
    """Data-parallel REFINE train step: batch sharded over `axis`, state
    replicated. Thin wrapper over :func:`make_dp_step`; the grads
    all-reduce is implicit — params come in replicated and must leave
    replicated, so GSPMD emits a psum over the data axis, the TPU-native
    equivalent of DDP's NCCL allreduce (base_trainer.py:229-238)."""
    from cet_pick_tpu.train.refine import make_train_step

    return make_dp_step(make_train_step(model, config), mesh, axis=axis)


def auto_dp_step(config, inner, log_fn=print, axis: str = "data"):
    """The train loops' shared auto-mesh policy: go data-parallel when
    ``--mesh_shape`` is set, or when several devices are visible and the
    batch shards evenly; otherwise jit the step single-device.

    Returns (step, place_state, place_batch, is_dp).
    """
    n_dev = len(jax.devices())
    want_mesh = bool(config.mesh_shape) or (
        n_dev > 1 and config.batch_size % n_dev == 0
    )
    if not want_mesh:
        return jax.jit(inner), (lambda s: s), jax.device_put, False
    mesh = make_mesh(tuple(config.mesh_shape) or (n_dev,), (axis,))
    if config.batch_size % mesh.devices.size:
        raise ValueError(
            f"batch_size {config.batch_size} must divide evenly over the "
            f"{mesh.devices.size}-device mesh"
        )
    step, place_state, place_batch = make_dp_step(inner, mesh, axis=axis)
    log_fn(f"data-parallel over {mesh.devices.size} devices")
    return step, place_state, place_batch, True


def warm_step(step, state, *extra):
    """Compile + first-run ``step`` and discard everything.

    The DP-wrapped step DONATES its state argument (``make_dp_step``
    ``donate=(0,)`` below), so running it on the caller's real state would
    delete that state's buffers — warm on a ``tree_map(jnp.copy)`` instead.
    A one-element fetch fences the run so the next dispatch starts clean.
    Used by the train/*.prepare_* setup-overlap paths."""
    warm_state = jax.tree_util.tree_map(jnp.copy, state)
    out = step(warm_state, *extra)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    del out, warm_state


def make_dp_step(inner, mesh: Mesh, axis: str = "data", donate=(0,)):
    """Generic data-parallel wrapper for ``(state, batch, *extra) -> (state,
    metrics)`` train steps (explore/moco/classify — any step whose first
    argument is the replicated state and second is the per-sample batch).

    Like :func:`make_dp_train_step` but step-agnostic: shardings are pinned
    on the jit boundary — outputs are declared replicated (forcing the GSPMD
    gradient all-reduce) and every batch leaf whose leading dimension splits
    evenly over the mesh is constrained to ``P(axis)`` *inside* the traced
    function (``with_sharding_constraint`` sees static shapes at trace time).
    Leaves named in ``REPLICATED_BATCH_KEYS`` (per-channel normalization
    constants, whose length can coincide with the mesh size) are excluded by
    name, the same mechanism the multi-host variant uses. A caller passing
    raw numpy batches still gets a genuinely sharded step. Extra positional
    args (e.g. a PRNG key) ride replicated.

    Returns (step, place_state, place_batch).
    """
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    size = mesh.devices.size

    def _is_batch_leaf(path, x):
        if any(
            getattr(p, "key", None) in REPLICATED_BATCH_KEYS for p in path
        ):
            return False
        return np.ndim(x) >= 1 and x.shape[0] > 0 and x.shape[0] % size == 0

    def wrapped(state, batch, *extra):
        batch = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.lax.with_sharding_constraint(x, bsh)
            if _is_batch_leaf(p, x) else x,
            batch,
        )
        return inner(state, batch, *extra)

    step = jax.jit(wrapped, donate_argnums=donate, out_shardings=(repl, repl))

    def place_state(state):
        return jax.device_put(state, repl)

    def place_batch(batch):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(
                x, bsh if _is_batch_leaf(p, x) else repl
            ),
            batch,
        )

    return step, place_state, place_batch


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host initialization — the DDP analog.

    TPU-native replacement for the reference's torch.distributed setup
    (reference main.py:24-41, simsiam_main.py:28-45: WORLD_SIZE/SLURM_PROCID
    env sniffing + dist.init_process_group over NCCL): one
    ``jax.distributed.initialize`` call wires every host into a single
    global device view; afterwards ``jax.devices()`` spans all hosts and a
    Mesh built over it rides ICI within a slice and DCN across slices.

    With no arguments it auto-detects the cluster environment (TPU pods,
    SLURM, Open MPI) exactly like the reference's env sniffing. Explicit
    arguments support the CPU-process test rig (2 processes x N virtual
    devices over gRPC).
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def make_multihost_dp_train_step(model, config, axis: str = "data"):
    """Data-parallel REFINE train step across ALL hosts' devices (the
    reference's DDP path, base_trainer.py:229-238). Thin wrapper over
    :func:`make_multihost_dp_step`."""
    from cet_pick_tpu.train.refine import make_train_step

    return make_multihost_dp_step(make_train_step(model, config), axis=axis)


REPLICATED_BATCH_KEYS = ("norm_mean", "norm_std")


def make_multihost_dp_step(inner, axis: str = "data",
                           replicated_keys=REPLICATED_BATCH_KEYS):
    """Step-agnostic multi-host data parallelism for any
    ``(state, batch, *extra) -> (state, metrics)`` step.

    The per-host input is that host's shard of the global batch (the
    reference's DistributedSampler split, base_trainer.py:229-238);
    ``jax.make_array_from_process_local_data`` assembles the global sharded
    array without ever materializing the full batch on any one host.

    Whether a leaf is a per-host shard or a host-identical constant cannot
    be inferred from shapes alone (a (2,)-norm constant on a 2-device host
    looks exactly like a 2-sample shard), so replication is declared by
    top-level dict key: leaves under ``replicated_keys`` are replicated
    verbatim, everything else is concatenated across hosts along axis 0.

    Returns (step, place_state, place_batch); the gradient all-reduce spans
    hosts (GSPMD inserts it over ICI+DCN).
    """
    import jax

    mesh = make_mesh((len(jax.devices()),), (axis,))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    size = mesh.devices.size
    replicated_keys = frozenset(replicated_keys)

    def _split_batch(batch):
        if isinstance(batch, dict):
            shard = {k: v for k, v in batch.items() if k not in replicated_keys}
            const = {k: v for k, v in batch.items() if k in replicated_keys}
            return shard, const
        return batch, {}

    def _is_batch_leaf(x):
        return np.ndim(x) >= 1 and x.shape[0] > 0 and x.shape[0] % size == 0

    def wrapped(state, batch, *extra):
        shard, const = _split_batch(batch)
        shard = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, bsh)
            if _is_batch_leaf(x) else x,
            shard,
        )
        if isinstance(batch, dict):
            batch = {**shard, **const}
        else:
            batch = shard
        return inner(state, batch, *extra)

    def place_state(state):
        # parameters are identical on every host (same seed init / same
        # checkpoint), so replicating host-local values is well-defined
        return jax.device_put(state, repl)

    def place_batch(local_batch):
        shard, const = _split_batch(local_batch)

        def put_shard(x):
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(axis) if np.ndim(x) >= 1 else P()),
                np.asarray(x),
            )

        def put_const(x):
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), np.asarray(x)
            )

        placed = jax.tree_util.tree_map(put_shard, shard)
        if isinstance(local_batch, dict):
            placed.update(
                {k: jax.tree_util.tree_map(put_const, v) for k, v in const.items()}
            )
        return placed

    step = jax.jit(wrapped, donate_argnums=(0,), out_shardings=(repl, repl))
    return step, place_state, place_batch


def make_spatial_infer(model, mesh: Mesh, axis: str = "space"):
    """Whole-volume forward with the H axis sharded across the mesh.

    For tomograms too large for one chip's HBM (SURVEY.md §5 "long-context"
    analog): params replicated, activations spatially partitioned, halo
    exchanges inserted by XLA for every conv window crossing a shard edge.
    """
    vol_sharding = spatial_sharding(mesh, axis=axis)
    repl = NamedSharding(mesh, P())

    @jax.jit
    def forward(params, batch_stats, volume):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, volume, train=False
        )

    def run(params, batch_stats, volume):
        params = jax.device_put(params, repl)
        batch_stats = jax.device_put(batch_stats, repl)
        volume = jax.device_put(volume, vol_sharding)
        return forward(params, batch_stats, volume)

    return run
