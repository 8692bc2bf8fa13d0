"""Embedding extraction for the exploration module.

Rebuild of reference cet_pick/simsiam_test_hm_2d3d.py:151-245 (2d3d) and
simsiam_test_hm_3d.py (3d): re-mine the DoG candidates, normalize each patch
with the dataset statistics (test-time transforms are CenterCrop + Normalize
only, simsiam_test_hm_2d3d.py:47-53), run ``forward_test`` in large batches,
and dump ``all_output_info.npz`` with the reference's exact keys:

    proj, pred, name, coords, subvol          (3d mode)
    proj, pred, name, coords, subvol, subvols_2d   (2d3d mode)

so plot_2d / phoenix visualization tooling is drop-in compatible
(:230-232 / simsiam_test_hm_3d.py:193-195).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _fwd_fns(config, params, batch_stats):
    """Jitted forward_test closures over fixed params (2d3d + 3d variants)."""
    from cet_pick_tpu.models.simsiam import create_simsiam

    model = create_simsiam(config)

    @jax.jit
    def fwd(x2d, x3d):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x2d, x3d, method=model.forward_test,
        )

    @jax.jit
    def fwd_2donly(x2d):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x2d, None, method=model.forward_test,
        )

    return model.mode, fwd, fwd_2donly


def prepare_embed(config, params, batch_stats, batch_size=256):
    """Compile + warm-run forward_test on its static (batch_size, bbox,
    bbox, 1) patch shape ((batch_size, *vol_out_size, 1) in vol mode).
    cmd_embed runs this concurrently with the ExploreDataset build (DoG
    mining + patch extraction) so the remote backend handshake + XLA
    compile stop serializing behind it — the same schedule as
    train/refine.prepare_refine."""
    mode, fwd, fwd_2donly = prepared = _fwd_fns(config, params, batch_stats)
    if mode == "vol":
        from cet_pick_tpu.ops.augment import vol_out_size

        z = np.zeros((batch_size,) + vol_out_size(config.vol_size) + (1,),
                     np.float32)
    else:
        z = np.zeros((batch_size, int(config.bbox), int(config.bbox), 1),
                     np.float32)
    out = fwd(z, z) if mode == "2d3d" else fwd_2donly(z)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    del out
    return prepared


def extract_embeddings(config, dataset, params, batch_stats, batch_size=256,
                       prepared=None):
    """Run forward_test over every candidate patch; returns the npz dict.

    ``prepared``: the result of :func:`prepare_embed` when the caller
    overlapped compilation with the dataset build."""
    if prepared is None:
        prepared = _fwd_fns(config, params, batch_stats)
    mode, fwd, fwd_2donly = prepared

    names, coords, p2s, p3s = [], [], [], []
    for name, coord, p2, p3 in dataset.test_items():
        names.append(name)
        coords.append(coord)
        p3s.append(p3)
        if mode == "2d3d":
            p2s.append(p2)

    n = len(p3s)
    if n == 0:
        raise ValueError(
            "no candidate patches to embed — DoG mining found nothing in the "
            "test tomogram(s); lower --dog sigmas or check the input volume"
        )
    projs, preds = [], []
    sub3 = np.stack(p3s).astype(np.float32)
    if mode == "vol":
        # deterministic test view: center crop + znorm/rescale/znorm (the
        # tio pipeline minus randomness); the npz keeps the RAW subvols
        from cet_pick_tpu.ops.augment import vol_test_view

        x3_all = vol_test_view(sub3)
    else:
        x3_all = (sub3 - dataset.mean_3d) / dataset.std_3d
    if mode == "2d3d":
        sub2 = np.stack(p2s).astype(np.float32)
        x2_all = (sub2 - dataset.mean_2d) / dataset.std_2d

    def pad_batch(x, end, start):
        # pad the remainder batch up to batch_size so the jitted forward
        # compiles for ONE shape; the extra rows are sliced off below
        if end - start < batch_size:
            reps = np.repeat(x[-1:], batch_size - (end - start), axis=0)
            return np.concatenate([x, reps])
        return x

    def batches():
        for start in range(0, n, batch_size):
            end = min(start + batch_size, n)
            x3 = pad_batch(x3_all[start:end], end, start)[..., None]
            if mode == "2d3d":
                x2 = pad_batch(x2_all[start:end], end, start)[..., None]
                yield end - start, (x2, x3)
            else:
                yield end - start, (x3,)

    from cet_pick_tpu.data.prefetch import PrefetchIterator

    # batch i+1's host->device transfer rides behind batch i's forward
    # (reference uses a 1-worker DataLoader over PrefetchDatasetProj,
    # simsiam_test_hm_2d3d.py:165)
    # ... and batch i-1's OUTPUT fetch rides behind batch i's forward
    # (fetched one batch late, after the next dispatch is in flight)
    pending = None

    def drain(p):
        if p is None:
            return
        kept_, out_ = p
        projs.append(np.asarray(out_["proj"])[:kept_])
        preds.append(np.asarray(out_["pred"])[:kept_])

    with PrefetchIterator(
        batches(), depth=2,
        device_put=lambda item: (item[0], jax.device_put(item[1])),
    ) as it:
        for kept, xs in it:
            out = fwd(*xs) if mode == "2d3d" else fwd_2donly(*xs)
            drain(pending)
            pending = (kept, out)
    drain(pending)

    result = {
        "proj": np.concatenate(projs),
        "pred": np.concatenate(preds),
        "name": np.array(names),
        "coords": np.stack(coords),
        "subvol": sub3,
    }
    if mode == "2d3d":
        result["subvols_2d"] = sub2
    return result


def save_embeddings(config, result, out_dir=None):
    """Write all_output_info.npz (simsiam_test_hm_2d3d.py:230-232)."""
    out_dir = out_dir or config.save_dir
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "all_output_info.npz")
    np.savez(path, **result)
    return path
