"""Continuous picking service: watch a directory, pick new tomograms.

No reference analog — nextpyp/cet_pick ships batch scripts only (test.py
runs a fixed list and exits). This is the production serving surface over
the exact same pipeline as ``cet_pick_tpu test``: one long-lived
``TomoDetector`` whose compiled XLA programs persist across volumes
(TiledHeatmapInference keeps a bounded plan cache), so the service pays
compilation once per volume geometry; each new file then costs only
read -> quantize(uint8) -> async device transfer -> forward -> decode ->
reference-format writers (identical outputs to `test` on the same file).

Service semantics:

* **File completeness.** Reconstruction jobs write ``.rec`` files over
  seconds to minutes; reading a half-written volume would corrupt picks.
  A file is claimed only when its (size, mtime) is identical across two
  consecutive polls (``once=True`` skips the wait and takes the current
  snapshot — backlog mode).
* **Restart safety.** Processed files are recorded in
  ``<out>/.watch_manifest.tsv`` (path, size, mtime, status, n_picks,
  seconds); a restarted service resumes where it left off. A file that
  changes size/mtime after being processed is picked up again (updated
  reconstruction -> refreshed picks, same output names).
* **Error isolation.** A corrupt volume is logged + recorded as
  ``failed`` and the service keeps running; it is retried only if the
  file changes on disk.
* **Pipelining.** Volume loading/quantization runs on a producer thread
  with the device transfer dispatched asynchronously behind the previous
  volume's forward (data/prefetch.py), and a writer thread runs the large
  heatmap fetch + post-process + file writes behind the next volume's
  forward — exactly run_test's streamed schedule at both ends, so a
  backlog drains at the same rate `test` achieves.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

MANIFEST = ".watch_manifest.tsv"
_EXTS = (".rec", ".mrc", ".mrcs")


def _scan(watch_dir: str) -> Dict[str, Tuple[int, int]]:
    """Map of path -> (size, mtime_ns) for candidate volume files."""
    out = {}
    try:
        entries = sorted(os.scandir(watch_dir), key=lambda e: e.name)
    except FileNotFoundError:
        return out
    for e in entries:
        if e.is_file() and e.name.lower().endswith(_EXTS):
            st = e.stat()
            out[e.path] = (st.st_size, st.st_mtime_ns)
    return out


def _load_manifest(out_dir: str) -> Dict[str, Tuple[int, int]]:
    path = os.path.join(out_dir, MANIFEST)
    done: Dict[str, Tuple[int, int]] = {}
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 3 and not line.startswith("#"):
                done[parts[0]] = (int(parts[1]), int(parts[2]))
    return done


def _append_manifest(out_dir: str, path: str, stat: Tuple[int, int],
                     status: str, n_picks: int, secs: float):
    os.makedirs(out_dir, exist_ok=True)
    mpath = os.path.join(out_dir, MANIFEST)
    header = not os.path.exists(mpath)
    with open(mpath, "a") as f:
        if header:
            f.write("# path\tsize\tmtime_ns\tstatus\tn_picks\tseconds\n")
        f.write(f"{path}\t{stat[0]}\t{stat[1]}\t{status}\t{n_picks}"
                f"\t{secs:.3f}\n")


def _stream(config, items):
    """The exact `test` streaming schedule (detector.stream_quantized_volumes
    — ONE shared implementation, so the two can't drift) with per-file error
    isolation: a failed load yields (name, None, 0, 0, exc) instead of
    killing the stream; the service must outlive one corrupt volume."""
    from cet_pick_tpu.infer.detector import stream_quantized_volumes

    return stream_quantized_volumes(
        config, [n for n, _ in items], [p for _, p in items],
        isolate_errors=True,
    )


def process_files(det, config, paths, out_dir, warm=False, log_fn=print):
    """Run the detector over a list of volume files; returns
    {path: (status, n_picks, seconds)}. Outputs are identical to `test` on
    the same files (same TomoDetector stages + writers).

    Same write-behind schedule as run_test: a writer thread runs file i's
    large heatmap fetch + post-process + file writes while file i+1's
    forward computes — but with per-file error isolation (a writer failure
    marks that file failed instead of stopping the service).

    ``warm=True`` pre-compiles for the first file's header-predicted
    geometry while its data loads (run_test's schedule); the service passes
    it only on the first batch — at steady state the compiled programs are
    already cached and re-warming would just burn a zeros forward."""
    import queue
    import threading

    results = {}
    items = [(os.path.splitext(os.path.basename(p))[0], p) for p in paths]
    q = queue.Queue(maxsize=2)  # bounds heatmaps held on device

    def writer():
        while True:
            item = q.get()
            if item is None:
                return
            name, path, hm_dev, dets, t0, t_net, t_wall = item
            try:
                r = det._finish(hm_dev, dets, name, out_dir, t0, t_net)
                n = sum(len(v) for v in r["z_groups"].values())
                results[path] = ("ok", n, r["times"]["tot"])
                log_fn(f"watch: {name} -> {n} picks " + " ".join(
                    f"{k} {v:.3f}s" for k, v in r["times"].items()))
            except Exception as e:  # noqa: BLE001 — recorded, service lives
                results[path] = ("failed", 0, time.time() - t_wall)
                log_fn(f"watch: {name} FAILED: {type(e).__name__}: {e}")

    w = threading.Thread(target=writer, daemon=True)
    w.start()
    try:
        with _stream(config, items) as vols:
            if warm:
                from cet_pick_tpu.infer.detector import warm_from_header

                warm_from_header(det, [p for _, p in items], config)
            # the stream yields strictly in input order (FIFO queue over a
            # sequential producer), so zip recovers each item's path
            for (name, path), (_, v_dev, lo, hi, err) in zip(items, vols):
                t_wall = time.time()
                if err is None:
                    try:
                        hm_dev, dets, t0, t_net = det._compute(
                            v_dev, lo=lo, hi=hi)
                        q.put((name, path, hm_dev, dets, t0, t_net, t_wall))
                        continue
                    except Exception as e:  # noqa: BLE001
                        err = e
                results[path] = ("failed", 0, time.time() - t_wall)
                log_fn(f"watch: {name} FAILED: {type(err).__name__}: {err}")
    finally:
        q.put(None)
        w.join()
    return results


def run_watch(config, watch_dir: str, out_dir: Optional[str] = None,
              poll_s: float = 5.0, once: bool = False,
              max_cycles: Optional[int] = None, log_fn=print) -> Dict:
    """Serve picks from a directory until interrupted (or, with ``once``,
    drain the current backlog and return). Returns {path: status}."""
    from cet_pick_tpu.infer.detector import TomoDetector

    out_dir = out_dir or config.out_path
    det = TomoDetector(config)
    done = _load_manifest(out_dir)
    served: Dict[str, str] = {}
    pending: Dict[str, Tuple[int, int]] = {}
    cycles = 0
    first_batch = True
    log_fn(f"watch: serving {watch_dir} -> {out_dir} "
           f"({len(done)} already in manifest)")
    while True:
        stats = _scan(watch_dir)
        fresh = {p: s for p, s in stats.items() if done.get(p) != s}
        if once:
            ready = sorted(fresh)
        else:
            ready = sorted(p for p, s in fresh.items() if pending.get(p) == s)
        pending = fresh
        if ready:
            res = process_files(det, config, ready, out_dir,
                                warm=first_batch, log_fn=log_fn)
            first_batch = False
            # iterate in claim order, not completion order: the writer thread
            # may record results out of order, but the manifest stays
            # deterministic (tests pin its row order)
            for p in (p for p in ready if p in res):
                status, n, secs = res[p]
                stat = stats[p]
                _append_manifest(out_dir, p, stat, status, n, secs)
                done[p] = stat
                served[p] = status
                pending.pop(p, None)
        cycles += 1
        if once or (max_cycles is not None and cycles >= max_cycles):
            return served
        try:
            time.sleep(poll_s)
        except KeyboardInterrupt:
            log_fn("watch: interrupted, exiting")
            return served
