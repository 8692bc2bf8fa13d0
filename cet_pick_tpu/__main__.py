"""Unified CLI: ``python -m cet_pick_tpu <command> [--flags]``.

One dispatcher covering the reference's entry-script surface (reference
scripts in parentheses):

  train             refinement training            (main.py semi/semi3d/semiclass)
  test              refinement inference           (test.py semi)
  classify-test     semiclass greedy-NMS inference (test_class.py)
  explore           exploration training           (simsiam_main.py)
  moco              MoCo exploration training      (moco_main.py)
  classify          voxel classifier training      (main_class.py)
  fewshot           few-shot kmeans training       (main.py fs)
  denoise           blind-spot denoiser training   (denoise task)
  embed             embedding extraction           (simsiam_test_hm_{2d3d,3d}.py, moco_test*.py)
  scan              SCAN head over embeddings      (scan task, frozen feats)
  scan-finetune     full-model SCAN + self-label   (scan/scan2d3d tasks)
  plot2d            clustering + 2D visualization  (plot_2d.py)
  phoenix           interactive 3D browser         (phoenix_visualization.py)
  to-coords         parquet -> training coords     (interactive_to_training_coords.py)
  sublabels         select cluster labels          (select_sublabels.py)
  visualize3d       napari overlay volumes         (visualize_3dhm.py)
  merge             merge detection txts           (merge_output.py)
  pr-curve          PR / F1 evaluation             (precision_recall_curve.py)
  remove-golds      drop fiducial detections       (remove_golds.py)
  gen-files         scan dir -> img/coord lists    (utils/generate_train_file.py)
  extract-spectrum  radial power spectrum -> txt   (cryoDRGN long tail)
  match-spectrum    equalize volume spectra        (cryoDRGN long tail)
  backproject       Fourier-voxel reconstruction   (cryoDRGN long tail)
  export-torch      checkpoint -> reference .pth   (inverse of --load_model model.pth)
  import-torch      reference .pth -> checkpoint   (one-shot migration into the framework)
  watch             continuous picking service     (no reference analog)
  flags             full flag reference            (generates docs/flags.md)
  doctor            runtime health check JSON      (no reference analog)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from cet_pick_tpu.cli.common import add_config_arguments, config_from_args
from cet_pick_tpu.config import Config


def _check_inputs(cfg, *files):
    """Fail fast on missing input files BEFORE the minutes-long device
    setup the overlapped commands pay up front."""
    for f in files:
        p = os.path.join(cfg.data_dir, f)
        if not os.path.exists(p):
            raise FileNotFoundError(p)


def _overlapped(build_fn):
    """Run ``build_fn`` (a dataset build — pure host work) on a sibling
    thread so the caller can run the device-side setup (backend handshake +
    jitted init + step compile, minutes on a remote-attached TPU)
    concurrently. Returns ``join()`` -> the built value (re-raises the
    build's exception)."""
    import threading

    holder, errs = {}, []

    def _run():
        try:
            holder["v"] = build_fn()
        except BaseException as e:  # surfaced at join()
            errs.append(e)

    th = threading.Thread(target=_run, daemon=True)
    th.start()

    def join():
        th.join()
        if errs:
            raise errs[0]
        return holder["v"]

    return join


def cmd_train(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu train")
    add_config_arguments(parser, Config(task="semi", contrastive=True))
    cfg = config_from_args(parser.parse_args(argv))
    from cet_pick_tpu.utils.logger import Logger

    logger = Logger(cfg)

    log = logger.log
    if cfg.task == "semiclass":
        # fill/unfill voxel-classification training (main.py --task semiclass)
        from cet_pick_tpu.data.classify_dataset import SemiClassDataset
        from cet_pick_tpu.train.refine import prepare_refine
        from cet_pick_tpu.train.semiclass import (
            check_semiclass_config, train_semiclass,
        )

        check_semiclass_config(cfg)
        _check_inputs(cfg, cfg.train_img_txt, cfg.train_coord_txt)
        # overlap the dataset build with the device-side setup (the step is
        # shared with the semi task — train/refine.prepare_refine)
        join = _overlapped(lambda: (
            SemiClassDataset(cfg, "train"),
            SemiClassDataset(cfg, "val") if cfg.val_intervals > 0 else None,
        ))
        prepared = prepare_refine(cfg, log_fn=log, pairs=1, label=True)
        train_ds, val_ds = join()
        train_semiclass(cfg, train_ds, val_dataset=val_ds, log_fn=log,
                        prepared=prepared)
    elif cfg.task in ("tomo", "cr"):
        # dedicated supervised baselines (tomo_trainer.py / tomo_cr_trainer.py)
        from cet_pick_tpu.data.refine_dataset import RefineDataset
        from cet_pick_tpu.train.supervised import train_supervised

        train_ds = RefineDataset(cfg, "train")
        train_supervised(cfg, train_ds, log_fn=log)
    else:
        from cet_pick_tpu.data.refine_dataset import RefineDataset
        from cet_pick_tpu.train.refine import prepare_refine, train_refine

        _check_inputs(cfg, cfg.train_img_txt, cfg.train_coord_txt)
        # the dataset build (disk read + preprocess + heatmap splat) is pure
        # host work and every train-step shape is static, so it overlaps the
        # device-side setup on a sibling thread (prepare_refine)
        join = _overlapped(lambda: (
            RefineDataset(cfg, "train"),
            RefineDataset(cfg, "val") if cfg.val_intervals > 0 else None,
        ))
        prepared = prepare_refine(cfg, log_fn=log)
        train_ds, val_ds = join()
        train_refine(cfg, train_ds, val_dataset=val_ds, log_fn=log,
                     prepared=prepared)
    logger.close()


def cmd_test(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu test")
    add_config_arguments(parser, Config(task="semi"))
    cfg = config_from_args(parser.parse_args(argv))
    if not cfg.load_model:
        cfg.load_model = os.path.join(cfg.save_dir, "model_last")
    from cet_pick_tpu.infer.detector import run_test

    run_test(cfg)


def cmd_watch(argv):
    """Continuous picking service over a watched directory (infer/watch.py):
    `test` as a long-lived daemon — same detector, same outputs, plus
    file-stability claiming, a restart manifest, and per-file error
    isolation. No reference analog (the reference is batch scripts only)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu watch")
    parser.add_argument("--watch_dir", required=True,
                        help="directory to poll for new .rec/.mrc volumes")
    parser.add_argument("--poll", type=float, default=5.0,
                        help="poll interval in seconds")
    parser.add_argument("--once", action="store_true",
                        help="drain the current backlog and exit")
    add_config_arguments(parser, Config(task="semi"))
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    if not cfg.load_model:
        cfg.load_model = os.path.join(cfg.save_dir, "model_last")
    from cet_pick_tpu.infer.watch import run_watch

    run_watch(cfg, args.watch_dir, poll_s=args.poll, once=args.once)


def cmd_classify_test(argv):
    """Semiclass inference with greedy spherical NMS (test_class.py)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu classify-test")
    add_config_arguments(parser, Config(task="semiclass", ge=True, nms=7))
    cfg = config_from_args(parser.parse_args(argv))
    if not cfg.load_model:
        cfg.load_model = os.path.join(cfg.save_dir, "model_last")
    from cet_pick_tpu.infer.classify import run_classify_test

    run_classify_test(cfg)


def cmd_explore(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu explore")
    add_config_arguments(
        parser,
        Config(task="simsiam2d3d", arch="simsiam2d3d_18", bbox=36,
               batch_size=256, lr=1e-3, cosine=True, num_epochs=20),
    )
    cfg = config_from_args(parser.parse_args(argv))
    from cet_pick_tpu.data.explore_dataset import ExploreDataset
    from cet_pick_tpu.train.explore import prepare_explore, train_explore
    from cet_pick_tpu.utils.logger import Logger

    _check_inputs(cfg, cfg.train_img_txt)
    logger = Logger(cfg)
    log = logger.log

    # overlap the dataset build (DoG mining + tilt-sum extraction) with the
    # device-side setup — see train/explore.prepare_explore
    join = _overlapped(lambda: ExploreDataset(cfg, "train"))
    prepared = prepare_explore(cfg, log_fn=log)
    train_explore(cfg, join(), log_fn=log, prepared=prepared)
    logger.close()


def cmd_moco(argv):
    """MoCo exploration training (moco_main.py)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu moco")
    add_config_arguments(
        parser,
        Config(task="moco", arch="simsiam2d_18", bbox=36, batch_size=128,
               lr=1e-3, cosine=True, num_epochs=20, head_conv=256),
    )
    cfg = config_from_args(parser.parse_args(argv))
    from cet_pick_tpu.data.explore_dataset import ExploreDataset
    from cet_pick_tpu.train.moco import prepare_moco, train_moco
    from cet_pick_tpu.utils.logger import Logger

    _check_inputs(cfg, cfg.train_img_txt)
    logger = Logger(cfg)
    log = logger.log

    # overlap the dataset build with the device-side setup (train/moco)
    join = _overlapped(lambda: ExploreDataset(cfg, "train"))
    prepared = prepare_moco(cfg, log_fn=log)
    train_moco(cfg, join(), log_fn=log, prepared=prepared)
    logger.close()


def cmd_embed(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu embed")
    add_config_arguments(
        parser, Config(task="simsiam2d3d", arch="simsiam2d3d_18", bbox=36)
    )
    cfg = config_from_args(parser.parse_args(argv))
    if not cfg.load_model:
        cfg.load_model = os.path.join(cfg.save_dir, "model_last")
    import jax
    import numpy as np

    from cet_pick_tpu.data.explore_dataset import ExploreDataset
    from cet_pick_tpu.infer.embed import (
        extract_embeddings, prepare_embed, save_embeddings,
    )
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.explore import create_simsiam_state
    from cet_pick_tpu.train.state import load_checkpoint

    _check_inputs(cfg, cfg.test_img_txt)
    # overlap the dataset build (DoG mining + patch extraction) with the
    # checkpoint load + forward compile (infer/embed.prepare_embed)
    join = _overlapped(lambda: ExploreDataset(cfg, "test"))
    model = create_simsiam(cfg)
    if cfg.load_model.endswith((".pth", ".pt")):
        if model.mode == "vol":
            raise SystemExit(
                "3D-subvolume encoders (arch simsiam_N/moco3d_N) have no "
                "torch conversion; load a framework checkpoint directory"
            )
        # trained reference exploration checkpoint: convert in place
        import torch

        from cet_pick_tpu.models.convert import simsiam_state_dict_to_flax

        ckpt = torch.load(cfg.load_model, map_location="cpu")
        sd = {k: v.numpy() for k, v in ckpt.get("state_dict", ckpt).items()
              if hasattr(v, "numpy")}
        params, batch_stats = simsiam_state_dict_to_flax(sd)
    else:
        from cet_pick_tpu.train.explore import dummy_explore_batch

        sample = dummy_explore_batch(cfg, model.mode)
        state = create_simsiam_state(model, cfg, jax.random.PRNGKey(0), sample)
        moco_path = os.path.join(cfg.load_model, "moco_state.msgpack")
        if (not os.path.exists(os.path.join(cfg.load_model, "state.msgpack"))
                and os.path.exists(moco_path)):
            # MoCo checkpoint: embed with the QUERY encoder (the reference's
            # moco_test* loads model_q the same way)
            from flax import serialization

            with open(moco_path, "rb") as f:
                loaded = serialization.msgpack_restore(f.read())
            params = serialization.from_state_dict(state.params,
                                                   loaded["params"])
            batch_stats = serialization.from_state_dict(
                state.batch_stats, loaded["batch_stats"])
        else:
            state = load_checkpoint(cfg.load_model, state)
            params, batch_stats = state.params, state.batch_stats
    prepared = prepare_embed(cfg, params, batch_stats)
    result = extract_embeddings(cfg, join(), params, batch_stats,
                                prepared=prepared)
    path = save_embeddings(cfg, result)
    print(f"saved {path}")


def cmd_classify(argv):
    """Voxel classifier training (task tcla, main_class.py)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu classify")
    add_config_arguments(parser, Config(task="tcla", arch="unet_4", pn=True))
    cfg = config_from_args(parser.parse_args(argv))
    from cet_pick_tpu.data.refine_dataset import RefineDataset
    from cet_pick_tpu.train.classify import train_classify
    from cet_pick_tpu.utils.logger import Logger

    ds = RefineDataset(cfg, "train")
    logger = Logger(cfg)

    log = logger.log
    train_classify(cfg, ds, log_fn=log)
    logger.close()


def cmd_fewshot(argv):
    """Few-shot constrained-kmeans training (task fs,
    trains/tomo_fewshot_cr_trainer.py)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu fewshot")
    add_config_arguments(
        parser,
        Config(task="fs", arch="unet_4", contrastive=True, batch_size=1,
               lr=1e-3, num_epochs=20),
    )
    parser.add_argument("--write_picks", action="store_true",
                        help="decode target-prototype similarity into "
                             "detection txts after training")
    a = parser.parse_args(argv)
    cfg = config_from_args(a)
    import numpy as np

    from cet_pick_tpu.data.fewshot_dataset import FewshotDataset
    from cet_pick_tpu.train.fewshot import fewshot_similarity, train_fewshot
    from cet_pick_tpu.utils.logger import Logger

    ds = FewshotDataset(cfg, "train")
    logger = Logger(cfg)

    log = logger.log
    state, centers, _ = train_fewshot(cfg, ds, log_fn=log)
    if a.write_picks:
        from cet_pick_tpu.models.detector import create_detector
        from cet_pick_tpu.ops.decode import tomo_decode

        model = create_detector(cfg)
        os.makedirs(cfg.out_path, exist_ok=True)
        for i, name in enumerate(ds.names):
            sim = fewshot_similarity(model, state, centers, ds.tomos[i])
            dets = np.asarray(tomo_decode(np.asarray(sim), kernel=cfg.nms,
                                          k=cfg.K))
            out = os.path.join(cfg.out_path, f"{name}.txt")
            with open(out, "w") as f:
                for x, y, z, s, _ in dets:
                    if s > cfg.out_thresh:
                        f.write(f"{int(x * cfg.down_ratio)}\t{int(z)}\t"
                                f"{int(y * cfg.down_ratio)}\n")
            log(f"wrote {out}")
    logger.close()


def cmd_denoise(argv):
    """Self-supervised denoise training + volume output (task denoise)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu denoise")
    add_config_arguments(
        parser, Config(task="denoise", arch="unet_4", lr=1e-3, batch_size=8)
    )
    parser.add_argument("--crop", type=int, default=128)
    parser.add_argument("--exclude", type=int, default=200,
                        help="border band crops never touch (reference "
                             "RandomCropNoBorder exclude, tomo_denoise.py:51)")
    parser.add_argument("--write_denoised", action="store_true")
    a = parser.parse_args(argv)
    cfg = config_from_args(a)
    # Config.num_iters (-1 = unset) doubles as the iteration budget here
    a.num_iters = cfg.num_iters if cfg.num_iters > 0 else 2000
    import numpy as np

    from cet_pick_tpu.io.coords import read_image_list
    from cet_pick_tpu.io.loader import load_tomos_from_list
    from cet_pick_tpu.io.mrc import write_mrc
    from cet_pick_tpu.train.denoise import (
        DenoiseDataset, create_denoise_state, denoise_volume,
        load_denoise_checkpoint, save_denoise_checkpoint, train_denoise,
    )
    from cet_pick_tpu.utils.logger import Logger

    il = read_image_list(os.path.join(cfg.data_dir, cfg.train_img_txt))
    images = load_tomos_from_list(
        il.image_name, il.rec_path,
        order=cfg.order, compress=cfg.compress, denoise=cfg.gauss,
    )
    logger = Logger(cfg)

    log = logger.log
    if cfg.load_model:
        # apply-only: restore a trained denoiser instead of re-training
        import jax

        state, models = create_denoise_state(
            cfg, jax.random.PRNGKey(cfg.seed), crop=a.crop
        )
        state = load_denoise_checkpoint(cfg.load_model, state)
        log(f"loaded denoiser from {cfg.load_model} (step {state.step})")
    else:
        ds = DenoiseDataset(images, crop=a.crop, exclude=a.exclude)
        state, models, _ = train_denoise(cfg, ds, num_iters=a.num_iters,
                                         crop=a.crop, log_fn=log)
        ck = os.path.join(cfg.save_dir, "model_last")
        save_denoise_checkpoint(ck, state, cfg)
        log(f"saved denoiser to {ck}")
    if a.write_denoised:
        for name, vol in images.items():
            den = denoise_volume(models, state, np.asarray(vol, np.float32))
            out = os.path.join(cfg.save_dir, f"{name}_denoised.mrc")
            write_mrc(out, den)
            log(f"wrote {out}")
    logger.close()


def cmd_scan(argv):
    """SCAN semantic clustering over extracted embeddings (scan task)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu scan")
    parser.add_argument("--input", required=True, help="all_output_info.npz")
    parser.add_argument("--out", required=True, help="output npz with labels")
    parser.add_argument("--n_clusters", type=int, required=True)
    parser.add_argument("--neighbors", type=int, default=20)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--entropy_weight", type=float, default=2.0)
    a = parser.parse_args(argv)
    import numpy as np

    from cet_pick_tpu.train.scan import (
        mine_neighbors, scan_evaluate, train_scan_head,
    )

    data = np.load(a.input)
    feats = data["pred"].astype(np.float32)
    nb = mine_neighbors(feats, k=a.neighbors)
    _, _, assign = train_scan_head(
        feats, nb, a.n_clusters, num_steps=a.steps, lr=a.lr,
        entropy_weight=a.entropy_weight,
    )
    consistency = scan_evaluate(assign, nb)
    np.savez(a.out, label=assign, name=data["name"], coords=data["coords"])
    print(f"saved {a.out}; neighbor consistency {consistency:.3f}, "
          f"{len(set(assign.tolist()))} clusters used")


def cmd_scan_finetune(argv):
    """Full-model SCAN fine-tune (+ optional self-labeling) over DoG
    candidates (tasks scan/scan2d3d, trains/tomo_scan_trainer.py)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu scan-finetune")
    add_config_arguments(
        # batch_size seeded here like cmd_explore/cmd_moco: the global
        # default 1 is truthy, so a downstream `or 64` fallback can never
        # fire — SCAN's entropy-of-mean objective degenerates at bs 1
        parser, Config(task="scan2d3d", arch="simsiam2d3d_18", bbox=36,
                       batch_size=64)
    )
    parser.add_argument("--out", required=True, help="output npz with labels")
    parser.add_argument("--neighbors", type=int, default=20)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--scan_lr", type=float, default=1e-4)
    parser.add_argument("--entropy_weight", type=float, default=2.0)
    parser.add_argument("--cluster_head", action="store_true",
                        help="update only the cluster head (reference "
                             "--cluster_head; default fine-tunes everything)")
    parser.add_argument("--selflabel_steps", type=int, default=0)
    parser.add_argument("--selflabel_threshold", type=float, default=0.99)
    a = parser.parse_args(argv)
    cfg = config_from_args(a)
    if not cfg.load_model:
        raise SystemExit("--load_model: trained simsiam checkpoint required")
    import jax
    import numpy as np

    from cet_pick_tpu.data.explore_dataset import ExploreDataset
    from cet_pick_tpu.infer.embed import extract_embeddings, prepare_embed
    from cet_pick_tpu.models.simsiam import create_simsiam
    from cet_pick_tpu.train.explore import create_simsiam_state
    from cet_pick_tpu.train.scan import (
        mine_neighbors, scan_evaluate, train_scan_full,
    )
    from cet_pick_tpu.train.state import load_checkpoint, save_checkpoint

    _check_inputs(cfg, cfg.test_img_txt)
    # overlap the dataset build with checkpoint load + embedding-forward
    # compile (infer/embed.prepare_embed), like cmd_embed
    join = _overlapped(lambda: ExploreDataset(cfg, "test"))
    encoder = create_simsiam(cfg)
    sample = {
        "anchor": np.zeros(
            (1, 2 if encoder.mode == "2d3d" else 1, cfg.bbox, cfg.bbox),
            np.float32,
        )
    }
    enc_state = create_simsiam_state(encoder, cfg, jax.random.PRNGKey(0), sample)
    enc_state = load_checkpoint(cfg.load_model, enc_state)
    prepared = prepare_embed(cfg, enc_state.params, enc_state.batch_stats)
    ds = join()

    result = extract_embeddings(cfg, ds, enc_state.params,
                                enc_state.batch_stats, prepared=prepared)
    nb = mine_neighbors(result["pred"].astype(np.float32), k=a.neighbors)
    # normalize the patch stacks exactly like the embedding pass did
    # (infer/embed.py:58-61)
    p3n = (np.stack(ds.patches_3d).astype(np.float32) - ds.mean_3d) / ds.std_3d
    if encoder.mode == "2d3d":
        p2 = (np.stack(ds.patches_2d).astype(np.float32) - ds.mean_2d) / ds.std_2d
        p3 = p3n
    else:
        p2, p3 = p3n, None
    state, model, assign, best_head = train_scan_full(
        cfg, p2, p3, nb, n_clusters=cfg.nclusters, n_heads=cfg.nheads,
        pretext=(enc_state.params, enc_state.batch_stats),
        num_steps=a.steps, batch_size=cfg.batch_size, lr=a.scan_lr,
        entropy_weight=a.entropy_weight, head_only=a.cluster_head,
        selflabel_steps=a.selflabel_steps,
        selflabel_threshold=a.selflabel_threshold, seed=cfg.seed,
    )
    consistency = scan_evaluate(assign, nb)
    np.savez(a.out, label=assign, name=result["name"], coords=result["coords"],
             best_head=best_head)
    ck = os.path.join(cfg.save_dir, "scan_model_last")
    save_checkpoint(ck, state, cfg)
    with open(os.path.join(ck, "best_head.json"), "w") as f:
        json.dump({"best_loss_head": best_head}, f)
    print(f"saved {a.out}; neighbor consistency {consistency:.3f}, "
          f"{len(set(assign.tolist()))} clusters used, best head {best_head}")


def cmd_plot2d(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu plot2d")
    parser.add_argument("--input", required=True)
    parser.add_argument("--path", required=True)
    parser.add_argument("--n_cluster", type=int, required=True)
    parser.add_argument("--num_neighbor", type=int, default=40)
    parser.add_argument("--mode", choices=["tsne", "umap"], default="umap")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--host", type=int, default=7000)
    parser.add_argument("--min_dist_umap", type=float, default=0.5)
    parser.add_argument("--min_dist_vis", type=float, default=0.01)
    parser.add_argument("--save_out_img", type=int, default=1)
    a = parser.parse_args(argv)
    from cet_pick_tpu.viz.plot2d import plot_2d

    plot_2d(a.input, a.path, a.n_cluster, num_neighbor=a.num_neighbor,
            mode=a.mode, seed=a.seed, host=a.host,
            min_dist_umap=a.min_dist_umap, min_dist_vis=a.min_dist_vis,
            save_imgs=a.save_out_img == 1)


def cmd_phoenix(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu phoenix")
    parser.add_argument("--input", required=True)
    parser.add_argument("--port", type=int, default=7000)
    a = parser.parse_args(argv)
    from cet_pick_tpu.viz.interactive import launch_phoenix

    launch_phoenix(a.input, a.port)
    input("Phoenix running; press Enter to exit.\n")


def cmd_to_coords(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu to-coords")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--if_double", action="store_true")
    a = parser.parse_args(argv)
    from cet_pick_tpu.viz.interactive import interactive_to_training_coords

    interactive_to_training_coords(a.input, a.output, a.if_double)


def cmd_sublabels(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu sublabels")
    parser.add_argument("--input", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--use_classes", type=lambda s: [int(v) for v in s.split(",")],
                        required=True)
    parser.add_argument("--if_double", action="store_true")
    a = parser.parse_args(argv)
    from cet_pick_tpu.viz.interactive import select_sublabels

    select_sublabels(a.input, a.out_path, a.use_classes, a.if_double)


def cmd_visualize3d(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu visualize3d")
    parser.add_argument("--input", required=True, help="all_output_info.npz")
    parser.add_argument("--color", required=True, help="all_colors.npy")
    parser.add_argument("--dir_simsiam", required=True)
    parser.add_argument("--image_txt", default=None)
    parser.add_argument("--rec_dir", default=None)
    parser.add_argument("--compress", action="store_true")
    parser.add_argument("--order", default="xzy")
    parser.add_argument("--ext", default=".rec")
    a = parser.parse_args(argv)
    if not a.image_txt and not a.rec_dir:
        parser.error("one of --image_txt or --rec_dir is required "
                     "(where to find the tomogram .rec files)")
    import numpy as np
    import pandas as pd

    from cet_pick_tpu.io.loader import load_rec
    from cet_pick_tpu.viz.tomo3d import render_3d_hm

    data = np.load(a.input)
    names, coords = data["name"], data["coords"]
    colors = np.load(a.color)
    if a.image_txt:
        il = pd.read_csv(a.image_txt, sep="\t")
        pairs = zip(il.image_name, il.rec_path)
    else:
        pairs = ((nm, os.path.join(a.rec_dir, nm) + a.ext)
                 for nm in np.unique(names))
    for nm, rec_path in pairs:
        if not os.path.exists(rec_path):
            print(f"skipping {nm}: {rec_path} not found")
            continue
        rec = load_rec(rec_path, order=a.order, compress=a.compress)
        render_3d_hm(rec, coords, colors, names, nm, a.dir_simsiam)


def cmd_merge(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu merge")
    parser.add_argument("--path", required=True)
    parser.add_argument("--out", required=True)
    a = parser.parse_args(argv)
    from cet_pick_tpu.eval.metrics import merge_output

    print(merge_output(a.path, a.out))


def cmd_pr_curve(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu pr-curve")
    parser.add_argument("--predicted", required=True)
    parser.add_argument("--targets", required=True)
    parser.add_argument("-r", "--assignment-radius", type=int, required=True)
    parser.add_argument("--images", choices=["target", "predicted", "union"],
                        default="target")
    parser.add_argument("--out", default=None, help="PR table tsv")
    a = parser.parse_args(argv)
    import pandas as pd

    from cet_pick_tpu.eval.metrics import evaluate_detections

    targets = pd.read_csv(a.targets, sep="\t")
    predicts = pd.read_csv(a.predicted, sep="\t", comment="#")
    res = evaluate_detections(targets, predicts, a.assignment_radius,
                              images=a.images)
    print(f"# auprc={res['auprc']}, mae={res['mae']}")
    print(f"# best_f1={res['best_f1']}")
    if a.out:
        res["table"].to_csv(a.out, sep="\t", index=False)


def cmd_remove_golds(argv):
    parser = argparse.ArgumentParser(prog="cet_pick_tpu remove-golds")
    parser.add_argument("--path", required=True, help="dir of detection txts")
    parser.add_argument("--gold", required=True, help="dir of *_gold3d.txt files")
    parser.add_argument("--r", type=float, default=20.0)
    parser.add_argument("--out", required=True)
    a = parser.parse_args(argv)
    import glob

    import numpy as np

    from cet_pick_tpu.eval.metrics import remove_golds

    os.makedirs(a.out, exist_ok=True)
    for p in glob.glob(os.path.join(a.path, "*.txt")):
        name = os.path.basename(p).split(".")[0]
        gold_path = os.path.join(a.gold, name + "_gold3d.txt")
        if not os.path.exists(gold_path):
            continue
        ours = np.loadtxt(p, ndmin=2)
        gold = np.loadtxt(gold_path, ndmin=2)
        kept = remove_golds(ours, gold, radius=a.r)
        with open(os.path.join(a.out, name + ".txt"), "w") as f:
            for row in kept:
                f.write("\t".join(str(int(v)) for v in row) + "\n")


def cmd_gen_files(argv):
    """Scan a directory of .rec + coordinate txts into train/test lists
    (utils/generate_train_file.py:17-73)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu gen-files")
    parser.add_argument("--dir", required=True)
    parser.add_argument("--out", required=True, help="output prefix")
    parser.add_argument("--ext", default=".rec")
    parser.add_argument("--ord", choices=["xzy", "xyz", "zxy"], default="xzy")
    parser.add_argument("--inference", action="store_true")
    parser.add_argument("--img_only", action="store_true")
    a = parser.parse_args(argv)
    import glob

    suffix = "_test_imgs.txt" if a.inference else "_train_imgs.txt"
    img_file = os.path.join(a.dir, a.out + suffix)
    with open(img_file, "w") as f1:
        f1.write("image_name\trec_path\n")
        for path in glob.glob(os.path.join(a.dir, "*" + a.ext)):
            f1.write(f"{os.path.basename(path)[: -len(a.ext)]}\t{path}\n")
    print(img_file)
    if a.img_only or a.inference:
        return
    coord_file = os.path.join(a.dir, a.out + "_train_coords.txt")
    with open(coord_file, "w") as f2:
        f2.write("image_name\tx_coord\ty_coord\tz_coord\n")
        for path in glob.glob(os.path.join(a.dir, "*.txt")):
            name = os.path.basename(path)[:-4]
            if name.endswith(("train_imgs", "train_coords", "test_imgs")):
                continue
            for line in open(path):
                parts = line.split()
                if len(parts) < 3:
                    continue
                vals = [int(float(v)) for v in parts[:3]]
                if a.ord == "xzy":
                    x, z, y = vals
                elif a.ord == "xyz":
                    x, y, z = vals
                else:  # zxy
                    z, x, y = vals
                f2.write(f"{name}\t{x}\t{y}\t{z}\n")
    print(coord_file)


def cmd_import_torch(argv):
    """Reference ``.pth`` -> framework checkpoint directory, one shot
    (inverse of export-torch; the same conversions every --load_model
    model.pth path runs in place, persisted so later commands skip torch).

    Families: TomoConvUNet (unet_N), TomoRes3DNet (res3dref_N —
    resnet_3d_small.py semi3d migration), exploration encoders
    (simsiam2d*/simsiam2d3d*, incl. reference MoCo wrappers and torchvision
    ImageNet trunks)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu import-torch")
    add_config_arguments(parser, Config(task="semi"))
    parser.add_argument("--out", required=True,
                        help="output checkpoint directory")
    a = parser.parse_args(argv)
    cfg = config_from_args(a)
    if not cfg.load_model.endswith((".pth", ".pt")):
        print("--load_model must be a reference .pth/.pt file")
        return 2
    import jax
    import numpy as np

    from cet_pick_tpu.train.state import save_checkpoint

    stem = cfg.arch.split("_")[0]
    if stem in ("simsiam", "moco3d"):
        print("the TPU-native 3D-subvolume encoders (simsiam_N/moco3d_N, "
              "VolTrunk) are not weight-compatible with reference .pth "
              "files; import those with the reference-structural arches "
              "--arch simsiamref_18 (simsiam_model.py) or --arch "
              "moco3dref_18 (moco_encoder_3d.py)")
        return 2
    if cfg.arch.startswith(("simsiam", "moco")):
        from cet_pick_tpu.models.convert import load_simsiam_torch
        from cet_pick_tpu.models.simsiam import create_simsiam
        from cet_pick_tpu.train.explore import (
            create_simsiam_state, dummy_explore_batch,
        )

        model = create_simsiam(cfg)
        sample = dummy_explore_batch(cfg, model.mode)
        state = create_simsiam_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                                     sample)
        state = load_simsiam_torch(cfg.load_model, state)
    else:
        from flax import serialization

        from cet_pick_tpu.models.convert import load_reference_checkpoint
        from cet_pick_tpu.models.detector import create_detector
        from cet_pick_tpu.train.state import create_train_state

        model = create_detector(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                                   np.zeros((1, 8, 64, 64), np.float32))
        params, batch_stats = load_reference_checkpoint(cfg.load_model, cfg)
        state = state.replace(
            params=serialization.from_state_dict(state.params, params),
            batch_stats=serialization.from_state_dict(state.batch_stats,
                                                      batch_stats),
        )
    save_checkpoint(a.out, state, cfg)
    print(f"imported {cfg.load_model} -> {a.out} (arch {cfg.arch})")


def cmd_export_torch(argv):
    """Export a trained checkpoint to the reference's ``.pth`` state_dict
    format (the exact inverse of loading a reference ``model_N.pth`` via
    --load_model): a model trained here runs unmodified in nextpyp/cet_pick's
    torch pipeline. Covers the three checkpointed model families:

      unet_N          -> TomoConvUNet       (test.py / main.py --load_model)
      simsiam*        -> TomoResClassifier  (simsiam_test_hm_*.py); MoCo
                         checkpoints export their query encoder
      simsiam* (scan) -> ClusteringModel    (backbone.* + cluster_head.{i}.*)

    Payload layout matches reference models/model.py:283-296
    ({'epoch', 'state_dict'}); tensor mappings are
    models/convert.flax_to_torch_state_dict /
    simsiam_flax_to_torch_state_dict, golden-tested against the actual
    reference models in tests/test_convert.py. The restore is template-free
    (msgpack_restore), so no model init or forward pass is needed."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu export-torch")
    parser.add_argument(
        "--load_model", required=True,
        help="checkpoint directory (contains state.msgpack + opt.json)",
    )
    parser.add_argument("--out", required=True, help="output .pth path")
    a = parser.parse_args(argv)

    import numpy as np
    import torch
    from flax import serialization

    from cet_pick_tpu.models.convert import (
        flax_to_torch_state_dict, simsiam_flax_to_torch_state_dict,
    )

    opt_json = os.path.join(a.load_model, "opt.json")
    if not os.path.exists(opt_json):
        print(f"no opt.json beside the checkpoint ({opt_json}); "
              "only checkpoints written by this package can be exported")
        return 2
    cfg = Config.load(opt_json)
    if (not cfg.arch.startswith(("unet", "simsiam", "res3dref", "moco3dref"))
            or cfg.arch.split("_")[0] in ("simsiam", "moco3d", "unetw")):
        print(f"export-torch supports the reference TomoConvUNet (unet_N), "
              f"patch-exploration (simsiam2d*/simsiam2d3d*), subvolume "
              f"migration encoders (simsiamref_N/moco3dref_N), and res3dref "
              f"(TomoRes3DNet) families; checkpoint has arch {cfg.arch!r} "
              f"(the TPU-native VolTrunk encoders simsiam_N/moco3d_N have "
              f"no reference structural counterpart — train with the *ref "
              f"arches if round-tripping to torch matters)")
        return 2
    state_path = os.path.join(a.load_model, "state.msgpack")
    moco_path = os.path.join(a.load_model, "moco_state.msgpack")
    if os.path.exists(state_path):
        path = state_path
    elif os.path.exists(moco_path):
        path = moco_path
    else:
        print(f"no state.msgpack / moco_state.msgpack in {a.load_model}")
        return 2
    with open(path, "rb") as f:
        loaded = serialization.msgpack_restore(f.read())
    params = loaded["params"]
    stats = loaded.get("batch_stats") or {}

    if cfg.arch.startswith("unet"):
        n_blocks = int(cfg.arch.split("_")[1]) if "_" in cfg.arch else 4
        sd = flax_to_torch_state_dict(params, stats, n_blocks, cfg.heads)
    elif cfg.arch.startswith("res3dref"):
        from cet_pick_tpu.models.convert import res3d_flax_to_torch_state_dict

        sd = res3d_flax_to_torch_state_dict(params, cfg.heads)
    elif cfg.arch.split("_")[0] in ("simsiamref", "moco3dref"):
        from cet_pick_tpu.models.convert import (
            moco_ref3d_flax_to_torch_state_dict,
            simsiam_ref3d_flax_to_torch_state_dict,
        )

        fn = (simsiam_ref3d_flax_to_torch_state_dict
              if cfg.arch.startswith("simsiamref")
              else moco_ref3d_flax_to_torch_state_dict)
        sd = fn(params, stats)
    elif cfg.arch.startswith("simsiam") and "backbone" in params:
        # SCAN ClusteringModel: backbone.* + cluster_head.{i}.{weight,bias}
        sd = {
            "backbone." + k: v
            for k, v in simsiam_flax_to_torch_state_dict(
                params["backbone"], stats.get("backbone", {})
            ).items()
        }
        i = 0
        while f"head{i}" in params:
            sd[f"cluster_head.{i}.weight"] = np.transpose(
                np.asarray(params[f"head{i}"]["kernel"]), (1, 0))
            sd[f"cluster_head.{i}.bias"] = np.asarray(
                params[f"head{i}"]["bias"])
            i += 1
    else:
        sd = simsiam_flax_to_torch_state_dict(params, stats)
    epoch = int(np.asarray(loaded.get("epoch", 0)))
    payload = {
        "epoch": epoch,
        "state_dict": {
            k: torch.from_numpy(np.array(v, copy=True))
            for k, v in sd.items()
        },
    }
    bh = os.path.join(a.load_model, "best_head.json")
    if os.path.exists(bh):
        # reference save_model_scan persists the winning cluster head
        # (model.py:264-281); its loader extracts cluster_head.{this}
        with open(bh) as f:
            payload["best_loss_head"] = int(json.load(f)["best_loss_head"])
    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    torch.save(payload, a.out)
    print(f"{a.out}: {len(sd)} tensors (epoch {epoch})")
    return 0


def cmd_extract_spectrum(argv):
    """Radially averaged amplitude spectrum of a tomogram
    (utils/extract_spectrum.py)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu extract-spectrum")
    parser.add_argument("-i", "--input", required=True, help=".mrc/.rec tomogram")
    parser.add_argument("-o", "--output", required=True, help="output .tsv")
    a = parser.parse_args(argv)
    from cet_pick_tpu.io.mrc import read_mrc
    from cet_pick_tpu.utils.reconstruct import extract_spectrum, save_spectrum

    spec = extract_spectrum(read_mrc(a.input).astype("float32"))
    save_spectrum(a.output, spec)
    print(f"wrote {len(spec)}-bin spectrum to {a.output}")


def cmd_match_spectrum(argv):
    """Filter a tomogram to match a target amplitude spectrum
    (utils/match_spectrum.py)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu match-spectrum")
    parser.add_argument("-i", "--input", required=True)
    parser.add_argument("-t", "--target", required=True, help="spectrum .tsv")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("-c", "--cutoff", type=int, default=None)
    parser.add_argument("-s", "--smoothen", type=float, default=0.0)
    a = parser.parse_args(argv)
    from cet_pick_tpu.io.mrc import read_mrc, write_mrc
    from cet_pick_tpu.utils.reconstruct import load_spectrum, match_spectrum

    tomo, hdr = read_mrc(a.input, return_header=True)
    out = match_spectrum(tomo.astype("float32"), load_spectrum(a.target),
                         cutoff=a.cutoff, smooth=a.smoothen)
    # carry the input's voxel size forward, like the reference's
    # set_extended_header(tomo_h) (match_spectrum.py:66-69)
    write_mrc(a.output, out, voxel_size=hdr.voxel_size)
    print(f"wrote matched tomogram to {a.output}")


def cmd_backproject(argv):
    """Fourier-voxel backprojection of a particle stack with poses
    (utils/backproject_voxel.py)."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu backproject")
    parser.add_argument("--particles", required=True, help=".mrcs stack")
    parser.add_argument("--poses", required=True, help="pose .pkl")
    parser.add_argument("-o", required=True, help="output .mrc")
    parser.add_argument("--invert-data", action="store_true")
    parser.add_argument("--first", type=int, default=10000,
                        help="backproject the first N images")
    parser.add_argument("--tilt", default=None,
                        help="tilt-pair .mrcs image stack")
    parser.add_argument("--tilt-deg", type=float, default=45.0,
                        help="right-handed x-axis tilt offset (deg)")
    a = parser.parse_args(argv)
    import numpy as np

    from cet_pick_tpu.io.mrc import read_mrc, write_mrc
    from cet_pick_tpu.utils.reconstruct import backproject, load_poses

    stack = np.asarray(read_mrc(a.particles), np.float32)
    if stack.ndim == 2:
        stack = stack[None]
    tilt_stack = None
    if a.tilt is not None:
        tilt_stack = np.asarray(read_mrc(a.tilt), np.float32)
        if tilt_stack.ndim == 2:
            tilt_stack = tilt_stack[None]
    if a.invert_data:
        stack = -stack
        if tilt_stack is not None:
            tilt_stack = -tilt_stack
    n = min(a.first, len(stack))
    # fraction-of-box translations scale by the symmetrized lattice size
    # D = box+1, the reference's dataset.D (backproject_voxel.py:89)
    rots, trans = load_poses(a.poses, len(stack), stack.shape[-1] + 1)
    vol = backproject(stack[:n], rots[:n],
                      trans=None if trans is None else trans[:n],
                      tilt_images=None if tilt_stack is None else tilt_stack[:n],
                      tilt_deg=a.tilt_deg)
    write_mrc(a.o, vol)
    print(f"backprojected {n} images -> {a.o}")


def cmd_doctor(argv):
    """Runtime health check for production deployments: device enumeration,
    compile/dispatch smoke, and — on TPU backends — the tunnel probe bench.py
    gates on (matmul dispatch + host->device link vs the measured healthy
    reference points). Prints ONE JSON line; exit code 1 when unhealthy, so
    schedulers can gate a `watch` service or a training job on it."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu doctor")
    parser.add_argument("--no-probe", action="store_true",
                        help="skip the TPU tunnel probe (device enumeration "
                             "and compile smoke only)")
    parser.add_argument("--empiar", default=None, metavar="DIR",
                        help="run the full EMPIAR tutorial validation "
                             "(train -> test -> pr-curve) against a dataset "
                             "directory in the tutorial layout "
                             "(docs/empiar_validation.md)")
    parser.add_argument("--recipe", default="globular",
                        choices=("globular", "tubular"),
                        help="EMPIAR tutorial recipe (with --empiar)")
    parser.add_argument("--num_epochs", type=int, default=None,
                        help="override the recipe's training epochs "
                             "(with --empiar)")
    parser.add_argument("--f1_target", type=float, default=None,
                        help="gate: exit 1 if best F1 falls below this "
                             "(with --empiar)")
    a = parser.parse_args(argv)
    if a.empiar:
        from cet_pick_tpu.utils.empiar import run_empiar_validation

        report = run_empiar_validation(
            a.empiar, recipe=a.recipe, num_epochs=a.num_epochs,
            f1_target=a.f1_target,
        )
        print(json.dumps(report))
        return 0 if report.get("pass", True) else 1
    from cet_pick_tpu.utils.health import diagnostics

    report = diagnostics(probe=not a.no_probe)
    print(json.dumps(report))
    return 0 if report["healthy"] else 1


def cmd_flags(argv):
    """Print (or write) the full flag reference, generated from Config +
    cli/common.FLAG_GROUPS — the source behind docs/flags.md."""
    parser = argparse.ArgumentParser(prog="cet_pick_tpu flags")
    parser.add_argument("--out", default=None,
                        help="write the markdown here instead of stdout")
    a = parser.parse_args(argv)
    from cet_pick_tpu.cli.common import flags_markdown

    md = flags_markdown()
    if a.out:
        with open(a.out, "w") as f:
            f.write(md)
        print(f"wrote {a.out}")
    else:
        print(md)


COMMANDS = {
    "train": cmd_train,
    "test": cmd_test,
    "classify-test": cmd_classify_test,
    "watch": cmd_watch,
    "explore": cmd_explore,
    "moco": cmd_moco,
    "classify": cmd_classify,
    "fewshot": cmd_fewshot,
    "denoise": cmd_denoise,
    "embed": cmd_embed,
    "scan": cmd_scan,
    "scan-finetune": cmd_scan_finetune,
    "plot2d": cmd_plot2d,
    "phoenix": cmd_phoenix,
    "to-coords": cmd_to_coords,
    "sublabels": cmd_sublabels,
    "visualize3d": cmd_visualize3d,
    "merge": cmd_merge,
    "pr-curve": cmd_pr_curve,
    "remove-golds": cmd_remove_golds,
    "gen-files": cmd_gen_files,
    "extract-spectrum": cmd_extract_spectrum,
    "match-spectrum": cmd_match_spectrum,
    "backproject": cmd_backproject,
    "export-torch": cmd_export_torch,
    "import-torch": cmd_import_torch,
    "flags": cmd_flags,
    "doctor": cmd_doctor,
}


def _setup_jax_cache():
    """Persistent XLA compilation cache for every CLI command.

    The flagship tutorial pays ~4 min of one-time XLA compilation per fresh
    process (PARITY.md); with the cache, warm reruns of the same shapes load
    compiled programs from disk in seconds. Opt-out / redirect with
    CET_PICK_TPU_CACHE= (empty disables); an explicit
    JAX_COMPILATION_CACHE_DIR from the user always wins.
    """
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return
    cache = os.environ.get(
        "CET_PICK_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "cet_pick_tpu", "xla"),
    )
    if not cache:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob — cache is an optimization only


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; available: {', '.join(COMMANDS)}")
        return 2
    _setup_jax_cache()
    rc = COMMANDS[cmd](argv[1:])
    return 0 if rc is None else rc


if __name__ == "__main__":
    sys.exit(main())
