"""cet_pick_tpu — TPU-native cryo-ET particle picking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of nextpyp/cet_pick
(MiLoPYP): a two-stage pipeline of (1) self-supervised *exploration* over
candidate patches mined from tomograms/tilt-series and (2) semi-supervised
*refinement* that localizes particles via a slice-wise 2D-UNet + dilated 3D
head heatmap detector with positive-unlabeled + contrastive + consistency
objectives, decoded with fused 3D NMS + top-K.

Layout:
    io/         host-side MRC + coordinate-table I/O (reference: cet_pick/utils/loader.py)
    ops/        jitted compute ops: heatmap targets, NMS, decode, DoG (utils/image.py, models/decode.py)
    models/     flax modules: UNet detector, SimSiam/MoCo encoders (models/networks/*)
    data/       host-side sampling pipelines (datasets/*)
    train/      train loops + losses + schedules + checkpointing (trains/*, models/loss.py)
    infer/      tiled full-volume inference + embedding extraction (detectors/*, *_test_hm_*.py)
    parallel/   jax.sharding mesh utilities (replaces models/data_parallel.py + DDP)
    post/       fiber/spike curve-fit post-processing (utils/post_process.py)
    evaluation/ Hungarian matching + PR curves (evaluation/*)
    cluster/    on-device k-means + 2D visualization pipeline (plot_2d.py, models/kmeans.py)
    cli/        command-line entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
