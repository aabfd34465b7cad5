"""Configuration tree for GIMS-TPU.

Mirrors the reference YAML schema (reference: configs/coco_config.yaml) but
lifts the AGC knobs (radius / percentile / min_size / delaunay), which the
reference smuggles through the input data dict (reference:
models/gmatcher.py:220-223), into first-class config.

All configs are plain dataclasses so they hash cleanly as jit static args.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class AGCConfig:
    """Adaptive graph construction knobs.

    Reference defaults: models/gmatcher.py:220-222 (radius=25, percentile=7,
    min_size=8); the published eval harness overrides to r=15, p=2, m=7
    (reference: eval_homography.py:122-124).
    """

    radius: float = 25.0
    percentile: float = 7.0
    min_size: int = 8
    delaunay: bool = False
    # Fixed-iteration budget for connected-component label propagation.
    # ceil(log2(N)) + slack; verified against scipy in tests.
    cc_rounds: int = 20
    # Percentile-threshold implementation. "exact" (parity default) finds
    # the exact k-th order statistic of ALL valid upper-triangle cosine
    # similarities (reference: models/agc.py:367-380 uses np.partition —
    # also exact). "approx" runs the same multisection on every
    # `threshold_stride`-th ROW of the similarity matrix: 1/stride the
    # HBM traffic for a percentile estimated from N^2/(2*stride) pairs —
    # at N=12288/stride=4 that is ~19M samples, giving a relative rank
    # error of ~1e-4 (the threshold moves by less than adjacent-similarity
    # spacing in practice; see tests/test_agc.py approx-vs-exact bound).
    threshold_impl: str = "exact"
    threshold_stride: int = 4
    # Connected-components implementation. "dense" (parity default) runs
    # min-label propagation over the full (N, N) adjacency each round.
    # "sparse" extracts a fixed-degree neighbor list (one top_k pass) and
    # propagates over it — O(N * cc_degree) per round instead of O(N^2).
    # Exact whenever every node's true degree <= cc_degree (measured max
    # degree is ~23 at the eval knobs, scripts/bench_agc_stages.py); the
    # bidirectional push/pull covers edges one overflowing endpoint drops.
    cc_impl: str = "dense"
    cc_degree: int = 32
    # Component-reconnection implementation. "exact" links the closest
    # node pair between each component and its nearest-centroid neighbor
    # (reference parity, agc.py:518-565); "centroid" picks the endpoints
    # through centroids — same component-pair topology, no (C, N)
    # segment_min over the d2 matrix. reconnect_buckets bounds the dense
    # component-id tables (overflow components share the last bucket).
    reconnect_impl: str = "exact"
    reconnect_buckets: int = 4096
    # Graph-build implementation. "dense" materializes (N, N) d2/sim f32
    # matrices (parity default); "band" sorts keypoints by x and builds
    # (N, band_halfwidth) bands instead — exact whenever every radius-pair
    # is within band_halfwidth sorted positions (always true when
    # band_halfwidth >= N-1); ~6x less HBM traffic at the eval shape.
    # Band mode always uses the strided approx threshold (computed in the
    # caller's row order, bit-identical to dense-approx; stride 1 = exact).
    # DENSITY BOUND: band mode silently drops a radius pair when more than
    # band_halfwidth keypoints separate it in sorted-x order — i.e. when a
    # 2*radius-wide vertical slab holds > band_halfwidth keypoints. At the
    # eval operating point (6144 kpts over 800 px, radius 15) a slab
    # averages ~230 keypoints, so 512 holds ~2.2x margin; for larger
    # budgets or extreme vertical structure scale band_halfwidth with
    # total_keypoints * (2 * radius / image_width), or audit a sample with
    # agc.graph.band_coverage (tests/test_agc.py::test_band_coverage_*).
    agc_impl: str = "dense"
    band_halfwidth: int = 512


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """GMatcher hyper-parameters (reference: models/gmatcher.py:166-176)."""

    descriptor_dim: int = 256
    keypoint_encoder: Tuple[int, ...] = (32, 64, 128, 256)
    num_gnn_layers: int = 18  # ['self','cross'] * 9
    sinkhorn_iterations: int = 100
    match_threshold: float = 0.2
    use_layernorm: bool = False
    input_dim: int = 256
    num_heads: int = 4
    sage_layers: int = 3
    # Loss weights (reference: configs/coco_config.yaml:25-26)
    pos_loss_weight: float = 0.45
    neg_loss_weight: float = 1.0
    # Negative GT cell routing. "corner" is reference parity: every
    # negative/pruned GT row collapses to the dustbin-dustbin corner cell
    # Z[M, N] (reference: models/gmatcher.py:356-374 via torch -1
    # indexing), whose clamped value saturates at 0 — negatives carry NO
    # gradient. "dustbin" is the corrected mode: (i, -1) rows supervise
    # the real dustbin column Z[i, N] and (-1, j) rows Z[M, j], so
    # unmatched keypoints actually learn to go to the bin.
    neg_cells: str = "corner"
    # TPU-specific: compute attention in bfloat16 (accumulate f32).
    attention_dtype: str = "float32"
    # Attention implementation: "auto" picks the fused Pallas kernel on
    # TPU above the flash threshold (matcher/pallas_attention.py), the
    # direct path for small buckets, and the lax.scan flash path
    # elsewhere; "direct"/"flash"/"pallas" force one.
    attention_impl: str = "auto"
    # Use the Pallas streaming Sinkhorn kernel (gims_tpu/matcher/
    # pallas_sinkhorn.py) instead of the XLA loop. TPU only.
    use_pallas_sinkhorn: bool = False
    # Parameter init: "default" = reference-equivalent random init;
    # "identity" = zero-residual warm start (trunk starts as the identity,
    # scores start as descriptor similarity — see api.init_gmatcher_variables).
    init_scheme: str = "default"
    # Rematerialize each GNN layer and Sinkhorn iteration in the backward
    # pass (jax.checkpoint). Needed to train at eval-scale keypoint counts
    # (N >= 4096): without it the 18-layer trunk stores ~N^2*4B of softmax
    # residuals per attention call. No effect on inference.
    remat: bool = False
    # Keypoint-normalization convention. "gims" replicates the reference's
    # shape-unpacking of NHWC images in normalize_keypoints (reference:
    # models/gmatcher.py:26-33 receives (B,H,W,3) so "height"=W and
    # "width"=3); "standard" centers/scales by the true (H, W).
    normalization: str = "standard"
    # Inference-only: run both sides of the pair through the trunk as one
    # stacked batch of 2B (input_proj, SAGE, kenc, every GNN layer,
    # final_proj each dispatch once instead of twice). Bit-exact at eval —
    # BatchNorm reads running stats — and automatically disabled in train
    # mode (pooled batch stats would diverge from the reference's
    # per-side sequential updates) or when the two buckets differ.
    stack_sides: bool = True


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """SIFT + patch extraction (reference: utils/common.py:838-848)."""

    n_octave_layers: int = 3
    contrast_threshold: float = 0.001
    edge_threshold: float = 80.0
    sigma: float = 1.6
    max_keypoints: int = -1
    patch_size: int = 32       # final CNN input resolution
    warp_size: int = 64        # warped patch before 2x area downsample
    interpolation: str = "cubic"  # 'cubic' matches cv2.INTER_CUBIC; 'linear' is faster
    # "carhynet" = reference frontend (patch warp + CNN). "sift" = host
    # OpenCV SIFT descriptors — the in-env substitute for the reference's
    # pretrained car_hynet.pth (absent here), and a faster host-only path.
    # "dense" = convolutional CAR-HyNet over pyramid levels + bilinear
    # descriptor sampling (frontend/dense.py) — no per-keypoint patch warp.
    # "devsift" (fused path) = SIFT descriptors computed ON the TPU from
    # the detection gray pyramid (frontend/sift_descriptor.py) — the
    # speed path for SIFT-descriptor-trained weights.
    descriptor_source: str = "carhynet"
    # Sample-grid side S for the device SIFT descriptor: S^2 rotated-frame
    # samples per keypoint (S/5 per histogram bin axis). 16 matches cv2
    # descriptors to ~0.998 mean cosine; 12 trades ~0.002 for 1.8x fewer
    # gather rows (tests/test_sift_descriptor.py).
    sift_samples: int = 16
    # Descriptor engine for the staged detector="device" +
    # descriptor_source="sift" config: "host" = cv2.SIFT.compute at the
    # device-detected keypoints (~0.8 s/image on this host's single
    # core); "device" = frontend/sift_descriptor.py on the TPU.
    sift_descriptor: str = "host"
    # Compute dtype for the dense convolutional descriptor path. The dense
    # CAR-HyNet pass is the dominant extraction cost (~200 ms/side in f32
    # at 800x600); bf16 runs the convs at MXU rate with f32-accumulated
    # normalizations (carhynet/model.py) and matches f32 descriptors to
    # cos-sim > 0.999. Set "float32" to disable.
    dense_dtype: str = "bfloat16"
    # "host" = OpenCV SIFT detection on the CPU (reference parity,
    # reference: utils/common.py:851-862). "device" = dense DoG-extrema
    # detection on the TPU (frontend/detect_device.py) — the speed path
    # when host cores are the bottleneck.
    detector: str = "host"
    # Per-octave keypoint selection in the fused path. "exact" =
    # lax.top_k (sorts the full candidate plane — octave 0 at 800x600 is
    # ~5.8M scores). "approx" = lax.approx_max_k(recall_target=0.95),
    # the TPU-native partial reduction: same budget of keypoints, ~95%
    # of them identical, the rest swapped for near-threshold candidates
    # (low-response detections are interchangeable noise for matching).
    topk_impl: str = "exact"
    # Detection pyramid base. True = OpenCV SIFT's firstOctave=-1 (2x
    # bilinear upsample — reference: utils/library.py:245-247): octave 0
    # is 4x the input area and costs ~3/4 of the whole pyramid + DoG +
    # candidate pass for sub-pixel-scale keypoints the matcher mostly
    # prunes anyway. False = firstOctave=0: the pyramid starts at input
    # resolution (initial blur sqrt(sigma^2 - 0.5^2), OpenCV's no-upsample
    # convention) — the fused speed path.
    upsample: bool = True
    # Pyramid layers (1..N_OCTAVE_LAYERS) that get a dense descriptor map
    # per octave in the dense/dense_gray path. Keypoints at other layers
    # sample the nearest available layer's map. (1, 2, 3) matches every
    # detection layer exactly; (2,) runs the descriptor CNN once per
    # octave (~3x less conv work) and absorbs the <=26% within-octave
    # scale mismatch in training.
    dense_layers: Tuple[int, ...] = (1, 2, 3)
    # First octave that gets dense descriptor maps in the no-upsample
    # (firstOctave=0) dense_gray path. 0 = every octave (octave 0 runs
    # the descriptor CNN at full input resolution — ~3/4 of the dense
    # conv FLOPs and the largest HBM temp in the fused program). 1 =
    # octave-0 keypoints sample octave 1's maps at halved coordinates —
    # the same map-sharing the 2x-upsampled geometry always applies to
    # its base octave. Requires weights trained at this geometry.
    # Ignored when upsample=True (base octave is always map-shared).
    dense_first_map_oct: int = 0


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """COCO self-supervised homography dataset
    (reference: configs/coco_config.yaml:37-53)."""

    dataset_path: str = "./datasets/coco"
    apply_color_aug: bool = True
    image_height: int = 480
    image_width: int = 640
    resize_aspect: bool = False
    # augmentation_params
    patch_ratio: float = 0.85
    perspective_x: float = 0.0
    perspective_y: float = 0.0
    shear_ratio: float = 0.04
    shear_angle: float = 10.0
    rotation_angle: float = 25.0
    scale: float = 0.6
    translation: float = 0.6


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Reference: configs/coco_config.yaml:29-35."""

    opt_type: str = "adam"
    lr: float = 1e-4
    weight_decay: float = 5e-4
    warmup_epochs: int = 1
    step_epoch: int = 25
    step_value: float = 0.9440608762859234


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference: configs/coco_config.yaml:1-26."""

    output_dir: str = "output/train"
    experiment_name: str = "default"
    start_epoch: int = 0
    batch_size: int = 1
    num_epochs: int = 2
    num_workers: int = 0
    log_interval: int = 50
    val_images_count: int = 10
    use_ema: bool = False
    ema_decay: float = 0.9999
    init_seed: int = 10
    max_keypoints: int = 2048
    lastiter_every: int = 2000
    minloss_every: int = 200
    # fused-e2e staging: keep the (warm-started) matcher frozen for this
    # many epochs while the descriptor CNN learns against it — joint
    # updates from a fresh CNN at full LR destabilize both nets.
    freeze_gmatcher_epochs: int = 0
    # fused-e2e auxiliary InfoNCE descriptor loss weight (0 = off): GT
    # correspondences supervise the dense CNN directly (metric learning,
    # the reference's standalone triplet stage folded into joint
    # training); see train/fused_step.descriptor_info_nce.
    desc_loss_weight: float = 0.0


@dataclasses.dataclass(frozen=True)
class GIMSConfig:
    """Top-level config."""

    agc: AGCConfig = dataclasses.field(default_factory=AGCConfig)
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)
    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)
    dataset: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def _update(dc, **kwargs):
    known = {f.name for f in dataclasses.fields(dc)}
    return dataclasses.replace(dc, **{k: v for k, v in kwargs.items() if k in known})


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> GIMSConfig:
    """Load a GIMSConfig from a YAML file in the reference's schema.

    Accepts the reference's section names (train_params / optimizer_params /
    dataset_params) so existing config files keep working.
    """
    cfg = GIMSConfig()
    raw = {}
    if path is not None:
        import yaml

        with open(path, "r", encoding="utf-8") as f:
            raw = yaml.safe_load(f) or {}
    if overrides:
        raw = {**raw, **overrides}

    tp = raw.get("train_params", {})
    op = raw.get("optimizer_params", {})
    dp = raw.get("dataset_params", {})
    ap = dp.get("augmentation_params", {})
    fp = raw.get("frontend_params", {})

    matcher = _update(
        cfg.matcher,
        sinkhorn_iterations=tp.get("sinkhorn_iterations", cfg.matcher.sinkhorn_iterations),
        match_threshold=tp.get("match_threshold", cfg.matcher.match_threshold),
        use_layernorm=tp.get("use_layernorm", cfg.matcher.use_layernorm),
        num_gnn_layers=2 * tp.get("tf_layers", cfg.matcher.num_gnn_layers // 2),
        pos_loss_weight=tp.get("pos_loss_weight", cfg.matcher.pos_loss_weight),
        neg_loss_weight=tp.get("neg_loss_weight", cfg.matcher.neg_loss_weight),
        neg_cells=tp.get("neg_cells", cfg.matcher.neg_cells),
        init_scheme=tp.get("init_scheme", cfg.matcher.init_scheme),
        remat=tp.get("remat", cfg.matcher.remat),
        # training at N > FLASH_THRESHOLD must force "direct"/"flash":
        # the Pallas kernel (the TPU "auto" pick) has no backward pass
        attention_impl=tp.get("attention_impl", cfg.matcher.attention_impl),
        attention_dtype=tp.get("attention_dtype", cfg.matcher.attention_dtype),
    )
    train = _update(
        cfg.train,
        output_dir=tp.get("output_dir", cfg.train.output_dir),
        experiment_name=tp.get("experiment_name", cfg.train.experiment_name),
        start_epoch=tp.get("start_epoch", cfg.train.start_epoch),
        batch_size=tp.get("batch_size", cfg.train.batch_size),
        num_epochs=tp.get("num_epochs", cfg.train.num_epochs),
        num_workers=tp.get("num_workers", cfg.train.num_workers),
        log_interval=tp.get("log_interval", cfg.train.log_interval),
        val_images_count=tp.get("val_images_count", cfg.train.val_images_count),
        use_ema=tp.get("use_ema", cfg.train.use_ema),
        init_seed=tp.get("init_seed", cfg.train.init_seed),
        max_keypoints=tp.get("max_keypoints", cfg.train.max_keypoints),
        lastiter_every=tp.get("lastiter_every", cfg.train.lastiter_every),
        minloss_every=tp.get("minloss_every", cfg.train.minloss_every),
        freeze_gmatcher_epochs=tp.get("freeze_gmatcher_epochs",
                                      cfg.train.freeze_gmatcher_epochs),
        desc_loss_weight=tp.get("desc_loss_weight",
                                cfg.train.desc_loss_weight),
    )
    frontend = _update(
        cfg.frontend,
        descriptor_source=fp.get("descriptor_source",
                                 cfg.frontend.descriptor_source),
        detector=fp.get("detector", cfg.frontend.detector),
        dense_dtype=fp.get("dense_dtype", cfg.frontend.dense_dtype),
        interpolation=fp.get("interpolation", cfg.frontend.interpolation),
        warp_size=fp.get("warp_size", cfg.frontend.warp_size),
        max_keypoints=fp.get("max_keypoints", cfg.frontend.max_keypoints),
        upsample=fp.get("upsample", cfg.frontend.upsample),
        dense_layers=tuple(fp.get("dense_layers",
                                  cfg.frontend.dense_layers)),
        dense_first_map_oct=fp.get("dense_first_map_oct",
                                   cfg.frontend.dense_first_map_oct),
    )
    optimizer = _update(
        cfg.optimizer,
        opt_type=op.get("opt_type", cfg.optimizer.opt_type),
        lr=op.get("lr", cfg.optimizer.lr),
        weight_decay=op.get("weight_decay", cfg.optimizer.weight_decay),
        warmup_epochs=op.get("warmup_epochs", cfg.optimizer.warmup_epochs),
        step_epoch=op.get("step_epoch", cfg.optimizer.step_epoch),
        step_value=op.get("step_value", cfg.optimizer.step_value),
    )
    dataset = _update(
        cfg.dataset,
        dataset_path=dp.get("dataset_path", cfg.dataset.dataset_path),
        apply_color_aug=dp.get("apply_color_aug", cfg.dataset.apply_color_aug),
        image_height=dp.get("image_height", cfg.dataset.image_height),
        image_width=dp.get("image_width", cfg.dataset.image_width),
        resize_aspect=dp.get("resize_aspect", cfg.dataset.resize_aspect),
        patch_ratio=ap.get("patch_ratio", cfg.dataset.patch_ratio),
        perspective_x=ap.get("perspective_x", cfg.dataset.perspective_x),
        perspective_y=ap.get("perspective_y", cfg.dataset.perspective_y),
        shear_ratio=ap.get("shear_ratio", cfg.dataset.shear_ratio),
        shear_angle=ap.get("shear_angle", cfg.dataset.shear_angle),
        rotation_angle=ap.get("rotation_angle", cfg.dataset.rotation_angle),
        scale=ap.get("scale", cfg.dataset.scale),
        translation=ap.get("translation", cfg.dataset.translation),
    )
    agc = _update(
        cfg.agc,
        radius=raw.get("agc", {}).get("radius", cfg.agc.radius),
        percentile=raw.get("agc", {}).get("percentile", cfg.agc.percentile),
        min_size=raw.get("agc", {}).get("min_size", cfg.agc.min_size),
        delaunay=raw.get("agc", {}).get("delaunay", cfg.agc.delaunay),
        # graph-build impl knobs: training with the SERVING graph build
        # (band + centroid reconnect, the FusedMatching TPU default) makes
        # the learned weights match the deployed program exactly
        agc_impl=raw.get("agc", {}).get("agc_impl", cfg.agc.agc_impl),
        band_halfwidth=raw.get("agc", {}).get(
            "band_halfwidth", cfg.agc.band_halfwidth),
        threshold_impl=raw.get("agc", {}).get(
            "threshold_impl", cfg.agc.threshold_impl),
        reconnect_impl=raw.get("agc", {}).get(
            "reconnect_impl", cfg.agc.reconnect_impl),
        reconnect_buckets=raw.get("agc", {}).get(
            "reconnect_buckets", cfg.agc.reconnect_buckets),
    )
    return GIMSConfig(
        agc=agc, matcher=matcher, frontend=frontend, dataset=dataset,
        optimizer=optimizer, train=train,
    )
