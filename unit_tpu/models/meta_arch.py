"""Meta-architectures: the weakly-supervised R-CNN family, TPU-native.

Rebuild of /root/reference/modeling/meta_arch/rcnn.py: ``WeaklySupervisedRCNNNoMeta``
(the default for all shipped configs, rcnn.py:431-542), the fine-tune variant
behavior (WSROIHeadFineTune computes similarity during training, roi_heads.py:618),
``train_only_weak`` routing (rcnn.py:433-491) and the weak-only ``WeakRCNN``.

Design (SURVEY.md §7.1): one flax module owning all parametric pieces; the training
step is a single pure function over (variables, batch, rng) with every per-image
dynamic structure replaced by padded tensors + masks.  The two image streams
(strong query + weak classifier) are both batched; per-step losses are fused into
one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..structures.instances import Detections, GTInstances, SampledProposals
from ..ops import roi_align as roi_align_ops
from ..ops import sampling as sampling_ops
from . import fast_rcnn as frcnn
from . import rpn as rpn_lib
from . import similarity as sim_lib
from . import weak_losses as weak_lib
from .predictors import (
    SupervisedPredictor,
    WeakDetectorPredictor,
    combine_cls_logits,
    transfer_deltas,
    transfer_scores,
)
from .resnet import Res5, ResNetC4


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static (hashable) model configuration distilled from the CfgNode."""

    meta_architecture: str = "WeaklySupervisedRCNNNoMeta"
    backbone_name: str = "build_resnet_backbone"
    backbone_dilated: bool = False
    box_head_name: str = "Res5BoxHead"
    rpn_conv_dim: int = 1024
    depth: int = 50
    num_classes: int = 20
    base_ids: Tuple[int, ...] = ()
    novel_ids: Tuple[int, ...] = ()
    multi_box_head: bool = False
    pooler_resolution: int = 14
    pooler_scale: float = 1.0 / 16.0
    pooler_type: str = "ROIAlignV2"   # ROIAlignV2 | ROIAlign | ROIPool
    sampling_ratio: int = 2
    res2_out_channels: int = 256      # MODEL.RESNETS.RES2_OUT_CHANNELS; Res5 emits 8x this
    rpn_self_training: bool = False   # WeaklySupervisedRCNNRPN (rcnn.py:544-705)
    weak_rpn_score_threshold: float = 0.99
    roi_batch_size: int = 512
    roi_positive_fraction: float = 0.25
    roi_iou_thresholds: Tuple[float, ...] = (0.5,)
    roi_iou_labels: Tuple[int, ...] = (0, 1)
    proposal_append_gt: bool = True
    weak_proposal_count: int = 512
    detector_temp: float = 1.0
    classifier_temp: float = 1.0
    regression_branch: bool = False
    oicr_regression_branch: bool = False
    oicr_iter: int = 3
    weak_detector_type: str = "OICR"  # OICR | PCL (WEAK_DETECTOR.TYPE)
    num_kmeans_cluster: int = 3
    graph_iou_threshold: float = 0.4
    max_pc_num: int = 5
    finetune: bool = False            # *_ft residual heads + train-time transfer
    weak_finetune_detach: bool = False  # SupervisedDetectorOutputsWeakFineTune
    weak_detector_finetune: bool = False  # WeakDetectorOutputsFT streams
    pixel_mean: Tuple[float, ...] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    normalize_images: bool = False
    compute_dtype: str = "float32"
    roi_align_impl: str = "auto"   # pallas on TPU, xla elsewhere
    remat_backbone: bool = False
    mask_on: bool = False
    mask_head_finetune: bool = False
    mask_num_conv: int = 0
    mask_fg_slots: int = 128   # static fg capacity for the mask loss (= S * pos_frac)
    load_proposals: bool = False       # precomputed (MCG) proposals, no RPN
    use_meta: bool = False             # WSROIHead (meta/support stream) vs NoMeta
    attention_mode: str = "mean"       # VISUAL_ATTENTION_HEAD.NAME -> mean|mahalanobis
    rank_loss_slots: int = 100         # proposals subsampled for the rank loss
    rpn: rpn_lib.RPNConfig = rpn_lib.RPNConfig()
    frcnn: frcnn.FastRCNNConfig = frcnn.FastRCNNConfig(num_classes=20)
    weak: weak_lib.WeakLossConfig = weak_lib.WeakLossConfig(num_classes=20)
    sim: sim_lib.SimilarityConfig = sim_lib.SimilarityConfig(
        terms=(("cls", ("lingual",)), ("bbox", ("lingual",))),
        base_ids=(), novel_ids=(), coco_indexer=(),
    )

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @classmethod
    def from_cfg(cls, cfg, class_names=None) -> "ModelConfig":
        from ..config.validate import validate_registry_names

        validate_registry_names(cfg)  # unknown registry names fail loudly here
        num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        if class_names is None:
            class_names = (
                sim_lib.VOC_CLASSES if num_classes == 20 else sim_lib.COCO_CLASSES[:num_classes]
            )
        wd = cfg.MODEL.ROI_HEADS.FAST_RCNN.WEAK_DETECTOR
        fast_name = cfg.MODEL.ROI_HEADS.FAST_RCNN.NAME
        weak_name = wd.NAME
        return cls(
            meta_architecture=cfg.MODEL.META_ARCHITECTURE,
            backbone_name=cfg.MODEL.BACKBONE.NAME,
            backbone_dilated=cfg.MODEL.BACKBONE.DILATED,
            box_head_name=cfg.MODEL.ROI_BOX_HEAD.NAME,
            rpn_conv_dim={
                "build_resnet_backbone": 1024,
                "build_vgg_backbone": 512,
                "VGG": 512,
                "build_vgg_cnn_f_backbone": 256,
                "VGG_CNN_F": 256,
                "build_inception_resnet_v2_backbone": 1088,
                "InceptionResNetV2": 1088,
            }.get(cfg.MODEL.BACKBONE.NAME, 1024),
            depth=cfg.MODEL.RESNETS.DEPTH,
            res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
            num_classes=num_classes,
            base_ids=tuple(cfg.DATASETS.FEWSHOT.BASE_CLASSES_ID),
            novel_ids=tuple(cfg.DATASETS.FEWSHOT.NOVEL_CLASSES_ID),
            multi_box_head=cfg.MODEL.ROI_HEADS.MULTI_BOX_HEAD,
            pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
            sampling_ratio=cfg.TPU.ROI_ALIGN_SAMPLING_RATIO,
            rpn_self_training=cfg.MODEL.META_ARCHITECTURE == "WeaklySupervisedRCNNRPN",
            weak_rpn_score_threshold=cfg.MODEL.PROPOSAL_GENERATOR.WEAK_RPN_SCORE_TRESHOLD,
            roi_batch_size=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            roi_iou_thresholds=tuple(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS),
            roi_iou_labels=tuple(cfg.MODEL.ROI_HEADS.IOU_LABELS),
            proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
            weak_proposal_count=(
                cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
                // cfg.MODEL.ROI_HEADS.WEAK_CLASSIFIER_PROPOSAL_DIVISOR
            ),
            detector_temp=wd.DETECTOR_TEMP,
            classifier_temp=wd.CLASSIFIER_TEMP,
            regression_branch=wd.REGRESSION_BRANCH,
            oicr_regression_branch=wd.OICR_REGRESSION_BRANCH,
            oicr_iter=wd.OICR_ITER,
            weak_detector_type=wd.TYPE,
            num_kmeans_cluster=wd.NUM_KMEANS_CLUSTER,
            graph_iou_threshold=wd.GRAPH_IOU_THRESHOLD,
            max_pc_num=wd.MAX_PC_NUM,
            finetune="FineTune" in fast_name and "Weak" not in fast_name,
            weak_finetune_detach=fast_name == "SupervisedDetectorOutputsWeakFineTune",
            weak_detector_finetune=weak_name == "WeakDetectorOutputsFT",
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            normalize_images=cfg.INPUT.NORMALIZE_IMAGES,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            roi_align_impl=cfg.TPU.ROI_ALIGN_IMPL,
            remat_backbone=cfg.TPU.REMAT_BACKBONE,
            mask_on=cfg.MODEL.MASK_ON,
            load_proposals=cfg.MODEL.LOAD_PROPOSALS,
            use_meta=cfg.MODEL.ROI_HEADS.NAME in ("WSROIHead", "WSROIHeadFineTuneMeta"),
            attention_mode={
                "MahalanobisSimilarity": "mahalanobis",
                "MeanSimilarity": "mean",
                "MeanMatrixSimilarity": "matrix",
                "MeanMatrixSimilarityLocatron": "locatron",
            }.get(cfg.MODEL.ROI_HEADS.VISUAL_ATTENTION_HEAD.NAME, "mean"),
            mask_head_finetune="FineTune" in cfg.MODEL.ROI_MASK_HEAD.NAME,
            mask_num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
            mask_fg_slots=int(
                cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
                * cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION
            ),
            rpn=rpn_lib.RPNConfig.from_cfg(cfg),
            frcnn=frcnn.FastRCNNConfig.from_cfg(cfg),
            weak=weak_lib.WeakLossConfig(
                num_classes=num_classes,
                oicr_iter=wd.OICR_ITER,
                fg_threshold=cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS[0],
                bg_threshold=wd.BG_THRESHOLD,
                mil_multiplier=wd.MIL_MULTIPLIER,
                weak_loss_multiplier=wd.WEAK_LOSS_MULTIPLIER,
                bbox_reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
                smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
                regression_branch=wd.REGRESSION_BRANCH,
                oicr_regression_branch=wd.OICR_REGRESSION_BRANCH,
            ),
            sim=sim_lib.SimilarityConfig.from_cfg(cfg, class_names),
        )


class WSRCNN(nn.Module):
    """All parametric components of the UniT detector family in one module."""

    mc: ModelConfig

    def setup(self):
        mc = self.mc
        if mc.backbone_name == "build_resnet_backbone":
            self.backbone = ResNetC4(
                depth=mc.depth, res2_out_channels=mc.res2_out_channels,
                dtype=mc.dtype, name="backbone",
            )
        else:
            from .backbones import BACKBONE_REGISTRY

            cls = BACKBONE_REGISTRY.get(mc.backbone_name)
            if mc.backbone_name == "build_vgg_backbone":
                self.backbone = cls(dilated=mc.backbone_dilated, dtype=mc.dtype,
                                    name="backbone")
            else:
                self.backbone = cls(dtype=mc.dtype, name="backbone")
        self.rpn_head = rpn_lib.RPNHead(
            num_anchors=mc.rpn.num_cell_anchors, conv_dim=mc.rpn_conv_dim,
            dtype=mc.dtype, name="rpn_head",
        )

        def make_box_head(name):
            # Res5BoxHeadNOTE (ref box_head.py:91-135) differs from Res5BoxHead
            # only in its torch in-channel bookkeeping; flax infers input
            # channels, so all three names resolve to the same module
            if mc.box_head_name in (
                "Res5BoxHead", "Res5BoxHeadWithMask", "Res5BoxHeadNOTE", ""
            ):
                return Res5(depth=mc.depth, res2_out_channels=mc.res2_out_channels,
                            dtype=mc.dtype, name=name)
            from .box_heads import BOX_HEAD_REGISTRY

            return BOX_HEAD_REGISTRY.get(mc.box_head_name)(dtype=mc.dtype, name=name)

        self.box_head = make_box_head("box_head")
        if mc.multi_box_head:
            self.weak_box_head = make_box_head("weak_box_head")
        self.supervised = SupervisedPredictor(
            num_classes=mc.num_classes,
            regression_branch=mc.regression_branch,
            finetune=mc.finetune,
            name="supervised",
        )
        self.weak_detector = WeakDetectorPredictor(
            num_classes=mc.num_classes,
            oicr_iter=mc.oicr_iter,
            detector_temp=mc.detector_temp,
            classifier_temp=mc.classifier_temp,
            regression_branch=mc.regression_branch,
            oicr_regression_branch=mc.oicr_regression_branch,
            finetune=mc.weak_detector_finetune,
            novel_ids=mc.novel_ids,
            name="weak_detector",
        )
        if mc.use_meta:
            from .visual_attention import VisualAttentionHead

            self.visual_attention = VisualAttentionHead(
                num_classes=mc.num_classes,
                depth=mc.depth,
                res2_out_channels=mc.res2_out_channels,
                mode=mc.attention_mode,
                pooler_resolution=mc.pooler_resolution,
                pooler_scale=mc.pooler_scale,
                sampling_ratio=mc.sampling_ratio,
                dtype=mc.dtype,
                name="visual_attention",
            )
        if mc.mask_on:
            from .mask_head import MaskRCNNConvUpsampleHead

            self.mask_head = MaskRCNNConvUpsampleHead(
                num_classes=mc.num_classes,
                num_conv=mc.mask_num_conv,
                dtype=mc.dtype,
                name="mask_head",
            )
        # Frozen GloVe table (fast_rcnn.py:327): filled by the weight loader.
        self.embeddings = self.param(
            "embeddings", nn.initializers.normal(0.02), (80, 300)
        )

    # ---------------------------------------------------------------- pieces
    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """(rcnn.py:257-266) optional /255, then caffe-style BGR mean/std."""
        x = images.astype(jnp.float32)
        if self.mc.normalize_images:
            x = x / 255.0
        mean = jnp.asarray(self.mc.pixel_mean)
        std = jnp.asarray(self.mc.pixel_std)
        return (x - mean) / std

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        bb = self.backbone
        x = self.preprocess(images)
        if self.mc.remat_backbone:
            return jax.checkpoint(lambda im: bb(im))(x)
        return bb(x)

    def rpn(self, feats: jnp.ndarray):
        return self.rpn_head(feats)

    def pooled_rois(self, feats: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """feats [B, h, w, C], boxes [B, S, 4] -> [B*S, P, P, C]."""
        mc = self.mc
        if mc.pooler_type == "ROIPool":
            out = jax.vmap(
                lambda f, b: roi_align_ops.roi_pool_max(
                    f, b, mc.pooler_resolution, mc.pooler_scale
                )
            )(feats, boxes)
        else:
            # keep the backbone's bf16: the pallas kernel loads rows in the
            # feature dtype (half the DMA traffic) and interpolates in f32.
            # Batch-native entry: one pipelined kernel over the whole batch
            # instead of a sequential per-image vmap while-loop.
            out = roi_align_ops.roi_align_batched(
                feats, boxes, mc.pooler_resolution, mc.pooler_scale,
                mc.sampling_ratio,
                aligned=mc.pooler_type == "ROIAlignV2",
                impl=mc.roi_align_impl if mc.pooler_type == "ROIAlignV2" else "xla",
            )
        return out.reshape((-1,) + out.shape[2:])

    def box_features(self, pooled: jnp.ndarray, head: str = "box") -> jnp.ndarray:
        module = self.box_head if head == "box" else self.weak_box_head
        return module(pooled).astype(jnp.float32)

    def oicr_weight_mean(self) -> jnp.ndarray:
        ws = [
            self.weak_detector.oicr_predictors[i].variables["params"]["kernel"].T
            for i in range(self.mc.oicr_iter)
        ]
        return jnp.mean(jnp.stack(ws), axis=0)

    # ---------------------------------------------------------------- training
    def compute_meta_attention(self, support):
        """Support stream -> per-class prototypes (process_meta_data,
        rcnn.py:284-307 + visual_attention_head forward).

        support: {image [C, K, h, w, 3], boxes [C, K, 4], class_valid [C]}
        """
        c, k = support["image"].shape[:2]
        imgs = support["image"].reshape((-1,) + support["image"].shape[2:])
        # the support-stream backbone pass is fully detached in the reference
        # (rcnn.py:315-316 wraps process_meta_data in torch.no_grad()); only the
        # meta box head downstream of the pooler trains from the rank losses
        feats = jax.lax.stop_gradient(self.features(imgs))
        feats = feats.reshape((c, k) + feats.shape[1:])
        return self.visual_attention.support_prototypes(
            feats, support["boxes"], support["class_valid"],
            np.asarray(self.mc.base_ids),
        )

    def backbone_features(
        self,
        strong: Optional[Dict[str, jnp.ndarray]] = None,
        weak: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """Stage-0 half of the pipeline-parallel step: exactly the backbone
        pass ``train_losses`` would run, exposed so a GPipe schedule can place
        it on its own 'stage' mesh devices and hand the feature map to
        ``train_losses(backbone_feats=...)`` over ICI.  With both streams
        present they must share one canvas (the fused pass, see train_losses)."""
        if strong is not None and weak is not None:
            if strong["image"].shape[1:] != weak["image"].shape[1:]:
                raise ValueError(
                    "backbone_features requires a shared strong/weak canvas, got "
                    f"{strong['image'].shape} vs {weak['image'].shape}"
                )
            return self.features(
                jnp.concatenate([strong["image"], weak["image"]], axis=0)
            )
        src = strong if strong is not None else weak
        return self.features(src["image"])

    def backbone_segment(
        self,
        strong: Optional[Dict[str, jnp.ndarray]] = None,
        weak: Optional[Dict[str, jnp.ndarray]] = None,
        feats: Optional[jnp.ndarray] = None,
        start_unit: int = 0,
        stop_unit: Optional[int] = None,
    ) -> jnp.ndarray:
        """Run backbone units ``[start_unit, stop_unit)`` (0 = stem, 1.. = the
        bottleneck blocks of res2..res4 in order; ``resnet.num_units``) — the
        per-stage compute of an N-stage pipeline schedule.  ``start_unit == 0``
        takes the (fused strong+weak) image batch and preprocesses it exactly
        like ``backbone_features``; later units take the previous stage's
        feature map via ``feats``.  ResNet-C4 backbones only (the unit
        boundaries are its bottleneck blocks)."""
        from .resnet import ResNetC4

        if not isinstance(self.backbone, ResNetC4):
            raise ValueError(
                "backbone_segment (N-stage pipeline parallelism) requires a "
                f"ResNet-C4 backbone, got {type(self.backbone).__name__}"
            )
        if start_unit == 0:
            if strong is not None and weak is not None:
                if strong["image"].shape[1:] != weak["image"].shape[1:]:
                    raise ValueError(
                        "backbone_segment requires a shared strong/weak canvas, "
                        f"got {strong['image'].shape} vs {weak['image'].shape}"
                    )
                x = jnp.concatenate([strong["image"], weak["image"]], axis=0)
            else:
                src = strong if strong is not None else weak
                x = src["image"]
            x = self.preprocess(x)
        else:
            assert feats is not None, "segments past the stem need `feats`"
            x = feats
        bb = self.backbone
        fn = lambda z: bb(z, start_unit=start_unit, stop_unit=stop_unit)  # noqa: E731
        if self.mc.remat_backbone:
            fn = jax.checkpoint(fn)
        return fn(x)

    def train_losses(
        self,
        rng: jax.Array,
        strong: Optional[Dict[str, jnp.ndarray]],
        weak: Optional[Dict[str, jnp.ndarray]],
        train_only_weak: bool = False,
        meta: Optional[Dict[str, jnp.ndarray]] = None,
        backbone_feats: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """One training step's loss dict.

        strong: {image [B,H,W,3], gt_boxes [B,G,4], gt_classes [B,G],
                 gt_valid [B,G], image_size [B,2]}
        weak:   {image [Bw,H',W',3], labels [Bw,C], image_size [Bw,2]}
        backbone_feats: optional precomputed ``backbone_features(strong, weak)``
                 output (the pipeline-parallel stage-0 handoff) — the backbone
                 pass is skipped and these features are consumed instead.
        """
        mc = self.mc
        losses: Dict[str, jnp.ndarray] = {}
        k_rpn, k_sample = jax.random.split(rng)

        # Both streams share one fixed canvas, so the two backbone+RPN passes
        # (rcnn.py:439,452) fuse into a single batched conv pass — better MXU
        # utilization and half the kernel dispatches.  Gradients are identical:
        # the reference also backprops the backbone through both streams.
        feats = feats_w = logits = deltas = logits_w = deltas_w = None
        fused = (
            strong is not None and weak is not None
            and strong["image"].shape[1:] == weak["image"].shape[1:]
        )
        if backbone_feats is not None and not fused and strong is not None and weak is not None:
            raise ValueError(
                "backbone_feats requires a shared strong/weak canvas "
                "(the fused backbone pass)"
            )
        if backbone_feats is not None and not fused:
            if strong is not None:
                feats = backbone_feats
            else:
                feats_w = backbone_feats
        if fused:
            bs = strong["image"].shape[0]
            all_feats = (
                backbone_feats if backbone_feats is not None
                else self.features(
                    jnp.concatenate([strong["image"], weak["image"]], axis=0)
                )
            )
            feats, feats_w = all_feats[:bs], all_feats[bs:]
            all_logits, all_deltas = self.rpn(all_feats)
            logits, logits_w = all_logits[:bs], all_logits[bs:]
            deltas, deltas_w = all_deltas[:bs], all_deltas[bs:]

        # PrecomputedProposals (dock suite): loaded proposals replace the RPN
        # entirely for the strong stream too — no RPN losses, as the
        # reference's PROPOSAL_GENERATOR: "PrecomputedProposals" contributes
        # none (COCO-VGG-CNN-F-split1-dock.yaml).
        strong_precomputed = (
            mc.load_proposals and strong is not None and "proposals" in strong
        )
        if strong is not None:
            gt = GTInstances(
                boxes=strong["gt_boxes"],
                classes=strong["gt_classes"],
                valid=strong["gt_valid"],
            )
        if strong is not None and not strong_precomputed:
            # The RPN always trains on the strong batch — including the
            # weak-only WeakRCNN phase (rcnn.py:96-134) and TRAIN_ONLY_WEAK.
            if feats is None:
                feats = self.features(strong["image"])
            if logits is None:
                logits, deltas = self.rpn(feats)
            fh, fw = feats.shape[1], feats.shape[2]
            anchors = rpn_lib.get_anchors(fh, fw, mc.rpn)
            losses.update(
                rpn_lib.rpn_losses(k_rpn, logits, deltas, anchors, gt, mc.rpn)
            )
        if strong is not None and not train_only_weak:
            if strong_precomputed:
                if feats is None:
                    feats = self.features(strong["image"])
                prop_boxes = strong["proposals"]
                prop_valid = strong["proposals_valid"]
            else:
                proposals = rpn_lib.select_proposals(
                    jax.lax.stop_gradient(logits),
                    jax.lax.stop_gradient(deltas),
                    anchors, strong["image_size"], mc.rpn, training=True,
                )
                prop_boxes = proposals.boxes
                prop_valid = proposals.valid
            b = strong["image"].shape[0]
            keys = jax.random.split(k_sample, b)
            sampled = jax.vmap(
                lambda k, pb, pv, g: sampling_ops.label_and_sample_proposals(
                    k, pb, pv, g, mc.roi_batch_size, mc.roi_positive_fraction,
                    mc.num_classes, mc.roi_iou_thresholds, mc.roi_iou_labels,
                    mc.proposal_append_gt,
                )
            )(keys, prop_boxes, prop_valid, gt)

            pooled = self.pooled_rois(feats, sampled.boxes)
            if mc.mask_on:
                # Res5BoxHeadWithMask keeps the 4-D map; predictors take its
                # spatial mean (roi_heads.py:743-746).
                feats4d = self.box_head(pooled, spatial_mean=False)
                box_feats = jnp.mean(feats4d, axis=(-3, -2)).astype(jnp.float32)
            else:
                feats4d = None
                box_feats = self.box_features(pooled, "box")
            sup = self.supervised(box_feats)

            # Frozen weak scores added to the deltas (fast_rcnn.py:388-392,425).
            if mc.multi_box_head:
                sup_weak_feats = jax.lax.stop_gradient(self.box_features(pooled, "weak"))
            else:
                sup_weak_feats = box_feats
            weak_scores, weak_box_deltas = self.weak_detector.evaluation(
                jax.lax.stop_gradient(sup_weak_feats)
            )
            weak_scores = jax.lax.stop_gradient(weak_scores)
            weak_box_deltas = jax.lax.stop_gradient(weak_box_deltas)

            delta_scores = sup["delta_scores"]
            proposal_deltas = sup["proposal_deltas"]
            if mc.finetune or mc.weak_finetune_detach:
                # Fine-tuning computes + applies the transfer during training
                # (roi_heads.py:618, fast_rcnn.py:484-533).
                sims = self.inference_similarity(box_feats)
                detach = mc.weak_finetune_detach
                delta_scores = transfer_scores(
                    delta_scores, sims["cls"], np.asarray(mc.base_ids),
                    np.asarray(mc.novel_ids), detach=detach,
                )
                proposal_deltas = transfer_deltas(
                    proposal_deltas, sims["bbox"], np.asarray(mc.base_ids),
                    np.asarray(mc.novel_ids), mc.num_classes, detach=detach,
                )
            scores = combine_cls_logits(delta_scores, weak_scores)
            bbox = proposal_deltas + weak_box_deltas
            if mc.finetune:
                scores = scores + sup["ft_scores"]
                bbox = bbox + sup["ft_deltas"]
            if not mc.finetune and not mc.weak_finetune_detach:
                scores = frcnn.mask_novel_scores(scores, mc.novel_ids)

            flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), sampled)
            losses.update(frcnn.fast_rcnn_losses(scores, bbox, flat, mc.frcnn))

            if mc.mask_on and "gt_masks" in strong:
                losses["loss_mask"] = self._mask_loss(
                    feats4d, sampled, strong, box_feats, b
                )

            if mc.use_meta and meta is not None:
                # rank loss over a proposal subsample (roi_heads.py:409-420).
                # The sampler emits min(roi_batch_size, post_nms_topk + gt
                # slots) proposals per image — use the actual slot count, not
                # mc.roi_batch_size (which overshoots on small-topk configs).
                attention = self.compute_meta_attention(meta)
                n_slots = sampled.boxes.shape[1]
                ks = min(mc.rank_loss_slots, n_slots)
                shp = pooled.shape[1:]
                pooled_sel = pooled.reshape(b, n_slots, *shp)[:, :ks]
                losses.update(
                    self.visual_attention.rank_loss(
                        pooled_sel.reshape((-1,) + shp),
                        sampled.gt_classes[:, :ks].reshape(-1),
                        sampled.valid[:, :ks].reshape(-1),
                        attention,
                        np.asarray(mc.base_ids),
                    )
                )

        if weak is not None:
            if feats_w is None:
                feats_w = self.features(weak["image"])
            pw = mc.weak_proposal_count
            if mc.load_proposals and "proposals" in weak:
                # precomputed (MCG) proposals, MODEL.LOAD_PROPOSALS path
                w_boxes = weak["proposals"][:, :pw]
                w_valid = weak["proposals_valid"][:, :pw]
            else:
                if logits_w is None:
                    logits_w, deltas_w = self.rpn(feats_w)
                fh, fw = feats_w.shape[1], feats_w.shape[2]
                anchors_w = rpn_lib.get_anchors(fh, fw, mc.rpn)
                props_w = rpn_lib.select_proposals(
                    jax.lax.stop_gradient(logits_w),
                    jax.lax.stop_gradient(deltas_w),
                    anchors_w, weak["image_size"], mc.rpn, training=True,
                )
                # top-(bspi // weak_divisor) proposals (roi_heads.py:566-572)
                w_boxes = props_w.boxes[:, :pw]
                w_valid = props_w.valid[:, :pw]
            pooled_w = self.pooled_rois(feats_w, w_boxes)
            head = "weak" if mc.multi_box_head else "box"
            weak_feats = self.box_features(pooled_w, head)
            streams = self.weak_detector(weak_feats)
            if mc.weak_detector_type == "PCL":
                from . import pcl as pcl_lib

                losses.update(
                    pcl_lib.pcl_detector_losses(
                        streams, w_boxes, w_valid, weak["labels"], mc.weak,
                        mc.num_kmeans_cluster, mc.graph_iou_threshold, mc.max_pc_num,
                    )
                )
            else:
                losses.update(
                    weak_lib.weak_detector_losses(
                        streams, w_boxes, w_valid, weak["labels"], mc.weak
                    )
                )
            if mc.rpn_self_training:
                losses.update(
                    self.rpn_self_training_losses(
                        weak, mc.weak_rpn_score_threshold
                    )
                )
        return losses

    def _mask_loss(self, feats4d, sampled, strong, box_feats, b):
        """Mask branch training loss over the fg-capacity slot slice
        (select_foreground_proposals equivalent; fg slots are sorted first by the
        sampler so the first ``mask_fg_slots`` slots contain every fg proposal)."""
        from . import mask_head as mask_lib

        mc = self.mc
        k = mc.mask_fg_slots
        s = mc.roi_batch_size
        shp = feats4d.shape[1:]
        sel4d = feats4d.reshape(b, s, *shp)[:, :k].reshape(-1, *shp)
        if mc.mask_head_finetune:
            logits, delta = self.mask_head(sel4d, return_delta=True)
        else:
            logits = self.mask_head(sel4d)
            delta = None
        if mc.finetune or mc.weak_finetune_detach:
            sims = self.inference_similarity(box_feats)
            seg_sim = sims["seg"]
            if seg_sim.ndim > 2:
                seg_sim = seg_sim.reshape(b, s, *seg_sim.shape[1:])[:, :k].reshape(
                    -1, *seg_sim.shape[1:]
                )
            logits = mask_lib.transfer_mask_logits(
                logits, seg_sim, np.asarray(mc.base_ids), np.asarray(mc.novel_ids)
            )
        if delta is not None:
            logits = logits + delta

        def slc(x):
            return x.reshape(b, s, *x.shape[2:])[:, :k].reshape((-1,) + x.shape[2:])

        gt_masks = strong["gt_masks"]  # [B, G, Mg, Mg]
        gidx = sampled.gt_index[:, :k]  # [B, k]
        sel_masks = jnp.take_along_axis(
            gt_masks, gidx[:, :, None, None], axis=1
        ).reshape(-1, *gt_masks.shape[2:])
        gt_boxes_frame = sampled.gt_boxes[:, :k].reshape(-1, 4)
        roi_boxes = sampled.boxes[:, :k].reshape(-1, 4)
        fg = sampled.is_fg[:, :k].reshape(-1)
        classes = sampled.gt_classes[:, :k].reshape(-1)
        return mask_lib.mask_rcnn_loss(
            logits, classes, sel_masks, gt_boxes_frame, roi_boxes, fg
        )

    # ---------------------------------------------------------------- inference
    def inference_similarity(self, box_feats: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Similarity matrices for transfer (roi_heads.py:519-526)."""
        weak_eval_scores, _ = self.weak_detector.evaluation(box_feats)
        needs_weights = any(
            t.split("-")[0] in ("TopK", "WTopK", "LSDA")
            for _, ts in self.mc.sim.terms for t in ts
        )
        return sim_lib.similarity_matrices(
            self.mc.sim,
            embeddings=self.embeddings,
            weak_eval_scores=jax.lax.stop_gradient(weak_eval_scores),
            oicr_weight_mean=self.oicr_weight_mean() if needs_weights else None,
        )

    def predict_raw(
        self, images: jnp.ndarray, image_sizes: jnp.ndarray,
        with_transfer: bool = True,
        proposal_boxes: Optional[jnp.ndarray] = None,
        proposal_valid: Optional[jnp.ndarray] = None,
    ):
        """Everything of :meth:`predict` up to (but excluding) the final NMS:
        returns ``(probs [B,P,C+1], bbox [B,P,C*4], proposals, feats)``.
        Split out so the full-graph torch parity test can compare pre-NMS
        scores/deltas directly (the NMS itself has its own greedy-reference
        tests)."""
        mc = self.mc
        feats = self.features(images)
        if proposal_boxes is not None:
            proposals = rpn_lib.Proposals(
                boxes=proposal_boxes,
                objectness=jnp.zeros(proposal_boxes.shape[:2], jnp.float32),
                valid=(
                    proposal_valid
                    if proposal_valid is not None
                    else jnp.ones(proposal_boxes.shape[:2], bool)
                ),
            )
        else:
            logits, deltas = self.rpn(feats)
            fh, fw = feats.shape[1], feats.shape[2]
            anchors = rpn_lib.get_anchors(fh, fw, mc.rpn)
            proposals = rpn_lib.select_proposals(
                logits, deltas, anchors, image_sizes, mc.rpn, training=False
            )
        b, p = proposals.boxes.shape[:2]
        pooled = self.pooled_rois(feats, proposals.boxes)
        box_feats = self.box_features(pooled, "box")
        sup = self.supervised(box_feats)

        if mc.multi_box_head:
            sup_weak_feats = self.box_features(pooled, "weak")
        else:
            sup_weak_feats = box_feats
        weak_scores, weak_box_deltas = self.weak_detector.evaluation(sup_weak_feats)

        delta_scores = sup["delta_scores"]
        proposal_deltas = sup["proposal_deltas"]
        if with_transfer and len(mc.novel_ids):
            sims = self.inference_similarity(box_feats)
            delta_scores = transfer_scores(
                delta_scores, sims["cls"], np.asarray(mc.base_ids), np.asarray(mc.novel_ids)
            )
            proposal_deltas = transfer_deltas(
                proposal_deltas, sims["bbox"], np.asarray(mc.base_ids),
                np.asarray(mc.novel_ids), mc.num_classes,
            )
        scores = combine_cls_logits(delta_scores, weak_scores)
        bbox = proposal_deltas + weak_box_deltas
        if mc.finetune:
            scores = scores + sup["ft_scores"]
            bbox = bbox + sup["ft_deltas"]

        probs = jax.nn.softmax(scores, axis=-1).reshape(b, p, -1)
        bbox = bbox.reshape(b, p, -1)
        return probs, bbox, proposals, feats

    def predict(
        self, images: jnp.ndarray, image_sizes: jnp.ndarray,
        with_transfer: bool = True,
        proposal_boxes: Optional[jnp.ndarray] = None,
        proposal_valid: Optional[jnp.ndarray] = None,
    ) -> Detections:
        """Batched inference (generalizes the reference's batch-1-only path,
        rcnn.py:493-542).  With ``proposal_boxes`` given (PrecomputedProposals,
        the dock suite), the RPN is skipped entirely."""
        mc = self.mc
        probs, bbox, proposals, feats = self.predict_raw(
            images, image_sizes, with_transfer, proposal_boxes, proposal_valid
        )
        dets = jax.vmap(
            lambda pr, bx, pb, pv, hw: frcnn.fast_rcnn_inference_single(
                pr, bx, pb, pv, (hw[0], hw[1]), mc.frcnn
            )
        )(probs, bbox, proposals.boxes, proposals.valid, image_sizes)
        if mc.mask_on:
            dets = dets.replace(
                masks=self._predict_masks(feats, dets, with_transfer)
            )
        return dets

    def _predict_masks(self, feats, dets: Detections, with_transfer: bool):
        """Cascaded mask prediction on the final boxes
        (forward_with_given_boxes, roi_heads.py:777-782)."""
        from . import mask_head as mask_lib

        mc = self.mc
        b, d = dets.boxes.shape[:2]
        pooled = self.pooled_rois(feats, dets.boxes)
        feats4d = self.box_head(pooled, spatial_mean=False)
        if mc.mask_head_finetune:
            logits, delta = self.mask_head(feats4d, return_delta=True)
        else:
            logits, delta = self.mask_head(feats4d), None
        if with_transfer and len(mc.novel_ids):
            det_box_feats = jnp.mean(feats4d, axis=(-3, -2)).astype(jnp.float32)
            sims = self.inference_similarity(det_box_feats)
            logits = mask_lib.transfer_mask_logits(
                logits, sims["seg"], np.asarray(mc.base_ids), np.asarray(mc.novel_ids)
            )
        if delta is not None:
            logits = logits + delta
        masks = mask_lib.mask_rcnn_inference(logits, dets.classes.reshape(-1))
        return masks.reshape(b, d, *masks.shape[1:])

    def predict_weak_only(
        self, images: jnp.ndarray, image_sizes: jnp.ndarray, proposals=None
    ) -> Detections:
        """WeakRCNN inference (rcnn.py:21-185 non-TTA path): class probabilities
        are the SUM of softmaxes over the OICR refinement heads
        (weak_detector predict_probs, weak_detector_fast_rcnn.py:280-287).
        ``proposals`` (a Proposals pytree) overrides the RPN when the dataset
        carries precomputed MCG proposals (MODEL.LOAD_PROPOSALS)."""
        mc = self.mc
        feats = self.features(images)
        if proposals is None:
            logits, deltas = self.rpn(feats)
            fh, fw = feats.shape[1], feats.shape[2]
            anchors = rpn_lib.get_anchors(fh, fw, mc.rpn)
            proposals = rpn_lib.select_proposals(
                logits, deltas, anchors, image_sizes, mc.rpn, training=False
            )
        b, p = proposals.boxes.shape[:2]
        pooled = self.pooled_rois(feats, proposals.boxes)
        head = "weak" if mc.multi_box_head else "box"
        weak_feats = self.box_features(pooled, head)
        weak_scores, weak_box_deltas = self.weak_detector.evaluation(weak_feats)
        probs = jnp.sum(jax.nn.softmax(weak_scores, axis=-1), axis=0)
        if probs.shape[-1] == mc.num_classes:  # no bg column (MIL-only head)
            probs = jnp.pad(probs, ((0, 0), (0, 1)))
        probs = probs.reshape(b, p, -1)
        bbox = weak_box_deltas.reshape(b, p, -1)
        return jax.vmap(
            lambda pr, bx, pb, pv, hw: frcnn.fast_rcnn_inference_single(
                pr, bx, pb, pv, (hw[0], hw[1]), mc.frcnn
            )
        )(probs, bbox, proposals.boxes, proposals.valid, image_sizes)

    def rpn_self_training_losses(
        self, weak: Dict[str, jnp.ndarray], score_threshold: float = 0.99
    ) -> Dict[str, jnp.ndarray]:
        """WeaklySupervisedRCNNRPN (rcnn.py:544-705): the weak branch's own
        high-confidence predictions, filtered to classes present in the image
        labels (rcnn.py:593-599), become RPN pseudo-GT on the weak images."""
        mc = self.mc
        dets = self.predict_weak_only(weak["image"], weak["image_size"])
        dets = jax.tree.map(jax.lax.stop_gradient, dets)
        cls_in_image = jnp.take_along_axis(
            weak["labels"], dets.classes, axis=1
        ) > 0.5
        keep = dets.valid & cls_in_image & (dets.scores > score_threshold)
        pseudo = GTInstances(boxes=dets.boxes, classes=dets.classes, valid=keep)

        feats_w = self.features(weak["image"])
        logits_w, deltas_w = self.rpn(feats_w)
        anchors_w = rpn_lib.get_anchors(feats_w.shape[1], feats_w.shape[2], mc.rpn)
        key = jax.random.PRNGKey(0)
        losses = rpn_lib.rpn_losses(key, logits_w, deltas_w, anchors_w, pseudo, mc.rpn)
        return {f"{k}_weak": v for k, v in losses.items()}

    def predict_tta(
        self,
        canonical_image: jnp.ndarray,        # [B, H, W, 3] MIN_SIZE_TEST frame
        canonical_image_sizes: jnp.ndarray,  # [B, 2] true size in that frame
        variants,                      # list of dicts: {image, image_size, scale, flip}
        with_transfer: bool = True,
        proposal_boxes: Optional[jnp.ndarray] = None,
        proposal_valid: Optional[jnp.ndarray] = None,
        tta_topk: int = 0,
    ) -> Detections:
        """Multi-scale + flip test-time augmentation (rcnn.py:136-185).

        Proposals are generated once on the canonical image; for every variant
        the proposals are rescaled/flipped into its frame, ROI-pooled and
        scored; class probabilities are SUMMED over variants and box deltas are
        AVERAGED (with dx mirrored back for flipped variants — the one deliberate
        fix over the reference, which averages raw flipped deltas), then decoded
        on the canonical proposals and run through one NMS pass.

        With ``proposal_boxes`` given (PrecomputedProposals, the dock suite),
        the RPN and the canonical backbone pass are skipped and the supplied
        canonical-frame boxes are rescaled/flipped into every variant's frame
        — the reference's TTA threads precomputed proposals through each
        augmentation the same way (rcnn.py:47-83: resize/flip transforms
        applied to ``proposals.proposal_boxes`` per variant).
        """
        mc = self.mc
        if proposal_boxes is not None:
            proposals = rpn_lib.Proposals(
                boxes=proposal_boxes,
                objectness=jnp.zeros(proposal_boxes.shape[:2], jnp.float32),
                valid=(
                    proposal_valid
                    if proposal_valid is not None
                    else jnp.ones(proposal_boxes.shape[:2], bool)
                ),
            )
        else:
            feats0 = self.features(canonical_image)
            logits, deltas = self.rpn(feats0)
            fh, fw = feats0.shape[1], feats0.shape[2]
            anchors = rpn_lib.get_anchors(fh, fw, mc.rpn)
            proposals = rpn_lib.select_proposals(
                logits, deltas, anchors, canonical_image_sizes, mc.rpn, training=False
            )
        if tta_topk and tta_topk < proposals.boxes.shape[1]:
            # Optional throughput knob (``TPU.TTA_PROPOSAL_TOPK``, default off
            # = reference-exact): re-score only the top-K canonical proposals
            # by objectness across all variants.  Head cost scales ~K/P;
            # accuracy impact measured on shapes-VOC in BASELINE.md.
            score = jnp.where(proposals.valid, proposals.objectness, -jnp.inf)
            idx = jax.lax.top_k(score, tta_topk)[1]  # [B, K]
            proposals = rpn_lib.Proposals(
                boxes=jnp.take_along_axis(proposals.boxes, idx[..., None], axis=1),
                objectness=jnp.take_along_axis(proposals.objectness, idx, axis=1),
                valid=jnp.take_along_axis(proposals.valid, idx, axis=1),
            )
        b, p = proposals.boxes.shape[:2]

        # Variants sharing an image shape (i.e. each scale's noflip/flip pair)
        # are stacked on the batch axis and run through backbone + ROI heads as
        # ONE pass: at eval batch 1 a batch-2 conv pass costs nearly the same
        # as batch-1 on the MXU, halving TTA wall-clock vs the reference's
        # strictly per-variant loop (rcnn.py:136-185).  Grouping is static at
        # trace time; per-variant semantics (flip mirroring, per-variant
        # similarity matrices) are preserved by slicing group outputs.
        groups: Dict[tuple, list] = {}
        for vi, var in enumerate(variants):
            groups.setdefault(tuple(var["image"].shape), []).append(vi)

        sum_probs = None
        sum_deltas = None
        n_rows = b * p
        for idxs in groups.values():
            g = len(idxs)
            boxes_list = []
            for i in idxs:
                var = variants[i]
                boxes_v = proposals.boxes * var["scale"]
                if bool(var["flip"]):
                    w_img = var["image_size"][:, 1][:, None]  # true width per image
                    x1 = w_img - boxes_v[:, :, 2]
                    x2 = w_img - boxes_v[:, :, 0]
                    boxes_v = jnp.stack(
                        [x1, boxes_v[:, :, 1], x2, boxes_v[:, :, 3]], axis=-1
                    )
                boxes_list.append(boxes_v)
            imgs_g = jnp.concatenate([variants[i]["image"] for i in idxs], axis=0)
            boxes_g = jnp.concatenate(boxes_list, axis=0)  # [g*B, P, 4]
            feats_g = self.features(imgs_g)
            pooled = self.pooled_rois(feats_g, boxes_g)  # [g*B*P, ...]
            box_feats = self.box_features(pooled, "box")
            sup = self.supervised(box_feats)
            if mc.multi_box_head:
                sup_weak_feats = self.box_features(pooled, "weak")
            else:
                sup_weak_feats = box_feats
            weak_scores, weak_box_deltas = self.weak_detector.evaluation(sup_weak_feats)

            delta_scores = sup["delta_scores"]
            proposal_deltas = sup["proposal_deltas"]
            if with_transfer and len(mc.novel_ids):
                # similarity is per variant (the reference computes it from each
                # variant's own proposals, roi_heads.py:519-526) — slice the
                # group's rows back apart before building the matrices
                ds_parts, pd_parts = [], []
                for gi in range(g):
                    sl = slice(gi * n_rows, (gi + 1) * n_rows)
                    sims = self.inference_similarity(box_feats[sl])
                    ds_parts.append(transfer_scores(
                        delta_scores[sl], sims["cls"], np.asarray(mc.base_ids),
                        np.asarray(mc.novel_ids),
                    ))
                    pd_parts.append(transfer_deltas(
                        proposal_deltas[sl], sims["bbox"], np.asarray(mc.base_ids),
                        np.asarray(mc.novel_ids), mc.num_classes,
                    ))
                delta_scores = jnp.concatenate(ds_parts, axis=0)
                proposal_deltas = jnp.concatenate(pd_parts, axis=0)
            scores = combine_cls_logits(delta_scores, weak_scores)
            bbox = proposal_deltas + weak_box_deltas
            if mc.finetune:
                scores = scores + sup["ft_scores"]
                bbox = bbox + sup["ft_deltas"]
            probs = jax.nn.softmax(scores, axis=-1)
            # mirror dx back for flipped variants (one sign per variant)
            sign = np.asarray(
                [-1.0 if bool(variants[i]["flip"]) else 1.0 for i in idxs],
                np.float32,
            )
            bbox4 = bbox.reshape(g, n_rows, -1, 4)
            bbox4 = bbox4.at[..., 0].multiply(sign[:, None, None])
            probs_sum = probs.reshape(g, n_rows, -1).sum(axis=0)
            deltas_sum = bbox4.reshape(g, n_rows, -1).sum(axis=0)
            sum_probs = probs_sum if sum_probs is None else sum_probs + probs_sum
            sum_deltas = deltas_sum if sum_deltas is None else sum_deltas + deltas_sum

        n_var = float(len(variants))
        probs = (sum_probs).reshape(b, p, -1)  # summed (not normalized), ref :163
        mean_deltas = (sum_deltas / n_var).reshape(b, p, -1)
        return jax.vmap(
            lambda pr, bx, pb, pv, hw: frcnn.fast_rcnn_inference_single(
                pr, bx, pb, pv, (hw[0], hw[1]), mc.frcnn
            )
        )(probs, mean_deltas, proposals.boxes, proposals.valid, canonical_image_sizes)

    def __call__(self, images: jnp.ndarray, image_sizes: jnp.ndarray):
        """Init path: touch every submodule so all params are created."""
        feats = self.features(images)
        logits, deltas = self.rpn(feats)
        boxes = jnp.tile(
            jnp.asarray([[0.0, 0.0, 64.0, 64.0]]), (images.shape[0], 4, 1)
        ).reshape(images.shape[0], 4, 4)
        pooled = self.pooled_rois(feats, boxes)
        bf = self.box_features(pooled, "box")
        if self.mc.multi_box_head:
            wf = self.box_features(pooled, "weak")
        else:
            wf = bf
        sup = self.supervised(bf)
        streams = self.weak_detector(wf)
        _ = self.weak_detector.evaluation(wf)
        if self.mc.mask_on:
            f4 = self.box_head(pooled, spatial_mean=False)
            _ = self.mask_head(f4, return_delta=self.mc.mask_head_finetune)
        if self.mc.use_meta:
            att = self.visual_attention.support_prototypes(
                jnp.zeros((1, 1) + feats.shape[1:]),
                jnp.asarray([[[0.0, 0.0, 32.0, 32.0]]]),
                jnp.ones((1,), bool),
                np.asarray([0]),
            )
            _ = self.visual_attention.rank_loss(
                pooled[:1], jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
                att, np.asarray(self.mc.base_ids),
            )
        _ = self.embeddings
        return logits.shape, sup["delta_scores"].shape, streams["classifier_stream"].shape
