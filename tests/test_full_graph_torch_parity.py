"""Full inference-graph parity: torch assembly of the reference semantics vs
our ``WSRCNN.predict_raw``.

The strongest offline proxy for the (data-blocked) mAP-parity north star: an
independent torch reimplementation of the reference's ENTIRE frozen forward —
ResNet-C4 -> RPN head -> proposal selection (top-k, delta decode, clip, greedy
NMS) -> ROIAlignV2 -> dual Res5 box heads -> supervised delta predictor +
weak-detector OICR evaluation -> lingual+visual similarity -> base->novel
transfer -> combined logits -> softmax — run with SHARED random weights on the
same images, asserting end-to-end score/box parity.

Reference call stack being mirrored:
  /root/reference/modeling/meta_arch/rcnn.py:493-542 (inference),
  /root/reference/modeling/roi_heads/roi_heads.py:496-540 (_forward_box),
  :245-336 (get_similarity_matrices),
  /root/reference/modeling/roi_heads/fast_rcnn.py:384-433 (forward + transfer),
  /root/reference/modeling/roi_heads/weak_detector_fast_rcnn.py:167-187
  (evaluation).

If any op's semantics drift from the reference (anchor parameterization, delta
decode clamps, NMS ordering, ROIAlignV2 sampling, the transfer einsums, the
softmax/renorm chain of the similarity matrices), the two stacks diverge and
this test fails.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unit_tpu.models import rpn as rpn_lib  # noqa: E402
from unit_tpu.models import fast_rcnn as frcnn  # noqa: E402
from unit_tpu.models import similarity as sim_lib  # noqa: E402
from unit_tpu.models.meta_arch import ModelConfig, WSRCNN  # noqa: E402

from test_torch_parity import TorchResNetC4  # noqa: E402

# VOC split-1 class partition (configs/VOC/VOC-RCNN-101-C4-split1.yaml)
NOVEL_IDS = (2, 5, 9, 13, 17)
BASE_IDS = tuple(i for i in range(20) if i not in NOVEL_IDS)
PIXEL_MEAN = (103.53, 116.28, 123.675)
POST_K = 128
SCALE_CLAMP = float(np.log(1000.0 / 16.0))


# --------------------------------------------------------------------------- #
# independent numpy/torch reimplementation of the reference ops
# --------------------------------------------------------------------------- #

def np_anchors(fh, fw, stride=16, sizes=(32, 64, 128, 256, 512),
               ars=(0.5, 1.0, 2.0)):
    """d2 DefaultAnchorGenerator: w = sqrt(size^2/ar), h = ar*w, offset 0."""
    cell = []
    for size in sizes:
        for ar in ars:
            w = np.sqrt(size * size / ar)
            h = ar * w
            cell.append([-w / 2, -h / 2, w / 2, h / 2])
    cell = np.asarray(cell, np.float32)  # [A, 4]
    sx = np.arange(fw, dtype=np.float32) * stride
    sy = np.arange(fh, dtype=np.float32) * stride
    gx, gy = np.meshgrid(sx, sy)
    shifts = np.stack([gx, gy, gx, gy], -1)  # [fh, fw, 4]
    return (shifts[:, :, None, :] + cell[None, None]).reshape(-1, 4)


def np_apply_deltas(deltas, boxes):
    """Box2BoxTransform.apply_deltas, weights (1,1,1,1)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy = deltas[:, 0], deltas[:, 1]
    dw = np.minimum(deltas[:, 2], SCALE_CLAMP)
    dh = np.minimum(deltas[:, 3], SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = np.exp(dw) * w
    ph = np.exp(dh) * h
    return np.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], -1
    )


def np_iou_one_to_many(box, boxes):
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
    a = max(box[2] - box[0], 0) * max(box[3] - box[1], 0)
    b = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    union = a + b - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)


def np_select_proposals(logits, deltas, anchors, hw, nms_thresh=0.7,
                        post_k=POST_K):
    """Reference RPN proposal selection: score sort -> decode -> clip ->
    drop empty -> greedy NMS (IoU > thresh suppresses) -> top post_k."""
    order = np.argsort(-logits)
    boxes = np_apply_deltas(deltas[order], anchors[order])
    H, W = hw
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, W)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, H)
    ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    ok &= np.isfinite(logits[order])
    kept = []
    for j in range(boxes.shape[0]):
        if not ok[j]:
            continue
        if kept and np.any(np_iou_one_to_many(boxes[j], boxes[kept]) > nms_thresh):
            continue
        kept.append(j)
        if len(kept) == post_k:
            break
    return boxes[kept], logits[order][kept]


def torch_roi_align_v2(feat, rois, p=14, scale=1.0 / 16.0, sr=2):
    """ROIAlignV2 (aligned): -0.5 pixel-center shift, sr x sr bilinear samples
    per bin, out-of-range samples (coord < -1 or > size) contribute zero.
    feat: [H, W, C] torch, rois: [N, 4] numpy. Returns [N, p, p, C]."""
    H, W, C = feat.shape
    outs = []
    frac = (np.arange(sr) + 0.5) / sr
    grid = (np.arange(p)[:, None] + frac[None, :]).reshape(-1)  # [p*sr]
    flat = feat.reshape(H * W, C)
    for roi in rois:
        x1, y1, x2, y2 = roi * scale - 0.5
        bw = (x2 - x1) / p
        bh = (y2 - y1) / p
        ys = y1 + bh * grid  # [p*sr]
        xs = x1 + bw * grid
        yy = np.repeat(ys, p * sr)
        xx = np.tile(xs, p * sr)
        oob = (yy < -1) | (yy > H) | (xx < -1) | (xx > W)
        yc = yy.clip(0, H - 1)
        xc = xx.clip(0, W - 1)
        y0 = np.floor(yc)
        x0 = np.floor(xc)
        y1i = np.minimum(y0 + 1, H - 1).astype(np.int64)
        x1i = np.minimum(x0 + 1, W - 1).astype(np.int64)
        y0i = y0.astype(np.int64)
        x0i = x0.astype(np.int64)
        ly = torch.as_tensor((yc - y0)[:, None], dtype=feat.dtype)
        lx = torch.as_tensor((xc - x0)[:, None], dtype=feat.dtype)
        v = (
            flat[y0i * W + x0i] * (1 - ly) * (1 - lx)
            + flat[y0i * W + x1i] * (1 - ly) * lx
            + flat[y1i * W + x0i] * ly * (1 - lx)
            + flat[y1i * W + x1i] * ly * lx
        )
        v = torch.where(torch.as_tensor(oob[:, None]), torch.zeros_like(v), v)
        v = v.reshape(p, sr, p, sr, C).mean(dim=(1, 3))
        outs.append(v)
    return torch.stack(outs)


# --------------------------------------------------------------------------- #
# weight sharing: randomize the flax tree, copy into torch modules
# --------------------------------------------------------------------------- #

def randomize_params(params, seed=0):
    rng = np.random.RandomState(seed)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        name = keys[-1]
        parent = keys[-2] if len(keys) > 1 else ""
        shape = leaf.shape
        if name == "embeddings":
            val = rng.randn(*shape)
        elif parent.endswith("_bn"):
            if name in ("weight", "var"):
                val = rng.uniform(0.5, 1.5, shape)
            else:  # bias, mean
                val = rng.randn(*shape) * 0.1
        elif name == "kernel":
            fan_in = int(np.prod(shape[:-1]))
            val = rng.randn(*shape) * (0.4 / np.sqrt(fan_in))
        else:  # conv/dense bias
            val = rng.randn(*shape) * 0.01
        out[tuple(keys)] = np.asarray(val, np.float32)

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return jnp.asarray(out[prefix])

    return rebuild(jax.tree.map(lambda x: x, params) if isinstance(params, dict)
                   else params)


def t(x):
    return torch.as_tensor(np.asarray(x, np.float32).copy())


def set_conv(conv, kernel):
    # flax [kh, kw, cin, cout] -> torch [cout, cin, kh, kw]
    with torch.no_grad():
        conv.weight.copy_(t(kernel).permute(3, 2, 0, 1))


def set_bn(bn, p):
    with torch.no_grad():
        bn.weight.copy_(t(p["weight"]))
        bn.bias.copy_(t(p["bias"]))
        bn.running_mean.copy_(t(p["mean"]))
        bn.running_var.copy_(t(p["var"]))


def copy_stage(tseq, sp):
    for i, blk in enumerate(tseq):
        bp = sp[f"block{i}"]
        for j in (1, 2, 3):
            set_conv(getattr(blk, f"conv{j}"), bp[f"conv{j}"]["kernel"])
            set_bn(getattr(blk, f"conv{j}").norm, bp[f"conv{j}_bn"])
        if blk.shortcut is not None:
            set_conv(blk.shortcut, bp["shortcut"]["kernel"])
            set_bn(blk.shortcut.norm, bp["shortcut_bn"])


def make_linear(p):
    lin = torch.nn.Linear(p["kernel"].shape[0], p["kernel"].shape[1])
    with torch.no_grad():
        lin.weight.copy_(t(p["kernel"]).T)  # flax [cin, cout] -> torch [cout, cin]
        lin.bias.copy_(t(p["bias"]))
    return lin.eval()


# --------------------------------------------------------------------------- #
# the test
# --------------------------------------------------------------------------- #

def test_roi_align_v2_vs_independent_torch():
    """Op-level cross-check of roi_align_xla against the independent torch
    ROIAlignV2 above (round-3 review: the NumPy golden in test_roi_align.py is
    a transcription; this one is a second, independently written
    implementation). Random feature maps, boxes spanning in-bounds,
    partially-out-of-bounds and sub-bin-sized cases."""
    from unit_tpu.ops.roi_align import roi_align_xla

    rng = np.random.RandomState(11)
    H, W, C = 25, 37, 8
    feat = rng.randn(H, W, C).astype(np.float32)
    n = 40
    x1 = rng.uniform(-40, W * 16, n)
    y1 = rng.uniform(-40, H * 16, n)
    rois = np.stack(
        [x1, y1, x1 + rng.uniform(0.5, 500, n), y1 + rng.uniform(0.5, 500, n)], -1
    ).astype(np.float32)

    ours = np.asarray(
        roi_align_xla(jnp.asarray(feat), jnp.asarray(rois), output_size=7,
                      spatial_scale=1.0 / 16.0, sampling_ratio=2, aligned=True)
    )
    theirs = torch_roi_align_v2(
        torch.as_tensor(feat), rois, p=7, scale=1.0 / 16.0, sr=2
    ).numpy()
    assert ours.shape == theirs.shape
    d = np.abs(ours - theirs).max()
    assert d < 1e-5, f"ROIAlignV2 op mismatch: max|diff|={d}"


@pytest.mark.slow
def test_full_inference_graph_parity():
    depth = 26
    B, H, W = 2, 224, 288
    mc = ModelConfig(
        depth=depth,
        num_classes=20,
        base_ids=BASE_IDS,
        novel_ids=NOVEL_IDS,
        multi_box_head=True,
        oicr_iter=3,
        compute_dtype="float32",
        roi_align_impl="xla",
        rpn=rpn_lib.RPNConfig(post_nms_topk_test=POST_K),
        frcnn=frcnn.FastRCNNConfig(num_classes=20),
        sim=sim_lib.SimilarityConfig(
            terms=(("cls", ("lingual", "visual")), ("bbox", ("lingual",))),
            base_ids=BASE_IDS,
            novel_ids=NOVEL_IDS,
            coco_indexer=tuple(sim_lib.coco_indexer_for(sim_lib.VOC_CLASSES)),
        ),
    )
    model = WSRCNN(mc=mc)

    rng = np.random.RandomState(7)
    images = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    image_sizes = np.asarray([[H, W]] * B, np.int32)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(images[:1]), jnp.asarray(image_sizes[:1])
    )
    params = randomize_params(variables["params"], seed=3)

    # ---------------- our stack: full pre-NMS inference graph ----------------
    probs_j, bbox_j, proposals_j, _ = model.apply(
        {"params": params}, jnp.asarray(images), jnp.asarray(image_sizes),
        method=WSRCNN.predict_raw,
    )
    probs_j = np.asarray(probs_j)
    bbox_j = np.asarray(bbox_j)
    prop_boxes_j = np.asarray(proposals_j.boxes)
    prop_valid_j = np.asarray(proposals_j.valid)

    # ---------------- torch assembly of the reference semantics --------------
    tm = TorchResNetC4(depth=depth).eval()
    copy_stage(tm.res5, params["box_head"]["res5"])
    set_conv(tm.stem.conv1, params["backbone"]["stem_conv1"]["kernel"])
    set_bn(tm.stem.conv1.norm, params["backbone"]["stem_conv1_bn"])
    for s in (2, 3, 4):
        copy_stage(getattr(tm, f"res{s}"), params["backbone"][f"res{s}"])
    tm_weak = TorchResNetC4(depth=depth).eval()
    copy_stage(tm_weak.res5, params["weak_box_head"]["res5"])

    rp = params["rpn_head"]
    A = mc.rpn.num_cell_anchors
    conv_rpn = torch.nn.Conv2d(1024, 1024, 3, padding=1)
    conv_obj = torch.nn.Conv2d(1024, A, 1)
    conv_del = torch.nn.Conv2d(1024, A * 4, 1)
    with torch.no_grad():
        conv_rpn.weight.copy_(t(rp["conv"]["kernel"]).permute(3, 2, 0, 1))
        conv_rpn.bias.copy_(t(rp["conv"]["bias"]))
        conv_obj.weight.copy_(t(rp["objectness_logits"]["kernel"]).permute(3, 2, 0, 1))
        conv_obj.bias.copy_(t(rp["objectness_logits"]["bias"]))
        conv_del.weight.copy_(t(rp["anchor_deltas"]["kernel"]).permute(3, 2, 0, 1))
        conv_del.bias.copy_(t(rp["anchor_deltas"]["bias"]))

    lin_cls_delta = make_linear(params["supervised"]["cls_score_delta"])
    lin_bbox_delta = make_linear(params["supervised"]["bbox_pred_delta"])
    lin_oicr = [
        make_linear(params["weak_detector"][f"oicr_predictor_{i}"]) for i in range(3)
    ]
    embeddings = np.asarray(params["embeddings"])

    with torch.no_grad():
        x = torch.as_tensor(images).permute(0, 3, 1, 2)
        x = x - torch.tensor(PIXEL_MEAN).view(1, 3, 1, 1)
        feats = tm.forward_c4(x)  # [B, 1024, fh, fw]
        fh, fw = feats.shape[2], feats.shape[3]

        tr = F.relu(conv_rpn(feats))
        # (N, A, H, W) -> (N, H, W, A) flatten, matching d2's permute order
        logits = conv_obj(tr).permute(0, 2, 3, 1).reshape(B, -1).numpy()
        deltas = (
            conv_del(tr).permute(0, 2, 3, 1).reshape(B, fh * fw * A, 4).numpy()
        )
    anchors = np_anchors(fh, fw)

    coco_idx = sim_lib.coco_indexer_for(sim_lib.VOC_CLASSES)
    emb = embeddings[coco_idx]
    lingual = emb[list(NOVEL_IDS)] @ emb[list(BASE_IDS)].T  # [V, Bc]
    lingual_sm = torch.softmax(t(lingual), dim=-1).numpy()

    for i in range(B):
        pb, _ = np_select_proposals(logits[i], deltas[i], anchors, (H, W))
        n_valid = int(prop_valid_j[i].sum())
        assert n_valid == pb.shape[0], (
            f"img {i}: proposal count {n_valid} vs torch {pb.shape[0]}"
        )
        assert n_valid >= 32, f"img {i}: only {n_valid} proposals — comparison too thin"
        dprop = np.abs(prop_boxes_j[i][:n_valid] - pb).max()
        assert dprop < 0.05, f"img {i}: proposal boxes max|diff|={dprop}"

        with torch.no_grad():
            fmap = feats[i].permute(1, 2, 0)  # [fh, fw, 1024]
            pooled = torch_roi_align_v2(fmap, pb)  # [N, 14, 14, 1024]
            pooled = pooled.permute(0, 3, 1, 2)
            box_feats = tm.res5(pooled).mean(dim=(2, 3))        # [N, 2048]
            weak_feats = tm_weak.res5(pooled).mean(dim=(2, 3))  # [N, 2048]

            delta_scores = lin_cls_delta(box_feats).numpy()       # [N, 21]
            proposal_deltas = lin_bbox_delta(box_feats).numpy()   # [N, 80]
            oicr_on_box = torch.stack([l(box_feats) for l in lin_oicr])
            oicr_on_weak = torch.stack([l(weak_feats) for l in lin_oicr])

            # visual similarity from the BOX head features (roi_heads.py:250-257)
            vis_probs = torch.softmax(oicr_on_box.mean(dim=0), dim=-1).numpy()
            vis = vis_probs[:, list(BASE_IDS)]
            vis = vis / vis.sum(-1, keepdims=True).clip(1e-9)
            vis[vis < 0.02] = 0.0
            # Sum combination: cls = 1/2 softmax(lingual) + 1/2 visual, renorm
            sim_cls = 0.5 * lingual_sm[None] + 0.5 * vis[:, None, :]  # [N, V, Bc]
            sim_cls = sim_cls / sim_cls.sum(-1, keepdims=True).clip(1e-9)
            sim_bbox = lingual_sm / lingual_sm.sum(-1, keepdims=True).clip(1e-9)

            # base->novel transfer (fast_rcnn.py:401-426)
            base_scores = delta_scores[:, list(BASE_IDS)]  # [N, Bc]
            tr_cls = np.einsum("nvb,nb->nv", sim_cls, base_scores)
            delta_scores[:, list(NOVEL_IDS)] += tr_cls
            d4 = proposal_deltas.reshape(-1, 20, 4)
            base_d = d4[:, list(BASE_IDS)]
            out_d = np.zeros_like(d4)
            out_d[:, list(NOVEL_IDS)] = np.einsum("vb,nbd->nvd", sim_bbox, base_d)
            out_d[:, list(BASE_IDS)] = base_d

            # combined logits = delta + OICR-iteration mean on the WEAK head
            scores = delta_scores + oicr_on_weak.mean(dim=0).numpy()
            probs_t = torch.softmax(t(scores), dim=-1).numpy()
            bbox_t = out_d.reshape(-1, 80)  # weak bbox deltas are zero

        dp = np.abs(probs_j[i][:n_valid] - probs_t).max()
        assert dp < 2e-3, f"img {i}: probs max|diff|={dp}"
        db = np.abs(bbox_j[i][:n_valid] - bbox_t).max()
        assert db < 2e-3, f"img {i}: bbox deltas max|diff|={db}"
        # sanity: scores are non-degenerate (transfer actually moved novel cols)
        assert np.abs(tr_cls).max() > 1e-4
