"""PrecomputedProposals (dock suite) on the STRONG stream and at inference.

The reference's dock configs set PROPOSAL_GENERATOR: "PrecomputedProposals"
(COCO-VGG-CNN-F-split1-dock.yaml): MCG proposals replace the RPN for every
stream, and the RPN contributes no losses.  Covers:
  - train_losses with strong['proposals']: no RPN loss keys, finite losses
  - predict with proposal_boxes: RPN skipped, detections returned
  - equality: detection boxes derive from the provided proposals
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config, _strong_batch, _weak_batch


def _proposals_for(batch, n=32):
    rng = np.random.RandomState(3)
    b = batch["image"].shape[0]
    boxes = np.zeros((b, n, 4), np.float32)
    boxes[..., :2] = rng.rand(b, n, 2) * 30
    boxes[..., 2:] = boxes[..., :2] + 8 + rng.rand(b, n, 2) * 20
    # include the GT boxes so sampling finds foreground
    g = np.asarray(batch["gt_boxes"])
    boxes[:, : g.shape[1]] = g
    valid = np.ones((b, n), bool)
    return jnp.asarray(boxes), jnp.asarray(valid)


@pytest.mark.slow
def test_strong_precomputed_train_step_and_predict():
    mc = dataclasses.replace(tiny_config(), load_proposals=True)
    model = WSRCNN(mc=mc)
    strong = _strong_batch(b=1)
    weak = _weak_batch(b=1)
    pb, pv = _proposals_for(strong)
    strong = dict(strong)
    strong["proposals"], strong["proposals_valid"] = pb, pv
    weak = dict(weak)
    weak["proposals"], weak["proposals_valid"] = pb, pv

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.float32),
    )
    losses = model.apply(
        variables, jax.random.PRNGKey(1), strong, weak,
        method=WSRCNN.train_losses,
    )
    assert not any(k.startswith("loss_rpn") for k in losses), sorted(losses)
    assert "loss_cls" in losses and "loss_im_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    det = model.apply(
        variables, strong["image"], strong["image_size"],
        proposal_boxes=pb, proposal_valid=pv, method=WSRCNN.predict,
    )
    assert np.isfinite(np.asarray(det.boxes)).all()
    # every surviving detection decodes from one of the provided proposals:
    # with zero-init bbox deltas the raw boxes equal the proposals
    v = np.asarray(det.valid)
    if v.any():
        dboxes = np.asarray(det.boxes)[v]
        prop = np.asarray(pb)[0]
        d = np.abs(dboxes[:, None, :] - prop[None, :, :]).max(-1).min(-1)
        assert float(d.max()) < 32.0  # decoded near provided proposals
