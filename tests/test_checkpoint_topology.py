"""Checkpoint portability across device topologies.

Checkpoints are host-snapshot pytrees (checkpoint/checkpointer.py
``_host_snapshot``), so a run may resume on a DIFFERENT mesh than it was
saved from — e.g. a preempted 8-chip job resumed on 4 chips, or a multi-chip
base-training checkpoint fine-tuned on one chip.  The reference has no
analogue (torch.save of a DDP module is world-size-agnostic too, but it is
never exercised; resuming there re-launches the same --num-gpus).  Parity
bar: save on one topology, restore+reshard on another, and the continued
run must match an uninterrupted single-device run exactly (the DP-equality
guarantee extends across the save/restore boundary).
"""

import jax
import numpy as np
import optax
import pytest

from unit_tpu.checkpoint import Checkpointer
from unit_tpu.engine.train import create_train_state, make_train_step
from unit_tpu.models import WSRCNN
from unit_tpu.parallel import make_mesh, replicate, shard_batch

from tests.test_model_smoke import tiny_config


def _batch(seed, b=4):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((b, 4, 4), np.float32)
    boxes[..., :2] = rng.rand(b, 4, 2) * 20
    boxes[..., 2:] = boxes[..., :2] + 10
    strong = {
        "image": rng.rand(b, 64, 64, 3).astype(np.float32),
        "gt_boxes": boxes,
        "gt_classes": np.zeros((b, 4), np.int32),
        "gt_valid": np.ones((b, 4), bool),
        "image_size": np.asarray([[64, 64]] * b, np.float32),
    }
    labels = np.zeros((b, 20), np.float32)
    labels[:, [1, 7]] = 1.0
    weak = {
        "image": rng.rand(b, 64, 64, 3).astype(np.float32),
        "labels": labels,
        "image_size": np.asarray([[64, 64]] * b, np.float32),
    }
    return strong, weak


@pytest.mark.slow
def test_resume_on_different_mesh_matches_uninterrupted(tmp_path):
    """4-dev DP steps -> checkpoint -> resume on 2-dev and 1-dev == straight run."""
    model = WSRCNN(mc=tiny_config(roi_batch_size=16, weak_proposal_count=16))
    opt = optax.sgd(1e-3, momentum=0.9)
    batches = [_batch(s) for s in range(3)]
    keys = [jax.random.fold_in(jax.random.PRNGKey(7), s) for s in range(3)]

    # uninterrupted single-device run: 3 steps
    state_ref = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 64, 64, 3))
    step_1 = make_train_step(model, opt)
    for (strong, weak), k in zip(batches, keys):
        state_ref, _ = step_1(state_ref, strong, weak, None, k)

    # 4-device DP: 2 steps, then checkpoint
    mesh4 = make_mesh(4)
    state = replicate(
        mesh4, create_train_state(model, opt, jax.random.PRNGKey(0), (1, 64, 64, 3))
    )
    step_4 = make_train_step(model, opt, mesh=mesh4)
    for (strong, weak), k in zip(batches[:2], keys[:2]):
        state, _ = step_4(
            state, shard_batch(mesh4, strong), shard_batch(mesh4, weak), None, k
        )
    ckpt = Checkpointer(str(tmp_path))
    ckpt.save(2, jax.device_get(state), wait=True)

    # resume on a 2-device mesh AND on a single device; finish the schedule
    template = jax.device_get(state)
    finals = []
    for n in (2, 1):
        restored = ckpt.restore(2, template=template)
        assert int(np.asarray(restored.step)) == 2
        if n > 1:
            mesh = make_mesh(n)
            st = replicate(mesh, restored)
            step_n = make_train_step(model, opt, mesh=mesh)
            strong, weak = batches[2]
            st, _ = step_n(
                st, shard_batch(mesh, strong), shard_batch(mesh, weak), None, keys[2]
            )
        else:
            st, _ = step_1(restored, *batches[2], None, keys[2])
        finals.append(jax.device_get(st))

    want = jax.tree_util.tree_leaves_with_path(state_ref.params)
    for final in finals:
        got = dict(jax.tree_util.tree_leaves_with_path(final.params))
        for path, leaf in want:
            np.testing.assert_allclose(
                np.asarray(got[path]), np.asarray(leaf), rtol=2e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )
        assert int(np.asarray(final.step)) == 3
