"""Checkpointing: orbax save/restore + best-AP50 tracking + torch weight ingestion.

Rebuild of /root/reference/checkpoint/detection_checkpoint.py
(``PeriodicCheckpointerWithEval``: periodic save with max_to_keep, eval-gated best
snapshot carrying {iteration, AP50}, warm-start of the best score on resume) and of
the MSRA-C4 torch-pickle initialization (README.md:18-28) via a d2-name ->
flax-path converter.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _host_snapshot(state: Any) -> Any:
    """Materialize an owned host copy of every leaf, so the caller may keep
    mutating (or donating) its buffers while the background write is in flight.
    Device arrays already copy on the device->host transfer; host numpy arrays
    need an explicit copy (np.asarray aliases them)."""
    return jax.tree.map(
        lambda x: x.copy() if isinstance(x, np.ndarray) else np.asarray(x), state
    )


class Checkpointer:
    """Orbax-backed checkpointer with best-metric tracking.

    Saves are ASYNCHRONOUS: ``save``/``maybe_save_best`` snapshot the state to
    host memory and return while orbax persists in a background thread, so the
    training loop never stalls on disk I/O (the reference's torch.save blocks
    the step; on TPU the device keeps running through the write).  ``wait()``
    joins all in-flight writes; ``restore``/``latest_step`` wait implicitly.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._best_path = os.path.join(self.directory, "best_info.json")
        if _HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
            self._best_ckptr = ocp.StandardCheckpointer()
        self.best_info = self._load_best_info()

    def _load_best_info(self) -> Dict:
        # warm-start best AP from disk (detection_checkpoint.py:13-19)
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return json.load(f)
        return {"AP50": -1.0, "iteration": -1}

    def save(self, step: int, state: Any, wait: bool = False):
        assert _HAS_ORBAX
        self._mgr.save(step, args=ocp.args.StandardSave(_host_snapshot(state)))
        if wait:
            self._mgr.wait_until_finished()

    def wait(self):
        """Join all in-flight background writes (call before process exit)."""
        if _HAS_ORBAX:
            self._mgr.wait_until_finished()
            self._best_ckptr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        assert _HAS_ORBAX
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(jax.tree.map(np.asarray, template))
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        if not _HAS_ORBAX:
            return None
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def maybe_save_best(self, step: int, ap50: float, state: Any) -> bool:
        """Eval-gated best snapshot (detection_checkpoint.py:30-47)."""
        if ap50 <= self.best_info.get("AP50", -1.0):
            return False
        self.best_info = {"AP50": float(ap50), "iteration": int(step)}
        with open(self._best_path, "w") as f:
            json.dump(self.best_info, f)
        if _HAS_ORBAX:
            best_dir = os.path.join(self.directory, "best")
            path = os.path.join(best_dir, "model")
            # join the previous best-save before replacing its directory
            self._best_ckptr.wait_until_finished()
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            self._best_ckptr.save(path, _host_snapshot(state))
        return True


def merge_params_from_orbax(params, path: str):
    """Warm-start ``params`` from an orbax checkpoint directory (e.g. the
    ``best/model`` snapshot a base-training run wrote) — the analogue of the
    reference's fine-tune init from ``best_model_final_weights.pth``
    (configs/VOC/FT/10_shot/...-ft.yaml:3), tolerant of missing/new keys the
    way d2's DetectionCheckpointer is: leaves whose path+shape match are
    copied, everything else (e.g. zero-init ``*_ft`` residuals) keeps its
    fresh initialization.  Returns (params, n_loaded, skipped_paths)."""
    assert _HAS_ORBAX
    restored = ocp.StandardCheckpointer().restore(path)
    src = restored.get("params", restored) if isinstance(restored, dict) else restored
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    loaded = 0
    skipped = []

    def merge(dst, s, prefix=""):
        nonlocal loaded
        for k, v in s.items():
            key = f"{prefix}/{k}" if prefix else k
            if k not in dst:
                skipped.append(key)
                continue
            if isinstance(v, dict):
                merge(dst[k], v, key)
            else:
                v = np.asarray(v)
                if np.shape(dst[k]) == v.shape:
                    dst[k] = v.astype(np.asarray(dst[k]).dtype)
                    loaded += 1
                else:
                    skipped.append(f"{key} (shape {v.shape} vs {np.shape(dst[k])})")

    merge(params, src)
    return params, loaded, skipped


class PeriodicCheckpointerWithEval:
    """Training hook fusing periodic checkpoints with eval-gated best-model saves
    (the reference's fused EvalHook+PeriodicCheckpointer)."""

    def __init__(
        self,
        checkpointer: Checkpointer,
        eval_fn: Optional[Callable[[Any], dict]] = None,
        eval_period: int = 0,
        checkpoint_period: int = 500,
        min_eval_period: int = 0,
    ):
        self.ckpt = checkpointer
        self.eval_fn = eval_fn
        self.eval_period = eval_period
        self.checkpoint_period = checkpoint_period
        self.min_eval_period = min_eval_period
        self.last_eval_results = None

    def __call__(self, step: int, metrics: dict, trainer):
        if self.checkpoint_period and step % self.checkpoint_period == 0:
            self.ckpt.save(step, jax.device_get(trainer.state))
        if (
            self.eval_fn is not None
            and self.eval_period
            and step % self.eval_period == 0
            and step >= self.min_eval_period
        ):
            results = self.eval_fn(trainer.state)
            self.last_eval_results = results
            ap50 = results.get("bbox", {}).get("AP50", None)
            if ap50 is None:
                # multi-dataset shape {dataset: {"bbox": {...}}}: track the first
                # dataset's AP50 (the reference evaluates a single TEST set).
                for sub in results.values():
                    if isinstance(sub, dict) and "bbox" in sub:
                        ap50 = sub["bbox"].get("AP50", None)
                        break
            if ap50 is not None:
                self.ckpt.maybe_save_best(step, ap50, jax.device_get(trainer.state))


# --------------------------------------------------------------------------- #
# Torch checkpoint ingestion (MSRA-C4 pickles / d2 state dicts -> flax params)
# --------------------------------------------------------------------------- #

def _convert_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def d2_resnet_key_to_flax(key: str, depth_blocks) -> Optional[tuple]:
    """Map a Detectron2 ResNet state-dict key to a flax param path in our tree.

    d2 naming: ``stem.conv1.{weight,norm.*}``, ``res{S}.{i}.conv{j}.*``,
    ``res{S}.{i}.shortcut.*``; MSRA-C4 pickles use ``backbone.`` /
    ``roi_heads.res5`` prefixes after d2's own converter.
    """
    key = re.sub(r"^(backbone\.bottom_up\.|backbone\.)", "", key)
    m = re.match(r"stem\.conv1\.(.*)$", key)
    if m:
        return ("backbone", "stem_conv1") + _norm_suffix(m.group(1))
    m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)\.(.*)$", key)
    if m:
        stage, block, conv, rest = m.groups()
        stage_i = int(stage)
        parent = ("box_head", "res5") if stage_i == 5 else ("backbone", f"res{stage}")
        return parent + (f"block{block}", conv) + _norm_suffix(rest)
    m = re.match(r"roi_heads\.res5\.(\d+)\.(conv\d|shortcut)\.(.*)$", key)
    if m:
        block, conv, rest = m.groups()
        return ("box_head", "res5", f"block{block}", conv) + _norm_suffix(rest)
    return None


def _norm_suffix(rest: str) -> tuple:
    table = {
        "weight": ("kernel",),
        "norm.weight": ("bn", "weight"),
        "norm.bias": ("bn", "bias"),
        "norm.running_mean": ("bn", "mean"),
        "norm.running_var": ("bn", "var"),
    }
    return table.get(rest, (rest,))


def load_torch_resnet(params: Dict, state_dict: Dict[str, np.ndarray],
                      load_res5_into: tuple = ("box_head",)) -> Dict:
    """Copy d2/MSRA ResNet weights into our flax param tree (in place on a copy).

    ``conv`` keys map to ``{conv}/kernel`` with OIHW->HWIO transpose; norm stats
    map to the sibling ``{conv}_bn`` FrozenBN params.  The res5 stage is copied
    into every head listed in ``load_res5_into`` ('box_head', 'weak_box_head').
    """
    import copy as copy_lib

    out = copy_lib.deepcopy(jax.tree.map(np.asarray, params))
    loaded, skipped = 0, []
    for key, value in state_dict.items():
        value = np.asarray(value)
        path = d2_resnet_key_to_flax(key, None)
        if path is None:
            skipped.append(key)
            continue
        targets = [path]
        if path[0] == "box_head" and "weak_box_head" in load_res5_into and "weak_box_head" in out:
            targets.append(("weak_box_head",) + path[1:])
        if path[0] == "box_head" and "box_head" not in load_res5_into:
            targets = [t for t in targets if t[0] != "box_head"]
        for tgt in targets:
            node = out
            ok = True
            # translate (…, conv, 'bn', leaf) to the sibling FrozenBN module name
            flat = list(tgt)
            if "bn" in flat:
                i = flat.index("bn")
                flat = flat[: i - 1] + [flat[i - 1] + "_bn"] + flat[i + 1 :]
            for p in flat[:-1]:
                if p not in node:
                    ok = False
                    break
                node = node[p]
            leaf = flat[-1]
            if not ok or leaf not in node:
                skipped.append(key)
                continue
            v = _convert_conv(value) if leaf == "kernel" and value.ndim == 4 else value
            if node[leaf].shape != v.shape:
                skipped.append(f"{key} (shape {v.shape} vs {node[leaf].shape})")
                continue
            node[leaf] = v.astype(node[leaf].dtype)
            loaded += 1
    return out, loaded, skipped


def load_glove_embeddings(params: Dict, npz_path: str) -> Dict:
    """Install the frozen GloVe table (converted from the reference's torch pickle
    data/embeddings/glove_mean, loaded at fast_rcnn.py:327)."""
    import copy as copy_lib

    emb = np.load(npz_path)["embeddings"]
    out = copy_lib.deepcopy(jax.tree.map(np.asarray, params))
    assert out["embeddings"].shape == emb.shape, (out["embeddings"].shape, emb.shape)
    out["embeddings"] = emb.astype(np.float32)
    return out
