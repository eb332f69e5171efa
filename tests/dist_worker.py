"""Worker for the real 2-process jax.distributed test (launched by
tests/test_distributed_2proc.py, NOT collected by pytest).

Runs the production multi-process path end-to-end on the CPU backend with
Gloo cross-process collectives: ``jax.distributed.initialize`` (the runner's
``--dist`` flag, runner.py), host-sharded loaders (loader._host_shard +
_per_host_batch), the sharded train step over the GLOBAL 4-device mesh
(mesh.shard_batch -> make_array_from_process_local_data), and the
``gather_objects``-merged evaluator inside ``inference_on_dataset`` —
the TPU-native replacement for the reference's NCCL DDP + comm.gather
(/root/reference/data/evaluators.py:159-166).

usage: python dist_worker.py <pid> <nprocs> <voc_root> <out_json> <port>
"""

import hashlib
import json
import os
import sys


def det_image_loader(rec):
    """Deterministic across processes (str hash() is per-process salted)."""
    import numpy as np

    seed = int(hashlib.md5(str(rec["image_id"]).encode()).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    return rng.rand(rec["height"], rec["width"], 3).astype(np.float32) * 255


def main():
    pid, nprocs, voc_root, out_json, port = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs, process_id=pid,
        )
    assert jax.process_count() == nprocs
    n_global = len(jax.devices())

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.dirname(__file__))
    from test_engine_integration import _tiny_cfg

    from unit_tpu.data import DatasetCatalog, RegisterVOC
    from unit_tpu.data.loader import build_strong_loader, build_classifier_loader
    from unit_tpu.data.loader import build_test_loader
    from unit_tpu.engine import runner, make_predict_fn
    from unit_tpu.parallel import make_mesh

    DatasetCatalog.clear()
    cfg = _tiny_cfg(voc_root)
    cfg.SOLVER.IMS_PER_BATCH = 4  # GLOBAL batch: 2 per host, 1 per device
    RegisterVOC(cfg, voc_root).register_all()

    # make the strong stream mixed-orientation: exercises the host-synchronized
    # aspect-ratio schedule (loader._iter_synced) for real — without it, hosts
    # emit different-shaped batches in the same step and the collectives hang
    # pattern PPLLPPLL...: _host_shard strides by process id, so BOTH hosts'
    # shards keep both orientations (recs[::2] would give host 0 all-portrait,
    # host 1 all-landscape — unsatisfiable schedule by design)
    for name in cfg.DATASETS.TRAIN:
        recs = DatasetCatalog.get(name)  # cached: mutation sticks
        for i, r in enumerate(recs):
            if (i // 2) % 2 == 0:
                r["height"], r["width"] = r["width"], r["height"]

    import unit_tpu.data.transforms as T

    T.load_image_bgr = lambda path: None

    model, optimizer, trainer, mesh = runner.build_everything(
        cfg, num_devices=n_global, seed=0
    )
    assert mesh is not None and mesh.devices.size == n_global
    trainer.strong_iter = iter(
        build_strong_loader(cfg, image_loader=det_image_loader)
    )
    trainer.weak_iter = iter(
        build_classifier_loader(cfg, image_loader=det_image_loader)
    )
    # per-host loader batches must be IMS_PER_BATCH / nprocs
    strong_local = next(iter(build_strong_loader(cfg, image_loader=det_image_loader)))
    assert strong_local["image"].shape[0] == 4 // nprocs

    trainer.init_state(sample_shape=(1, 64, 64, 3))
    # snapshot the (seed-deterministic) init params: eval below uses these so
    # the merged result is comparable against a single-process run whose
    # training batches differ in composition
    params0 = jax.device_get(trainer.state.params)
    m1 = trainer.run_step()
    m2 = trainer.run_step()

    # ---- eval: host-sharded records, per-host single-device inference,
    # gather_objects-merged evaluator (the production multi-host eval path)
    from unit_tpu.data.utils import get_evaluator
    from unit_tpu.evaluation import inference_on_dataset

    from unit_tpu.data.loader import _host_shard

    name = cfg.DATASETS.TEST[0]
    evaluator = get_evaluator(cfg, name)
    # GT fed per host shard — the cross-host merge reassembles the full set
    for rec in _host_shard(DatasetCatalog.get(name)):
        evaluator.process_gt_record(rec)
    loader, n = build_test_loader(cfg, name, image_loader=det_image_loader)
    predict = make_predict_fn(model)
    results = inference_on_dataset(
        lambda im, sz: predict(params0, im, sz), loader, evaluator, n
    )

    with open(out_json, "w") as f:
        json.dump({
            "pid": pid,
            "process_count": jax.process_count(),
            "n_global_devices": n_global,
            "metrics1": {k: float(v) for k, v in m1.items()},
            "metrics2": {k: float(v) for k, v in m2.items()},
            "eval": {
                k: float(v) for k, v in results["bbox"].items()
                if isinstance(v, (int, float, np.floating))
            },
            "n_local_test_records": int(
                len(DatasetCatalog.get(name)[pid::nprocs]) if nprocs > 1
                else len(DatasetCatalog.get(name))
            ),
        }, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
