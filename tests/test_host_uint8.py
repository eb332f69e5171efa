"""TPU.HOST_TRANSFER_UINT8: uint8 batch wire format for slow host links.

The knob quantizes emitted train batches to uint8 (<=0.5 LSB vs the float32
wire, 4x fewer host->device bytes); the model casts back to float32 on device
in ``WSRCNN.preprocess``.  Off by default — parity keeps the float32 wire.
"""

import dataclasses

import numpy as np

from unit_tpu.data import StreamLoader, TransformConfig

_KEYS = ("image", "image_size", "gt_boxes", "gt_classes", "gt_valid")


def _fake_image_loader(rec):
    rng = np.random.RandomState(abs(hash(rec["image_id"])) % 2**31)
    return (rng.rand(rec["height"], rec["width"], 3) * 255).astype(np.float32)


def _records(n=8):
    return [{
        "image_id": f"im{i}",
        "file_name": f"/nonexistent/im{i}.png",
        "height": 100,
        "width": 140,
        "annotations": [
            {"bbox": [10.0 + i, 12.0, 60.0 + i, 50.0], "category_id": i % 5}
        ],
    } for i in range(n)]


def _loader(host_uint8: bool, seed=3):
    t = TransformConfig(min_sizes=(64,), max_size=128, canvas=(96, 128),
                        flip=True, max_gt=5, host_uint8=host_uint8)
    return StreamLoader(_records(), t, 2, _KEYS, seed=seed, training=True,
                        image_loader=_fake_image_loader)


def test_uint8_wire_matches_rounded_float_wire():
    b8 = next(iter(_loader(True)))
    bf = next(iter(_loader(False)))
    assert bf["image"].dtype == np.float32
    assert b8["image"].dtype == np.uint8
    np.testing.assert_array_equal(
        b8["image"], np.clip(np.rint(bf["image"]), 0, 255).astype(np.uint8)
    )
    # only the image changes representation
    for k in _KEYS[1:]:
        np.testing.assert_array_equal(b8[k], bf[k])


def test_preprocess_accepts_uint8():
    import jax
    import jax.numpy as jnp

    from unit_tpu.models import ModelConfig, WSRCNN

    mc = ModelConfig(num_classes=3, depth=26)
    model = WSRCNN(mc=mc)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.float32),
    )
    imgs8 = np.random.RandomState(0).randint(0, 256, (1, 64, 64, 3), np.uint8)
    outs8 = model.apply(variables, jnp.asarray(imgs8),
                        method=WSRCNN.preprocess)
    outsf = model.apply(variables, jnp.asarray(imgs8, jnp.float32),
                        method=WSRCNN.preprocess)
    assert outs8.dtype == outsf.dtype
    np.testing.assert_allclose(np.asarray(outs8), np.asarray(outsf), rtol=0,
                               atol=0)


def test_config_threads_through():
    from unit_tpu.config import get_cfg

    cfg = get_cfg()
    assert cfg.TPU.HOST_TRANSFER_UINT8 is False  # parity default
    cfg.TPU.HOST_TRANSFER_UINT8 = True
    t = TransformConfig.train_from_cfg(cfg)
    assert t.host_uint8 is True
    assert dataclasses.asdict(t)["host_uint8"] is True
