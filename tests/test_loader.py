"""Multiprocess loader + packed raw-format tests.

Covers the parallel host input pipeline (data/loader.py — the reference's
DataLoader(num_workers=N) equivalent, training/yolopt/main.py:48-49) and the
packed zero-decode format (data/packed.py).
"""

import numpy as np
import pytest

from prpe_tpu.data.loader import BatchSpec, MultiprocessLoader
from prpe_tpu.data.packed import PackedDataset, apply_image_norm, pack_dataset
from prpe_tpu.data.pipeline import default_collate, make_epoch_loader


class ArithmeticDataset:
    """Deterministic fixed-shape samples derived from the index."""

    def __init__(self, n=64, hw=8):
        self.n = n
        self.hw = hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "image": rng.standard_normal((self.hw, self.hw, 3)).astype(np.float32),
            "label": np.int32(i),
        }


class ExplodingDataset(ArithmeticDataset):
    def __getitem__(self, i):
        if i == 13:
            raise ValueError("boom on 13")
        return super().__getitem__(i)


def _reference_batches(ds, indices, bs):
    return [
        default_collate([ds[int(j)] for j in indices[k * bs : (k + 1) * bs]])
        for k in range(len(indices) // bs)
    ]


def test_batchspec_roundtrip():
    ds = ArithmeticDataset()
    batch = default_collate([ds[0], ds[1]])
    spec = BatchSpec(batch)
    buf = memoryview(bytearray(spec.nbytes))
    spec.write(buf, batch)
    out = spec.views(buf)
    for k in batch:
        np.testing.assert_array_equal(out[k], batch[k])


def test_multiprocess_matches_inline_order():
    ds = ArithmeticDataset(n=40)
    idx = np.arange(40)
    want = _reference_batches(ds, idx, 4)
    with MultiprocessLoader(ds, default_collate, 4, num_workers=3) as pool:
        got = [{k: v.copy() for k, v in b.items()} for b in pool.run(idx)]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["label"], w["label"])
        np.testing.assert_allclose(g["image"], w["image"])


def test_multiprocess_multiple_epochs_and_shuffle_order():
    ds = ArithmeticDataset(n=24)
    with MultiprocessLoader(ds, default_collate, 4, num_workers=2) as pool:
        for epoch in range(3):
            rng = np.random.default_rng(epoch)
            idx = rng.permutation(24)
            labels = np.concatenate([b["label"].copy() for b in pool.run(idx)])
            np.testing.assert_array_equal(labels, idx)


def test_multiprocess_worker_error_propagates():
    ds = ExplodingDataset(n=32)
    with MultiprocessLoader(ds, default_collate, 4, num_workers=2) as pool:
        with pytest.raises(RuntimeError, match="boom on 13"):
            for _ in pool.run(np.arange(32)):
                pass
        # pool survives a batch failure: all slots must be back
        labels = np.concatenate(
            [b["label"].copy() for b in pool.run(np.arange(8))]
        )
        np.testing.assert_array_equal(labels, np.arange(8))


def test_multiprocess_early_close_recycles_slots():
    ds = ArithmeticDataset(n=64)
    with MultiprocessLoader(ds, default_collate, 4, num_workers=2) as pool:
        it = pool.run(np.arange(64))
        next(it)
        it.close()  # abandon the epoch mid-way
        got = sum(1 for _ in pool.run(np.arange(16)))
        assert got == 4


def test_make_epoch_loader_num_workers_parity():
    ds = ArithmeticDataset(n=32)
    inline = make_epoch_loader(ds, 4, shuffle=True, seed=7, prefetch=0)
    pooled = make_epoch_loader(ds, 4, shuffle=True, seed=7, prefetch=0,
                               num_workers=2)
    try:
        for epoch in (0, 1):
            for a, b in zip(inline(epoch), pooled(epoch)):
                np.testing.assert_array_equal(a["label"], np.asarray(b["label"]))
    finally:
        pooled.close()


def test_packed_roundtrip(tmp_path):
    ds = ArithmeticDataset(n=10)

    class UnitImageDS(ArithmeticDataset):
        def __getitem__(self, i):
            s = ArithmeticDataset.__getitem__(self, i)
            # simulate a /255-normalized pipeline output in [0,1]
            rng = np.random.default_rng(100 + i)
            s["image"] = rng.random((self.hw, self.hw, 3)).astype(np.float32)
            return s

    src = UnitImageDS(n=10)
    packed = pack_dataset(src, tmp_path / "p", image_norm="unit")
    assert len(packed) == 10
    s0, p0 = src[3], packed[3]
    assert p0["image"].dtype == np.uint8
    # uint8 quantization: within half a step of the source
    np.testing.assert_allclose(
        p0["image"].astype(np.float32) / 255.0, s0["image"], atol=0.5 / 255 + 1e-6
    )
    np.testing.assert_array_equal(p0["label"], s0["label"])

    batch = next(iter(packed.batches(np.arange(10), 4)))
    assert batch["image"].shape == (4, src.hw, src.hw, 3)
    assert batch["label"].tolist() == [0, 1, 2, 3]


def test_packed_gather_pool_contract(tmp_path):
    """gather() returns pooled buffers: values match __getitem__, the
    previous batch stays intact while the next is produced (two-buffer
    rotation), and the third call reuses the first call's storage."""
    src = ArithmeticDataset(n=12)
    packed = pack_dataset(src, tmp_path / "p", image_norm=None)
    b1 = packed.gather(np.arange(0, 4))
    b1_label_buf = b1["label"]
    for row, i in enumerate(range(0, 4)):
        np.testing.assert_allclose(b1["image"][row], src[i]["image"])
    b2 = packed.gather(np.arange(4, 8))
    # b1 is still valid after producing b2
    np.testing.assert_array_equal(b1["label"], np.arange(0, 4))
    np.testing.assert_array_equal(b2["label"], np.arange(4, 8))
    b3 = packed.gather(np.arange(8, 12))
    assert b3["label"] is b1_label_buf  # documented pool-of-two reuse
    np.testing.assert_array_equal(b3["label"], np.arange(8, 12))


@pytest.mark.parametrize("norm", ["unit", "half", "imagenet"])
def test_apply_image_norm_inverts_quantize(norm):
    import jax.numpy as jnp

    from prpe_tpu.data.packed import _quantize_image

    rng = np.random.default_rng(0)
    x01 = rng.random((6, 6, 3)).astype(np.float32)  # raw pixels in [0,1]
    if norm == "unit":
        normalized = x01
    elif norm == "half":
        normalized = (x01 - 0.5) / 0.5
    else:
        from prpe_tpu.data.packed import _IMAGENET_MEAN, _IMAGENET_STD

        normalized = (x01 - _IMAGENET_MEAN) / _IMAGENET_STD
    q = _quantize_image(normalized, norm)
    back = apply_image_norm(jnp.asarray(q), norm)
    np.testing.assert_allclose(np.asarray(back), normalized, atol=0.01)
    # float input is a no-op passthrough
    f = jnp.asarray(normalized)
    assert apply_image_norm(f, norm) is f


def test_apply_image_norm_in_train_step_smoke():
    """A uint8 detection batch runs through the real loss_fn unchanged in
    value vs the f32 batch (to quantization tolerance)."""
    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.config import (
        AdaFaceConfig, CombinedModelConfig, DetectionConfig, PoseConfig,
    )
    from prpe_tpu.data import synthetic
    from prpe_tpu.models.combined import CombinedModel
    from prpe_tpu.train.steps import make_loss_fn

    cfg = CombinedModelConfig(
        image_size=64,
        backbone_stages=(1, 1, 1, 1),
        detection=DetectionConfig(adapter_size=(32, 32), max_gt=4),
        face=AdaFaceConfig(arch="ir_18", num_classes=8),
        pose=PoseConfig(input_size=(32, 32), heatmap_size=(8, 8),
                        vit_hidden=32, vit_layers=1, vit_heads=2),
    )
    model = CombinedModel(config=cfg)
    rng = np.random.default_rng(0)
    batch = synthetic.detection_batch(rng, 2, 64, 4)
    variables = jax.jit(
        lambda k, x: model.init(k, x, jnp.zeros((2,), jnp.int32),
                                method="init_all")
    )(jax.random.key(0), jnp.asarray(batch["image"]))

    loss_fn = make_loss_fn(model, "person_detection", cfg)
    key = jax.random.key(1)
    loss_f32, _ = loss_fn(variables["params"], variables["batch_stats"],
                          {**batch, "image": jnp.asarray(batch["image"])},
                          key, False)
    u8 = np.clip(np.rint(batch["image"] * 255.0), 0, 255).astype(np.uint8)
    loss_u8, _ = loss_fn(variables["params"], variables["batch_stats"],
                         {**batch, "image": jnp.asarray(u8)}, key, False)
    np.testing.assert_allclose(float(loss_u8), float(loss_f32), rtol=0.05)
