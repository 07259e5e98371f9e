"""Data-layer tests: loaders, sanitation, samplers, converters."""

import json
import pathlib

import numpy as np
import pytest

from prpe_tpu.data import synthetic
from prpe_tpu.data.detection import YoloTxtDataset, sanitize_boxes
from prpe_tpu.data.faces import IdentityFolderDataset
from prpe_tpu.data.pipeline import LimitedSampler, default_collate, make_epoch_loader
from prpe_tpu.data.pose import CocoKeypointDataset


def _write_img(path, h=32, w=32, value=128):
    from PIL import Image

    arr = np.full((h, w, 3), value, np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


# --------------------------------------------------------------------------

def test_sanitize_boxes():
    boxes = np.array([
        [0, 0.5, 0.5, 0.2, 0.2],     # fine
        [0, 0.01, 0.5, 0.3, 0.3],    # center clamped inward
        [0, 0.5, 0.5, 0.005, 0.2],   # too thin -> dropped
    ], np.float32)
    out = sanitize_boxes(boxes)
    assert len(out) == 2
    assert out[1, 1] >= out[1, 3] / 2  # center inside after clamp


def test_yolo_txt_dataset(tmp_path):
    root = tmp_path / "det"
    for i in range(3):
        _write_img(root / "images" / "train" / f"{i}.jpg")
    (root / "labels" / "train").mkdir(parents=True)
    (root / "labels" / "train" / "0.txt").write_text("0 0.5 0.5 0.2 0.3\n")
    ds = YoloTxtDataset(str(root), "train", image_size=64, max_gt=4)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["gt_mask"].sum() == 1
    np.testing.assert_allclose(s["gt_boxes"][0], [0.5, 0.5, 0.2, 0.3])
    assert ds[1]["gt_mask"].sum() == 0  # no label file


def test_identity_folder_dataset(tmp_path):
    root = tmp_path / "faces" / "imgs"
    for ident in ("a", "b"):
        for j in range(10):
            _write_img(root / ident / f"{j}.jpg", value=60 if ident == "a" else 200)
    train = IdentityFolderDataset(str(tmp_path / "faces"), "train")
    val = IdentityFolderDataset(str(tmp_path / "faces"), "val")
    assert train.num_classes == 2
    assert len(train) + len(val) == 20 and len(val) == 2
    s = train[0]
    assert s["image"].shape == (112, 112, 3)
    # raw uint8 pixels; mean/std-0.5 normalization is applied on-device
    # (apply_image_norm "half")
    assert s["image"].dtype == np.uint8


def test_coco_keypoint_dataset(tmp_path):
    root = tmp_path / "coco"
    _write_img(root / "images" / "val" / "img1.jpg", h=48, w=64)
    kp = []
    for i in range(17):
        kp += [10.0 + i, 20.0, 2]
    ann = {
        "categories": [{"id": 1, "name": "person"}],
        "images": [{"id": 7, "file_name": "img1.jpg", "width": 64, "height": 48}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 1, "keypoints": kp,
             "num_keypoints": 17, "iscrowd": 0, "area": 400.0,
             "bbox": [8, 15, 30, 20]},
            {"id": 2, "image_id": 7, "category_id": 1, "keypoints": [0] * 51,
             "num_keypoints": 0, "iscrowd": 0, "area": 10.0, "bbox": [0, 0, 5, 5]},
        ],
    }
    ann_path = root / "annotations"
    ann_path.mkdir(parents=True)
    (ann_path / "person_keypoints_val2017.json").write_text(json.dumps(ann))

    ds = CocoKeypointDataset(str(root), "val", image_size=64, max_instances=4)
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["mask"].sum() == 1  # 0-keypoint annotation filtered
    assert s["keypoints"][0, :, 2].max() == 2
    # normalized coords in [0, 1]
    assert 0 <= s["keypoints"][0, :, :2].min() and s["keypoints"][0, :, :2].max() <= 1


def test_limited_sampler_epochs_differ():
    s = LimitedSampler(100, max_samples=10, shard_index=0, shard_count=1)
    a, b = s.indices(0), s.indices(1)
    assert len(a) == 10
    assert not np.array_equal(a, b)


def test_limited_sampler_sharding():
    shards = [
        LimitedSampler(100, max_samples=40, shard_index=i, shard_count=4, shuffle=False)
        for i in range(4)
    ]
    all_idx = np.concatenate([s.indices(0) for s in shards])
    assert len(np.unique(all_idx)) == 40  # disjoint cover


def test_make_epoch_loader_batches(tmp_path):
    root = tmp_path / "det"
    for i in range(5):
        _write_img(root / "images" / "train" / f"{i}.jpg")
    (root / "labels" / "train").mkdir(parents=True)
    ds = YoloTxtDataset(str(root), "train", image_size=32, max_gt=2)
    loader = make_epoch_loader(ds, batch_size=2, prefetch=0)
    batches = list(loader(0))
    assert len(batches) == 2  # drop_last
    assert batches[0]["image"].shape == (2, 32, 32, 3)


def test_device_resident_loader_replays_staged_epoch():
    """--device-resident semantics (cli/train.py): one staging pass, then
    every epoch replays the SAME device-resident batches (reshuffled order),
    with size/steps bookkeeping for the HBM budget check."""
    from prpe_tpu.data.pipeline import device_resident_loader

    calls = []

    def loader(epoch):
        calls.append(epoch)
        return ({"x": np.full((2, 4), i, np.uint8)} for i in range(5))

    loader.steps_per_epoch = 5
    closed = []
    loader.close = lambda: closed.append(True)

    dr = device_resident_loader(loader, seed=3, name="")
    assert calls == [0] and closed == [True]  # staged once, source closed
    assert dr.total_bytes == 5 * 2 * 4
    assert dr.steps_per_epoch == 5

    e0 = [int(np.asarray(b["x"])[0, 0]) for b in dr(0)]
    assert e0 == [0, 1, 2, 3, 4]  # epoch 0 = staged order
    e1 = [int(np.asarray(b["x"])[0, 0]) for b in dr(1)]
    assert sorted(e1) == e0 and e1 != e0  # same data, new order
    # deterministic per epoch
    assert [int(np.asarray(b["x"])[0, 0]) for b in dr(1)] == e1
    assert calls == [0]  # never re-fetches from the source


def test_device_resident_refresh_swaps_fresh_epochs():
    """--device-resident-refresh semantics: a background thread produces
    FRESH host epochs; each replay epoch stages the next generation between
    yields and swaps it in for the following epoch (one-epoch staging lag),
    falling back to frozen replay when the producer lags."""
    import time

    from prpe_tpu.data.pipeline import device_resident_loader

    def loader(epoch):
        # epoch-dependent content so generations are distinguishable
        return ({"x": np.full((2, 4), 10 * epoch + i, np.uint8)}
                for i in range(4))

    loader.steps_per_epoch = 4

    dr = device_resident_loader(loader, seed=3, name="", refresh=True)
    assert dr.total_bytes == 2 * 4 * 2 * 4  # 2x: double-buffer budget

    def drain(epoch):
        return sorted(int(np.asarray(b["x"])[0, 0]) for b in dr(epoch))

    assert drain(0) == [0, 1, 2, 3]          # epoch 0 = staged gen-0
    # give the producer time to finish host epoch 1, then epoch 1 stages it
    # while (re)playing gen-0; epoch 2 trains on the fresh gen-1 batches
    deadline = time.time() + 10
    while dr.stats["fresh_epochs"] < 2 and time.time() < deadline:
        got1 = drain(1)
        if dr.stats["fresh_epochs"] >= 2:
            assert got1 == [0, 1, 2, 3]      # stale gen while staging
    assert dr.stats["fresh_epochs"] >= 2, "producer never delivered epoch 1"
    assert drain(2) == [10, 11, 12, 13]      # fresh augmentations arrived
    dr.close()


def test_prefetch_propagates_producer_error():
    """A data error mid-epoch must raise in the consumer, not silently end
    the epoch (round-1 advisor finding on prefetch_to_device)."""
    from prpe_tpu.data.pipeline import prefetch_to_device

    def gen():
        yield {"x": np.zeros((2, 4), np.float32)}
        raise ValueError("corrupt record")

    got = []
    with pytest.raises(ValueError, match="corrupt record"):
        for b in prefetch_to_device(gen(), size=2):
            got.append(b)
    assert len(got) == 1  # the good batch before the error still arrives


def test_prefetch_happy_path_yields_all():
    from prpe_tpu.data.pipeline import prefetch_to_device

    it = ({"x": np.full((3,), i, np.float32)} for i in range(4))
    out = list(prefetch_to_device(it, size=2))
    assert len(out) == 4
    assert float(np.asarray(out[2]["x"])[0]) == 2.0


def test_convert_coco_roundtrip(tmp_path):
    from prpe_tpu.cli.convert_coco import convert

    ann = {
        "categories": [{"id": 1, "name": "person"}, {"id": 2, "name": "dog"}],
        "images": [{"id": 1, "file_name": "x.jpg", "width": 100, "height": 200}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 20, 30, 40], "iscrowd": 0},
            {"image_id": 1, "category_id": 2, "bbox": [0, 0, 10, 10], "iscrowd": 0},
        ],
    }
    f = tmp_path / "ann.json"
    f.write_text(json.dumps(ann))
    out = tmp_path / "labels"
    convert(f, out, "person")
    rows = (out / "x.txt").read_text().strip().splitlines()
    assert len(rows) == 1
    vals = [float(v) for v in rows[0].split()]
    np.testing.assert_allclose(vals, [0, 0.25, 0.2, 0.3, 0.2], atol=1e-5)


def test_ms1m_recordio_roundtrip(tmp_path):
    """Write a record in the documented MXNet RecordIO format, read it back."""
    import struct

    from prpe_tpu.cli.convert_ms1m import convert_rec
    from PIL import Image
    import io

    buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, format="JPEG")
    jpeg = buf.getvalue()

    def record(label, payload):
        header = struct.pack("<If", 0, label) + struct.pack("<QQ", 0, 0)
        data = header + payload
        out = struct.pack("<II", 0xCED7230A, len(data)) + data
        return out + b"\x00" * ((4 - len(data) % 4) % 4)

    rec = tmp_path / "train.rec"
    rec.write_bytes(record(3.0, jpeg) + record(3.0, jpeg) + record(5.0, jpeg))
    out = tmp_path / "imgs"
    convert_rec(rec, out)
    assert sorted(p.name for p in out.iterdir()) == ["3", "5"]
    assert len(list((out / "3").iterdir())) == 2


def test_synthetic_schemas():
    rng = np.random.default_rng(0)
    d = synthetic.detection_batch(rng, 2, 64, 4)
    assert d["gt_boxes"].shape == (2, 4, 4) and d["gt_mask"].any()
    f = synthetic.face_batch(rng, 3, 64, 8)
    assert f["label"].shape == (3,)
    p = synthetic.pose_batch(rng, 2, 64, 3)
    assert p["keypoints"].shape == (2, 3, 17, 3) and p["mask"].any()


# --------------------------------------------------------------------------
# YoloMosaicDataset pipeline order (reference: yolopt/dataset.py:28-78 —
# mosaic/affine [+ mixup] OR resize+affine, then albumentations visuals,
# then ONE augment_hsv on the composed image, then flips)
# --------------------------------------------------------------------------

def _make_disk_dataset(tmp_path, n=6, size=64):
    from PIL import Image as PILImage

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images" / "train"
    lab_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    for i in range(n):
        img = (rng.uniform(0, 1, (size, size, 3)) * 255).astype(np.uint8)
        PILImage.fromarray(img).save(img_dir / f"{i}.png")
        (lab_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    from prpe_tpu.data.detection import YoloTxtDataset

    return YoloTxtDataset(str(tmp_path), "train", size, max_gt=8)


def test_mosaic_dataset_hsv_applied_once_post_composition(tmp_path, monkeypatch):
    from prpe_tpu.data import augment
    from prpe_tpu.data.detection import YoloMosaicDataset

    base = _make_disk_dataset(tmp_path)
    calls = {"hsv": 0, "affine": 0}
    real_hsv, real_affine = augment.hsv_augment, augment.random_perspective
    monkeypatch.setattr(augment, "hsv_augment",
                        lambda img, rng: (calls.__setitem__("hsv", calls["hsv"] + 1),
                                          real_hsv(img, rng))[1])
    monkeypatch.setattr(augment, "random_perspective",
                        lambda *a, **k: (calls.__setitem__("affine", calls["affine"] + 1),
                                         real_affine(*a, **k))[1])

    # mosaic always on, mixup always on: two mosaic composites, ONE hsv
    ds = YoloMosaicDataset(base, mosaic_prob=1.0, mixup_prob=1.0, seed=3)
    sample = ds[0]
    assert calls["hsv"] == 1
    assert calls["affine"] == 2  # one per mosaic composite
    assert sample["image"].shape == (64, 64, 3)
    assert sample["gt_boxes"].min() >= 0.0 and sample["gt_boxes"].max() <= 1.0

    # non-mosaic branch: affine still runs (reference dataset.py:44-55)
    calls["hsv"] = calls["affine"] = 0
    ds = YoloMosaicDataset(base, mosaic_prob=0.0, mixup_prob=0.0, seed=3)
    ds[0]
    assert calls["hsv"] == 1
    assert calls["affine"] == 1
