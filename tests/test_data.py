import pytest
import numpy as np
import jax
import jax.numpy as jnp

from tpudet.config import tiny_test_config
from tpudet.data import SyntheticDataset, DataLoader, build_dataset
from tpudet.data.preprocess import prepare_example, device_preprocess, resize_scale


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(num_classes=3, num_examples=10)
    a = ds.get_example(3)
    b = ds.get_example(3)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["boxes"], b["boxes"])
    assert a["image"].dtype == np.uint8
    assert (a["classes"] >= 1).all() and (a["classes"] <= 3).all()
    assert (a["boxes"][:, 2:] > a["boxes"][:, :2]).all()


def test_resize_scale():
    assert resize_scale(600, 800, 600, 1000) == 1.0
    # min side 300 -> x2, max side 400 -> 800 <= 1000: scale 2
    assert resize_scale(300, 400, 600, 1000) == 2.0
    # max-side cap: 300x2000, min-side rule would give x2 -> 4000 > 1000
    assert resize_scale(300, 2000, 600, 1000) == 0.5


def test_prepare_example_scales_boxes():
    cfg = tiny_test_config().data  # canvas 128, min/max 128
    image = np.zeros((64, 32, 3), np.uint8)
    boxes = np.asarray([[8.0, 16.0, 24.0, 48.0]], np.float32)
    out = prepare_example(cfg, image, boxes, np.asarray([1], np.int32))
    assert out["image"].shape == (128, 128, 3)
    # min side 32 -> 128: scale 4; 64 -> 256 capped at canvas/max 128 -> scale 2.
    nh, nw = out["image_hw"]
    assert (nh, nw) == (128, 64)
    np.testing.assert_allclose(out["gt_boxes"][0], [16.0, 32.0, 48.0, 96.0])
    assert out["gt_valid"][0] and not out["gt_valid"][1]


def test_loader_batches():
    cfg = tiny_test_config()
    ds = SyntheticDataset(num_classes=3, num_examples=10)
    loader = DataLoader(cfg, ds, batch_size=4, num_workers=2, seed=0)
    batches = list(loader.batches(epoch=0))
    assert len(batches) == 2  # drop_last
    b = batches[0]
    assert b["image"].shape == (4, 128, 128, 3)
    assert b["gt_boxes"].shape == (4, cfg.data.max_gt_boxes, 4)
    assert b["gt_valid"].any()
    # Different epochs shuffle differently.
    b2 = next(iter(loader.batches(epoch=1)))
    assert not np.array_equal(b["image"], b2["image"])


def test_device_preprocess_normalizes():
    cfg = tiny_test_config()
    batch = {
        "image": jnp.full((1, 128, 128, 3), 128, jnp.uint8),
        "image_hw": jnp.asarray([[128.0, 128.0]]),
    }
    out = device_preprocess(cfg, batch)
    img = np.asarray(out["image"])
    want = (128.0 - np.asarray(cfg.data.pixel_mean)) / np.asarray(cfg.data.pixel_std)
    np.testing.assert_allclose(img[0, 0, 0], want, rtol=1e-5)


def test_device_preprocess_flip_consistency():
    """Flipped image content must still sit under the flipped boxes."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 128, 128, 3)).astype(np.uint8)
    # Mark a recognizable patch.
    img[0, 20:40, 10:30] = 255
    batch = {
        "image": jnp.asarray(img),
        "image_hw": jnp.asarray([[100.0, 80.0]]),  # valid region smaller
        "gt_boxes": jnp.asarray([[[10.0, 20.0, 30.0, 40.0]]]),
        "gt_classes": jnp.asarray([[1]], jnp.int32),
        "gt_valid": jnp.asarray([[True]]),
    }
    # Find a key that flips (bernoulli 0.5).
    for seed in range(20):
        out = device_preprocess(cfg, batch, jax.random.key(seed), training=True)
        fb = np.asarray(out["gt_boxes"][0, 0])
        if fb[0] != 10.0:
            break
    else:
        raise AssertionError("no flip in 20 keys")
    # Box flipped around valid width 80: x1 = 80-30 = 50, x2 = 80-10 = 70.
    np.testing.assert_allclose(fb, [50.0, 20.0, 70.0, 40.0])
    # The bright patch moved under the flipped box.
    mean = np.asarray(cfg.data.pixel_mean)
    std = np.asarray(cfg.data.pixel_std)
    raw = np.asarray(out["image"][0]) * std + mean
    patch = raw[20:40, 50:70]
    assert patch.mean() > 250


def test_build_dataset_synthetic():
    cfg = tiny_test_config()
    ds = build_dataset(cfg, split="train")
    assert len(ds) == 512


class _MixedOrientationDataset:
    """Tiny dataset with both orientations for bucketing tests."""

    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def example_hw(self, i):
        return (40, 60) if i % 3 else (60, 40)  # landscape unless i % 3 == 0

    def get_example(self, i):
        h, w = self.example_hw(i)
        return {
            "image": np.full((h, w, 3), i, np.uint8),
            "boxes": np.asarray([[2.0, 2.0, 10.0, 10.0]], np.float32),
            "classes": np.asarray([1], np.int32),
        }


def test_canvas_for_hw_orientation_buckets():
    from dataclasses import replace
    from tpudet.data.preprocess import canvas_for_hw

    d = tiny_test_config().data
    assert canvas_for_hw(d, 375, 500) == (d.canvas_height, d.canvas_width)
    d = replace(d, orientation_buckets=True, canvas_short=48,
                canvas_height=64, canvas_width=64)
    assert canvas_for_hw(d, 375, 500) == (48, 64)   # landscape
    assert canvas_for_hw(d, 500, 375) == (64, 48)   # portrait
    assert canvas_for_hw(d, 500, 500) == (48, 64)   # square -> landscape


def test_loader_orientation_buckets():
    from dataclasses import replace

    cfg = tiny_test_config()
    cfg = cfg.replace(data=replace(
        cfg.data, orientation_buckets=True, canvas_short=48,
        canvas_height=64, canvas_width=64, min_size=32, max_size=48,
    ))
    ds = _MixedOrientationDataset(10)  # 7 landscape (i%3!=0), 3 portrait
    loader = DataLoader(cfg, ds, batch_size=2, shuffle=True, num_workers=2,
                        drop_last=False)
    seen = 0
    shapes = set()
    for batch in loader.batches(0):
        img = batch["image"]
        shapes.add(img.shape[1:3])
        # homogeneous orientation within every batch
        assert img.shape[1:3] in {(48, 64), (64, 48)}
        seen += int(batch.get("batch_valid", np.ones(2, bool)).sum())
    assert seen == 10
    assert shapes == {(48, 64), (64, 48)}
    assert len(loader) == sum(1 for _ in loader.batches(0))


def test_loader_orientation_buckets_requires_hw():
    from dataclasses import replace
    import pytest as _pytest

    cfg = tiny_test_config()
    cfg = cfg.replace(data=replace(cfg.data, orientation_buckets=True))

    class NoHW:
        def __len__(self):
            return 4

        def get_example(self, i):
            raise AssertionError("unused")

    # The zero-plan construction guard touches the epoch plan, so the
    # missing-example_hw error now surfaces at construction (fail fast).
    with _pytest.raises(ValueError, match="example_hw"):
        DataLoader(cfg, NoHW(), batch_size=2)


def test_loader_bucketing_zero_plan_raises():
    """Bucketing + drop_last where no bucket fills one global batch must
    fail at construction, not hang device_stream on an empty epoch plan."""
    from dataclasses import replace
    import pytest as _pytest

    cfg = tiny_test_config()
    cfg = cfg.replace(data=replace(
        cfg.data, orientation_buckets=True, canvas_short=48,
        canvas_height=64, canvas_width=64, min_size=32, max_size=48,
    ))
    ds = _MixedOrientationDataset(10)  # buckets of 6 and 4, both < 8
    with _pytest.raises(ValueError, match="zero batches"):
        DataLoader(cfg, ds, batch_size=8, drop_last=True)
    # drop_last=False keeps the padded remainders and stays constructible.
    loader = DataLoader(cfg, ds, batch_size=8, drop_last=False)
    assert len(loader) == 2


def test_bucket_for_hw_aspect_buckets():
    from dataclasses import replace
    from tpudet.data.preprocess import bucket_for_hw, canvas_for_hw

    buckets = ((640, 640), (640, 832), (640, 1024), (832, 640), (1024, 640))
    d = replace(tiny_test_config().data, min_size=600, max_size=1000,
                aspect_buckets=buckets)
    # 512x512 -> resized 600x600 -> square bucket.
    assert bucket_for_hw(d, 512, 512) == 0
    # 375x500 (VOC 4:3) -> 600x800 -> (640, 832).
    assert bucket_for_hw(d, 375, 500) == 1
    # 400x1000 wide -> 600x1500 capped by max_size to 400x1000 -> (640, 1024).
    assert bucket_for_hw(d, 400, 1000) == 2
    # portrait 4:3 mirrors.
    assert bucket_for_hw(d, 500, 375) == 3
    assert canvas_for_hw(d, 500, 375) == (832, 640)


def test_loader_aspect_buckets_grouping_and_fill():
    from dataclasses import replace

    cfg = tiny_test_config()
    buckets = ((48, 48), (48, 64), (64, 48))
    cfg = cfg.replace(data=replace(
        cfg.data, aspect_buckets=buckets, min_size=40, max_size=64,
    ))
    ds = _MixedOrientationDataset(12)
    loader = DataLoader(cfg, ds, batch_size=2, shuffle=True, num_workers=2,
                        drop_last=False)
    seen = 0
    shapes = set()
    for batch in loader.batches(0):
        img = batch["image"]
        assert img.shape[1:3] in set(buckets)
        shapes.add(img.shape[1:3])
        # Every image in the batch resized onto this batch's canvas: the
        # valid region must fit.
        hw = batch["image_hw"]
        assert (hw[:, 0] <= img.shape[1]).all()
        assert (hw[:, 1] <= img.shape[2]).all()
        seen += int(batch.get("batch_valid", np.ones(2, bool)).sum())
    assert seen == 12
    assert len(shapes) >= 2
    assert len(loader) == sum(1 for _ in loader.batches(0))


def test_loader_process_sharding_partitions_dataset():
    """Multi-host input sharding: batch_size is GLOBAL; every process reads
    a disjoint equal-size slice (same number of batches everywhere) and the
    union of the slices covers min(n - n % count, all) examples exactly
    once."""
    from tpudet.parallel import batch_sharding, make_mesh

    cfg = tiny_test_config()
    ds = SyntheticDataset(num_classes=3, num_examples=13, image_size=64)
    sharding = batch_sharding(make_mesh(num_data=2, num_model=1))
    seen, lens = [], []
    for p in range(3):
        loader = DataLoader(cfg, ds, batch_size=6, shuffle=True, seed=7,
                            num_workers=1, process_index=p, process_count=3,
                            sharding=sharding)
        assert loader.batch_size == 2  # per-process rows
        assert loader.global_batch_size == 6
        idxs = [i for idx, _ in loader._epoch_batch_indices(0) for i in idx]
        seen.append(set(int(i) for i in idxs))
        lens.append(len(loader))
    # Equal batch counts on every process (lockstep safety).
    assert lens[0] == lens[1] == lens[2] == 2
    union = seen[0] | seen[1] | seen[2]
    assert len(union) == 12  # 13 -> common length 4 per process
    assert not (seen[0] & seen[1]) and not (seen[1] & seen[2])
    assert not (seen[0] & seen[2])


def test_loader_process_sharding_guards():
    import pytest as _pytest
    from dataclasses import replace

    from tpudet.parallel import batch_sharding, make_mesh

    cfg = tiny_test_config()
    ds = SyntheticDataset(num_classes=3, num_examples=12, image_size=64)
    sharding = batch_sharding(make_mesh(num_data=2, num_model=1))
    with _pytest.raises(ValueError, match="divisible"):
        DataLoader(cfg, ds, batch_size=5, process_index=0, process_count=2,
                   sharding=sharding)
    with _pytest.raises(ValueError, match="sharding"):
        DataLoader(cfg, ds, batch_size=4, process_index=0, process_count=2)


def test_loader_bucketing_multi_host_deterministic_plan():
    """Canvas bucketing composes with multi-host input sharding (VERDICT r1
    item 7): the bucket/batch plan is computed on the GLOBAL epoch order
    identically on every process and each process takes strided rows of
    every global batch — so all processes see the same batch count and the
    same canvas sequence (lockstep at collectives), rows are disjoint, and
    the union covers each bucket's full batches exactly once."""
    from dataclasses import replace

    from tpudet.parallel import batch_sharding, make_mesh

    cfg = tiny_test_config()
    cfg = cfg.replace(data=replace(
        cfg.data, aspect_buckets=((64, 64), (64, 96)),
        min_size=64, max_size=96))
    # Mixed aspect dataset so both buckets are exercised.
    ds = SyntheticDataset(num_classes=3, num_examples=21, image_size=64)

    class MixedHW:
        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def get_example(self, i):
            ex = self.base.get_example(i)
            if i % 3 == 0:  # every third image is wide -> second bucket
                img = ex["image"]
                ex = dict(ex, image=np.concatenate([img, img[:, :32]], 1))
            return ex

        def example_hw(self, i):
            return (64, 96) if i % 3 == 0 else (64, 64)

    mixed = MixedHW(ds)
    sharding = batch_sharding(make_mesh(num_data=2, num_model=1))
    plans, canvases, rows = [], [], []
    for p in range(2):
        loader = DataLoader(cfg, mixed, batch_size=4, shuffle=True, seed=3,
                            num_workers=1, process_index=p, process_count=2,
                            sharding=sharding)
        plan = loader._epoch_batch_indices(0)
        plans.append(plan)
        canvases.append([
            tuple(loader.dataset.example_hw(int(idx[0]))) for idx, _ in plan
        ])
        rows.append([set(int(i) for i in idx) for idx, _ in plan])
        for batch in loader.batches(0):
            assert batch["image"].shape[0] == 2  # per-process rows
    # Identical batch counts and canvas sequences across processes.
    assert len(plans[0]) == len(plans[1]) > 1
    assert canvases[0] == canvases[1]
    assert len(set(canvases[0])) == 2  # both buckets present
    # Per-batch rows are disjoint across processes; union covers the
    # bucket's full batches.
    all0, all1 = set(), set()
    for r0, r1 in zip(rows[0], rows[1]):
        assert not (r0 & r1)
        all0 |= r0
        all1 |= r1
    # 7 wide examples -> 1 full global batch of 4; 14 square -> 3 full
    # batches of 4: 16 examples total across both processes.
    assert len(all0 | all1) == 16



def test_prepare_example_carries_difficult_flags():
    """Eval-mode datasets pass per-GT 'difficult' flags through the host
    pipeline so the VOC-protocol evaluator can ignore those GT (SURVEY C20)."""
    cfg = tiny_test_config().data
    img = np.zeros((60, 80, 3), np.uint8)
    boxes = np.asarray([[2, 2, 20, 20], [30, 30, 50, 50]], np.float32)
    classes = np.asarray([1, 2], np.int32)
    out = prepare_example(cfg, img, boxes, classes,
                          difficult=np.asarray([False, True]))
    assert out["gt_difficult"].shape == (cfg.max_gt_boxes,)
    assert out["gt_difficult"][:2].tolist() == [False, True]
    assert not out["gt_difficult"][2:].any()
    # Absent flags -> all False (synthetic/COCO path).
    out2 = prepare_example(cfg, img, boxes, classes)
    assert not out2["gt_difficult"].any()


def test_coco_dataset_keep_crowd(tmp_path):
    """Eval splits carry iscrowd annotations through as ignore regions;
    training drops them (they are not box-regression targets)."""
    import json
    from PIL import Image

    from tpudet.data import build_dataset
    from tpudet.data.coco import CocoDataset

    root = tmp_path
    (root / "annotations").mkdir()
    for name in ("train2017", "val2017"):
        (root / name).mkdir()
        Image.new("RGB", (64, 48)).save(root / name / "img1.jpg")
        blob = {
            "images": [{"id": 7, "file_name": "img1.jpg",
                        "height": 48, "width": 64}],
            "categories": [{"id": 3, "name": "cat"}],
            "annotations": [
                {"id": 1, "image_id": 7, "category_id": 3,
                 "bbox": [2, 2, 10, 10], "iscrowd": 0},
                {"id": 2, "image_id": 7, "category_id": 3,
                 "bbox": [20, 20, 30, 20], "iscrowd": 1},
            ],
        }
        with open(root / "annotations" / f"instances_{name}.json", "w") as f:
            json.dump(blob, f)

    train = CocoDataset(str(root), split="train")
    ex = train.get_example(0)
    assert len(ex["boxes"]) == 1  # crowd dropped for training
    assert not ex["crowd"].any()

    val = CocoDataset(str(root), split="val", keep_crowd=True)
    ex = val.get_example(0)
    assert len(ex["boxes"]) == 2
    assert ex["crowd"].tolist() == [False, True]
    assert ex["difficult"].tolist() == [False, True]  # crowd => ignored
    raw = val.get_raw(0)
    assert raw["crowd"].tolist() == [False, True]

    # The factory wires keep_crowd by split.
    from tpudet.config import Config, DataConfig

    cfg = Config(data=DataConfig(dataset="coco", data_dir=str(root),
                                 num_classes=1))
    assert len(build_dataset(cfg, "val").get_example(0)["boxes"]) == 2
    assert len(build_dataset(cfg, "train").get_example(0)["boxes"]) == 1


def test_prepare_example_carries_crowd_flags():
    cfg = tiny_test_config().data
    img = np.zeros((60, 80, 3), np.uint8)
    boxes = np.asarray([[2, 2, 20, 20], [30, 30, 50, 50]], np.float32)
    classes = np.asarray([1, 2], np.int32)
    out = prepare_example(cfg, img, boxes, classes,
                          crowd=np.asarray([False, True]))
    assert out["gt_crowd"][:2].tolist() == [False, True]
    assert not out["gt_crowd"][2:].any()
    assert not prepare_example(cfg, img, boxes, classes)["gt_crowd"].any()


class _FailingDataset:
    num_classes = 3

    def __len__(self):
        return 8

    def get_example(self, index):
        raise OSError(f"corrupt image {index}")


def test_device_stream_surfaces_producer_errors():
    """An exception in the producer thread (corrupt file, OOM, shape
    mismatch) must raise in the consumer instead of hanging q.get()."""
    import pytest as _pytest

    from tpudet.data.loader import DataLoader

    cfg = tiny_test_config()
    loader = DataLoader(cfg, _FailingDataset(), batch_size=2, shuffle=False,
                        num_workers=2)
    stream = loader.device_stream()
    with _pytest.raises(RuntimeError, match="producer thread failed"):
        next(stream)
    stream.close()


def test_loader_rejects_batch_larger_than_dataset():
    import pytest as _pytest

    from tpudet.data import SyntheticDataset, DataLoader

    cfg = tiny_test_config()
    ds = SyntheticDataset(num_classes=3, num_examples=4)
    with _pytest.raises(ValueError, match="fewer"):
        DataLoader(cfg, ds, batch_size=8, drop_last=True)
    DataLoader(cfg, ds, batch_size=8, drop_last=False)  # tail batch ok


def test_coco_invalid_split_and_train_only_min_box(tmp_path):
    import json
    import pytest as _pytest
    from PIL import Image

    from tpudet.data.coco import CocoDataset

    with _pytest.raises(ValueError, match="unknown COCO split"):
        CocoDataset(str(tmp_path), split="test")

    (tmp_path / "annotations").mkdir()
    for name in ("train2017", "val2017"):
        (tmp_path / name).mkdir()
        Image.new("RGB", (64, 48)).save(tmp_path / name / "a.jpg")
        blob = {
            "images": [{"id": 1, "file_name": "a.jpg",
                        "height": 48, "width": 64}],
            "categories": [{"id": 1, "name": "x"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 1,
                 "bbox": [2, 2, 10, 10], "iscrowd": 0},
                # degenerate sub-pixel box: train drops it, eval keeps it
                # (pycocotools counts all GT in npos)
                {"id": 2, "image_id": 1, "category_id": 1,
                 "bbox": [20, 20, 0.5, 8], "iscrowd": 0},
            ],
        }
        with open(tmp_path / "annotations" / f"instances_{name}.json",
                  "w") as f:
            json.dump(blob, f)
    assert len(CocoDataset(str(tmp_path), "train").get_example(0)["boxes"]) == 1
    assert len(CocoDataset(str(tmp_path), "val").get_example(0)["boxes"]) == 2


def test_build_dataset_rejects_class_mismatch(tmp_path):
    import json
    import pytest as _pytest
    from PIL import Image

    from tpudet.config import Config, DataConfig
    from tpudet.data import build_dataset

    (tmp_path / "annotations").mkdir()
    (tmp_path / "val2017").mkdir()
    Image.new("RGB", (32, 32)).save(tmp_path / "val2017" / "a.jpg")
    blob = {"images": [{"id": 1, "file_name": "a.jpg",
                        "height": 32, "width": 32}],
            "categories": [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}],
            "annotations": []}
    with open(tmp_path / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(blob, f)
    cfg = Config(data=DataConfig(dataset="coco", data_dir=str(tmp_path),
                                 num_classes=80))
    with _pytest.raises(ValueError, match="2 classes.*num_classes.*80"):
        build_dataset(cfg, "val")


def _write_nuimages_fixture(root):
    """Minimal nuScenes-style table set: 3 categories, 2 key-frame images
    (one unannotated), 1 non-key-frame image that must be skipped."""
    import json
    from PIL import Image

    for version in ("v1.0-train", "v1.0-val"):
        (root / version).mkdir()
        cam = root / "samples" / "CAM_FRONT"
        cam.mkdir(parents=True, exist_ok=True)
        Image.new("RGB", (64, 48)).save(cam / "kf1.jpg")
        Image.new("RGB", (64, 48)).save(cam / "kf2.jpg")
        tables = {
            "category": [
                {"token": "tcar", "name": "vehicle.car"},
                {"token": "tped", "name": "human.pedestrian.adult"},
                {"token": "tbar", "name": "movable_object.barrier"},
            ],
            "sample_data": [
                {"token": "sd1", "filename": "samples/CAM_FRONT/kf1.jpg",
                 "width": 64, "height": 48, "is_key_frame": True},
                {"token": "sd2", "filename": "samples/CAM_FRONT/kf2.jpg",
                 "width": 64, "height": 48, "is_key_frame": True},
                {"token": "sd3", "filename": "samples/CAM_FRONT/sweep.jpg",
                 "width": 64, "height": 48, "is_key_frame": False},
            ],
            "object_ann": [
                {"token": "a1", "sample_data_token": "sd1",
                 "category_token": "tcar", "bbox": [2.0, 3.0, 20.0, 15.0]},
                {"token": "a2", "sample_data_token": "sd1",
                 "category_token": "tped", "bbox": [30.0, 10.0, 40.0, 30.0]},
                # degenerate sliver: dropped for training, kept for eval
                {"token": "a3", "sample_data_token": "sd1",
                 "category_token": "tbar", "bbox": [50.0, 5.0, 50.4, 40.0]},
            ],
        }
        for name, rows in tables.items():
            with open(root / version / f"{name}.json", "w") as f:
                json.dump(rows, f)


def test_nuimages_dataset(tmp_path):
    from tpudet.data.nuimages import NuImagesDataset

    _write_nuimages_fixture(tmp_path)

    train = NuImagesDataset(str(tmp_path), split="train")
    # sd2 has no annotations (dropped for training); sd3 is not a key frame.
    assert len(train) == 1
    assert train.num_classes == 3
    # classes are category names sorted: adult=1, barrier=2, car=3
    assert train.class_names[0] == "human.pedestrian.adult"
    ex = train.get_example(0)
    assert ex["image"].shape == (48, 64, 3)
    assert ex["boxes"].shape == (2, 4)  # sliver dropped in training
    assert sorted(ex["classes"].tolist()) == [1, 3]
    np.testing.assert_allclose(
        ex["area"], (ex["boxes"][:, 2] - ex["boxes"][:, 0])
        * (ex["boxes"][:, 3] - ex["boxes"][:, 1]))
    assert not ex["crowd"].any() and not ex["difficult"].any()
    assert train.example_hw(0) == (48, 64)

    val = NuImagesDataset(str(tmp_path), split="val")
    assert len(val) == 2  # unannotated key frame kept for eval
    by_id = {val.image_id(i): i for i in range(len(val))}
    ex = val.get_example(by_id["sd1"])
    assert ex["boxes"].shape == (3, 4)  # sliver kept for eval
    raw = val.get_raw(by_id["sd1"])
    assert raw["jpeg"][:2] == b"\xff\xd8"  # JPEG magic
    assert raw["boxes"].shape == (3, 4)

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="v1.0-"):
        NuImagesDataset(str(tmp_path), split="v1.0-missing")


def test_build_dataset_nuimages_and_loader(tmp_path):
    """Factory dispatch + one loader batch end-to-end off the nuImages
    fixture (exercises example_hw bucketing and flag plumbing)."""
    from tpudet.config import Config, DataConfig
    from tpudet.data import DataLoader, build_dataset

    _write_nuimages_fixture(tmp_path)
    cfg = Config(data=DataConfig(dataset="nuimages", data_dir=str(tmp_path),
                                 num_classes=3, min_size=48, max_size=64,
                                 canvas_height=64, canvas_width=64))
    ds = build_dataset(cfg, "val")
    assert len(ds) == 2
    loader = DataLoader(cfg, ds, batch_size=2, shuffle=False,
                        drop_last=False)
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 2
    assert batch["gt_boxes"].shape[0] == 2

    cfg_bad = Config(data=DataConfig(dataset="nuimages",
                                     data_dir=str(tmp_path), num_classes=80))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="3 classes.*num_classes.*80"):
        build_dataset(cfg_bad, "val")


def test_scale_jitter_applied_and_deterministic():
    """data.scale_jitter: train-only multi-scale — the resize scale is
    multiplied by a deterministic per-(seed, epoch, index) factor; the
    canvas (static shape) is untouched."""
    import dataclasses

    cfg = tiny_test_config()  # canvas 128, min/max 128 -> unjittered scale 1
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, scale_jitter=(0.5, 0.5)))
    ds = SyntheticDataset(num_classes=3, num_examples=8, image_size=128)

    aug = DataLoader(cfg, ds, batch_size=4, num_workers=2, seed=3,
                     shuffle=False, augment=True)
    b = next(iter(aug.batches(0)))
    assert b["image"].shape == (4, 128, 128, 3)  # canvas unchanged
    np.testing.assert_allclose(b["image_scale"], 0.5)  # 128 -> 64
    np.testing.assert_allclose(b["image_hw"], 64.0)
    # GT boxes scaled by the jittered factor: compare vs the eval loader.
    ev = DataLoader(cfg, ds, batch_size=4, num_workers=2, seed=3,
                    shuffle=False)  # augment=False default
    e = next(iter(ev.batches(0)))
    np.testing.assert_allclose(e["image_scale"], 1.0)
    np.testing.assert_allclose(
        b["gt_boxes"][e["gt_valid"]], 0.5 * e["gt_boxes"][e["gt_valid"]],
        atol=1e-4)
    # Jittered pixels live only in the top-left 64x64; the rest is pad.
    assert (b["image"][:, 64:].sum(), b["image"][:, :, 64:].sum()) == (0, 0)

    # A RANGE is deterministic in (seed, epoch, index) and actually varies.
    cfg2 = cfg.replace(data=dataclasses.replace(
        cfg.data, scale_jitter=(0.5, 1.0)))
    l1 = DataLoader(cfg2, ds, batch_size=8, num_workers=2, seed=3,
                    shuffle=False, augment=True)
    l2 = DataLoader(cfg2, ds, batch_size=8, num_workers=2, seed=3,
                    shuffle=False, augment=True)
    b1 = next(iter(l1.batches(0)))
    b2 = next(iter(l2.batches(0)))
    np.testing.assert_array_equal(b1["image_scale"], b2["image_scale"])
    assert len(np.unique(b1["image_scale"][:, 0])) > 2  # per-example factors
    b1e1 = next(iter(l1.batches(1)))
    assert not np.array_equal(b1["image_scale"], b1e1["image_scale"])

    # Invalid range fails at construction.
    bad = cfg.replace(data=dataclasses.replace(
        cfg.data, scale_jitter=(0.0, 1.0)))
    with pytest.raises(ValueError, match="scale_jitter"):
        DataLoader(bad, ds, batch_size=4, augment=True)


def test_scale_jitter_fits_canvas_when_upscaling():
    """Factors > 1 are clamped so the jittered image still fits the canvas
    chosen from the UNJITTERED size (jittered_minmax's fit proof)."""
    import dataclasses
    from tpudet.data.preprocess import prepare_example

    cfg = dataclasses.replace(
        tiny_test_config().data, scale_jitter=(2.0, 2.0))
    image = np.zeros((64, 32, 3), np.uint8)
    boxes = np.asarray([[8.0, 16.0, 24.0, 48.0]], np.float32)
    out = prepare_example(cfg, image, boxes, np.asarray([1], np.int32),
                          scale_factor=2.0)
    # Unjittered: (128, 64). Jitter x2 wants (256, 128) -> clamped to fit
    # the 128x128 canvas: scale min(128/64, 128/32) = 2 -> (128, 64).
    assert out["image"].shape == (128, 128, 3)
    nh, nw = out["image_hw"]
    assert nh <= 128 and nw <= 128


def test_color_jitter_invariants():
    """Device-side photometric aug: brightness is a single scale of the
    valid region; saturation/hue/contrast preserve the (mean) luma; padding
    stays exactly zero; deterministic per key."""
    from tpudet.data.preprocess import _color_jitter_single

    rng = np.random.default_rng(0)
    # Mid-gamut pixels: the 0..255 clip is correct behavior but would
    # break the exact scale/luma identities this test checks.
    img = jnp.asarray(rng.uniform(80, 170, (16, 16, 3)), jnp.float32)
    img = img.at[8:].set(0.0).at[:, 12:].set(0.0)  # pad below/right
    hw = jnp.asarray([8.0, 12.0], jnp.float32)
    key = jax.random.key(7)
    luma = jnp.asarray([0.299, 0.587, 0.114])

    # Brightness only: valid region scaled by one factor in [0.5, 1.5].
    out = _color_jitter_single(img, hw, key, (0.5, 0.0, 0.0, 0.0))
    ratio = np.asarray(out[:8, :12] / img[:8, :12])
    assert np.allclose(ratio, ratio.flat[0], atol=1e-5)
    assert 0.5 <= ratio.flat[0] <= 1.5
    assert float(jnp.abs(out[8:]).max()) == 0.0  # padding untouched
    assert float(jnp.abs(out[:, 12:]).max()) == 0.0
    # Deterministic in the key; different keys differ.
    out2 = _color_jitter_single(img, hw, key, (0.5, 0.0, 0.0, 0.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = _color_jitter_single(
        img, hw, jax.random.key(8), (0.5, 0.0, 0.0, 0.0))
    assert not np.allclose(np.asarray(out), np.asarray(out3))

    # Saturation only: per-pixel luma preserved (gray-lerp invariant).
    out = _color_jitter_single(img, hw, key, (0.0, 0.0, 0.5, 0.0))
    np.testing.assert_allclose(
        np.asarray(out[:8, :12] @ luma), np.asarray(img[:8, :12] @ luma),
        rtol=1e-4)
    assert not np.allclose(np.asarray(out[:8, :12]),
                           np.asarray(img[:8, :12]))

    # Hue only: YIQ rotation leaves the Y (luma) channel exact.
    out = _color_jitter_single(img, hw, key, (0.0, 0.0, 0.0, 0.1))
    np.testing.assert_allclose(
        np.asarray(out[:8, :12] @ luma), np.asarray(img[:8, :12] @ luma),
        rtol=2e-3, atol=0.5)
    assert not np.allclose(np.asarray(out[:8, :12]),
                           np.asarray(img[:8, :12]), atol=1.0)

    # Contrast only: the valid-region MEAN luma is preserved.
    out = _color_jitter_single(img, hw, key, (0.0, 0.9, 0.0, 0.0))
    assert float(jnp.mean(out[:8, :12] @ luma)) == pytest.approx(
        float(jnp.mean(img[:8, :12] @ luma)), rel=1e-3)


def test_color_jitter_in_device_preprocess():
    """Training-only, fused into the jitted preprocess; eval path and the
    all-zero default are bit-identical to no-jitter."""
    import dataclasses

    cfg = tiny_test_config()
    jcfg = cfg.replace(data=dataclasses.replace(
        cfg.data, color_jitter=(0.3, 0.3, 0.3, 0.05), random_flip=False))
    rng = np.random.default_rng(1)
    imgs = rng.integers(30, 220, (2, 128, 128, 3)).astype(np.uint8)
    imgs[1, 96:] = 0  # loader contract: padding is zero
    imgs[1, :, 64:] = 0
    batch = {
        "image": jnp.asarray(imgs),
        "image_hw": jnp.asarray([[128.0, 128.0], [96.0, 64.0]]),
        "gt_boxes": jnp.zeros((2, 10, 4)),
        "gt_valid": jnp.zeros((2, 10), bool),
        "gt_classes": jnp.zeros((2, 10), jnp.int32),
    }
    plain = device_preprocess(cfg, dict(batch), jax.random.key(0),
                              training=True)
    jit_train = device_preprocess(jcfg, dict(batch), jax.random.key(0),
                                  training=True)
    jit_eval = device_preprocess(jcfg, dict(batch), training=False)
    # Eval never jitters; training with the jitter config differs.
    np.testing.assert_array_equal(
        np.asarray(plain["image"]), np.asarray(jit_eval["image"]))
    assert not np.allclose(
        np.asarray(jit_train["image"]), np.asarray(plain["image"]))
    # Padding rows of image 1 (valid 96x64) normalize identically in both:
    # the jitter re-zeroes padding before the shared normalize.
    np.testing.assert_allclose(
        np.asarray(jit_train["image"][1, 96:]),
        np.asarray(plain["image"][1, 96:]), atol=1e-6)


def test_coco_person_keypoints_pipeline(tmp_path):
    """Keypoint loading uses person_keypoints_*.json (the instances files
    carry NO 'keypoints' fields): build_dataset selects the prefix from
    data.load_keypoints, the flat [x,y,v]*K triples parse per instance, and
    prepare_example scales them with the boxes."""
    import json
    from PIL import Image

    from tpudet.data import build_dataset
    from tpudet.data.preprocess import prepare_example

    root = tmp_path
    (root / "annotations").mkdir()
    (root / "val2017").mkdir()
    Image.new("RGB", (64, 48)).save(root / "val2017" / "img1.jpg")
    kp = [10, 10, 2, 20, 12, 1, 0, 0, 0]  # 3 keypoints, last unlabeled
    person = {
        "images": [{"id": 7, "file_name": "img1.jpg",
                    "height": 48, "width": 64}],
        "categories": [{"id": 1, "name": "person"}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 1,
             "bbox": [2, 2, 30, 30], "iscrowd": 0, "num_keypoints": 2,
             "keypoints": kp},
            # A person with no labeled keypoints: field absent -> None.
            {"id": 2, "image_id": 7, "category_id": 1,
             "bbox": [35, 2, 20, 20], "iscrowd": 0, "num_keypoints": 0},
        ],
    }
    with open(root / "annotations" / "person_keypoints_val2017.json",
              "w") as f:
        json.dump(person, f)
    # NO instances json on disk: loading must not touch it.
    import dataclasses

    from tpudet.config import Config, DataConfig

    cfg = Config(data=DataConfig(
        dataset="coco", data_dir=str(root), num_classes=1,
        load_keypoints=True, num_keypoints=3,
        keypoint_flip_pairs=(), keypoint_sigmas=(0.1, 0.1, 0.1),
        min_size=96, max_size=128, canvas_height=128, canvas_width=128,
    ))
    ds = build_dataset(cfg, "val")
    ex = ds.get_example(0)
    assert ex["keypoints"][0].shape == (3, 3)
    assert ex["keypoints"][1] is None
    np.testing.assert_allclose(ex["keypoints"][0][0], [10, 10, 2])

    out = prepare_example(cfg.data, ex["image"], ex["boxes"], ex["classes"],
                          keypoints=ex["keypoints"])
    # 48x64 -> min side 48*2=96: scale 2 both axes.
    np.testing.assert_allclose(out["gt_keypoints"][0][0], [20, 20, 2])
    np.testing.assert_allclose(out["gt_keypoints"][0][1], [40, 24, 1])
    np.testing.assert_allclose(out["gt_keypoints"][1], 0.0)  # None -> zeros

    # Without load_keypoints the factory reads instances_* (absent here).
    plain = cfg.replace(data=dataclasses.replace(
        cfg.data, load_keypoints=False))
    with pytest.raises(FileNotFoundError):
        build_dataset(plain, "val")
