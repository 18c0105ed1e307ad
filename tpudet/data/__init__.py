"""Input pipeline (reference layer L1 — SURVEY.md C1–C4).

Host side: annotation parsing (VOC XML / COCO JSON / synthetic), JPEG decode,
aspect-preserving resize, static-canvas padding — producing uint8 canvases +
metadata. Device side (fused into the jitted step): uint8→float normalize and
random horizontal flip, so the augment/normalize math runs on-chip next to the
model (``north_star``: "fused device-side preprocessing stage feeding HBM").
A background thread double-buffers host→device transfers."""

from tpudet.data.preprocess import (  # noqa: F401
    device_preprocess,
    prepare_example,
)
from tpudet.data.loader import DataLoader, Dataset  # noqa: F401
from tpudet.data.synthetic import SyntheticDataset  # noqa: F401
from tpudet.data.voc import VOC_CLASSES, VOCDataset  # noqa: F401
from tpudet.data.coco import CocoDataset  # noqa: F401
from tpudet.data.nuimages import NuImagesDataset  # noqa: F401


def build_dataset(cfg, split: str | None = None):
    """Dataset factory (reference call stack 3d)."""
    d = cfg.data
    split = split or d.split
    if d.dataset == "synthetic":
        return SyntheticDataset(
            num_classes=d.num_classes,
            num_examples=512 if split == "train" else 64,
            seed=0 if split == "train" else 1,
            with_masks=d.load_masks,
            with_keypoints=getattr(d, "load_keypoints", False),
            num_keypoints=getattr(d, "num_keypoints", 5),
            with_semantic=getattr(d, "load_semantic", False),
            num_stuff_classes=getattr(d, "num_stuff_classes", 1),
        )
    if d.dataset == "voc":
        # Eval splits keep difficult objects WITH their flags (the VOC
        # protocol ignores them at matching time rather than dropping them);
        # training drops them, as the reference does.
        keep_difficult = split in ("test", "val")
        ds = VOCDataset(d.data_dir, split=split,
                        keep_difficult=keep_difficult)
    elif d.dataset == "coco" and getattr(d, "load_semantic", False):
        # Panoptic training/eval reads the panoptic annotation set (json +
        # PNG id maps) — the only COCO file carrying stuff segments.
        from tpudet.data.coco_panoptic import CocoPanopticDataset

        ds = CocoPanopticDataset(
            d.data_dir, split=split,
            keep_crowd=split in ("val", "val2017"),
        )
        if ds.num_stuff_classes != d.num_stuff_classes:
            raise ValueError(
                f"data.num_stuff_classes={d.num_stuff_classes} but the "
                f"panoptic annotations define {ds.num_stuff_classes} stuff "
                "categories"
            )
    elif d.dataset == "coco":
        # Eval splits keep iscrowd annotations as ignore regions (the COCO
        # protocol ignores detections matched to a crowd); training drops
        # them — crowd regions are not usable as box-regression targets.
        ds = CocoDataset(
            d.data_dir, split=split,
            keep_crowd=split in ("val", "val2017"),
            # Keypoints live only in person_keypoints_*.json (1 category);
            # the instances files carry no 'keypoints' fields at all.
            ann_prefix=("person_keypoints"
                        if getattr(d, "load_keypoints", False)
                        else "instances"),
        )
    elif d.dataset == "nuimages":
        # nuScenes-style autonomous-driving annotations (SURVEY C1); no
        # crowd/difficult concept, so eval needs no ignore-region plumbing.
        ds = NuImagesDataset(d.data_dir, split=split)
    else:
        raise ValueError(f"unknown dataset {d.dataset!r}")
    # A class-count mismatch (e.g. a COCO dir with a num_classes=20 config)
    # would otherwise emit GT class ids beyond the model heads / evaluator
    # banks and silently corrupt losses and metrics.
    ds_classes = getattr(ds, "num_classes", None)
    if ds_classes is not None and ds_classes != d.num_classes:
        raise ValueError(
            f"dataset has {ds_classes} classes but cfg.data.num_classes is "
            f"{d.num_classes} — use the matching preset or override "
            "data.num_classes"
        )
    return ds
