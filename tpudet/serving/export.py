"""AOT export + serving artifact (production deployment path).

The TF2 reference "deploys" by re-running its Python graph from a checkpoint
(SURVEY.md C19/3b — there is no export path to re-verify since the reference
mount is empty; this subsystem is the TPU-native deployment story the build
adds on top of parity). Here deployment is ahead-of-time export: ``jax.export``
serializes the fully-traced, shape-static inference program (StableHLO) with
the trained weights baked in as constants. The artifact:

- is one self-contained zip (``module.bin`` StableHLO + ``metadata.json``);
- loads and runs in a process that never imports model code — only this
  module's ~100-line loader and jax itself;
- pins static shapes at export time (batch size, canvas), which is exactly
  the contract a TPU serving fleet wants: one compiled program per shape,
  no retracing, no Python model graph in the serving binary;
- can be lowered for multiple platforms at once (``platforms=("tpu","cpu")``)
  when the config avoids platform-specific custom calls (``use_pallas=False``
  exports a pure-XLA program that runs anywhere).

``ServingModel`` adds the host half around the compiled program: JPEG/array
in → aspect-preserving resize onto the exported canvas → run → rescale the
detections back to original-image coordinates.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

ARTIFACT_VERSION = 1


def _canvas_buckets(cfg) -> Tuple[Tuple[int, int], ...]:
    """Canvases the artifact compiles for: the aspect buckets when
    configured (one module per bucket, mirroring the training loader's
    batching), the two orientation canvases in legacy orientation mode,
    else the single static canvas."""
    d = cfg.data
    if getattr(d, "aspect_buckets", ()):
        return tuple(tuple(b) for b in d.aspect_buckets)
    if getattr(d, "orientation_buckets", False):
        return (
            (int(d.canvas_short), int(d.canvas_width)),
            (int(d.canvas_height), int(d.canvas_short)),
        )
    return ((int(d.canvas_height), int(d.canvas_width)),)


def _serving_metadata(cfg, batch_size: int, platforms) -> Dict[str, Any]:
    d = cfg.data
    buckets = _canvas_buckets(cfg)
    # Postprocess knobs live in the family-specific config group.
    family = getattr(cfg, "model", "faster_rcnn")
    pp = {
        "retinanet": cfg.retinanet,
        "fcos": getattr(cfg, "fcos", None),
        "detr": getattr(cfg, "detr", None),
        "deformable_detr": getattr(cfg, "deformable_detr", None),
    }.get(family) or cfg.roi
    return {
        "artifact_version": ARTIFACT_VERSION,
        "model": getattr(cfg, "model", "faster_rcnn"),
        "batch_size": int(batch_size),
        "canvas_height": buckets[0][0],
        "canvas_width": buckets[0][1],
        "buckets": [list(b) for b in buckets],
        "min_size": int(d.min_size),
        "max_size": int(d.max_size),
        "num_classes": int(d.num_classes),
        "max_detections": int(pp.max_detections),
        "score_thresh": float(pp.score_thresh),
        "platforms": list(platforms) if platforms else None,
        "backbone": cfg.backbone.name,
        "use_fpn": bool(cfg.backbone.use_fpn),
        # Whether the traced program embeds Pallas kernels — lets a serving
        # fleet audit artifacts for the fast path. True only for a pure-TPU
        # platform list (lowering override) or a default-platform export
        # from a TPU host; mixed-platform exports are forced onto the
        # portable XLA paths even on a TPU host (a Mosaic call has no
        # CPU/CUDA lowering), so they never embed.
        "pallas_embedded": bool(cfg.use_pallas) and (
            _all_tpu(platforms) or (not platforms and _on_tpu_host())
        ),
    }


def _all_tpu(platforms) -> bool:
    return bool(platforms) and set(platforms) == {"tpu"}


def _on_tpu_host() -> bool:
    from tpudet.kernels import on_tpu_lowering

    return on_tpu_lowering()


def export_model(
    cfg,
    variables,
    batch_size: int,
    platforms: Optional[Sequence[str]] = None,
    canvas_hw: Optional[Tuple[int, int]] = None,
):
    """Trace + lower the full inference step to a serializable Exported.

    The exported program takes ``(image uint8 [B,H,W,3], image_hw f32 [B,2])``
    — the raw loader output — and returns the model's detection dict
    (boxes/scores/classes/valid/num_detections, canvas coordinates). The
    device half of preprocessing (normalize, dtype cast) is fused inside, and
    ``variables`` are baked in as program constants.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from tpudet.data.preprocess import device_preprocess
    from tpudet.models import build_model

    model = build_model(cfg)

    def serve(image, image_hw):
        batch = device_preprocess(
            cfg, {"image": image, "image_hw": image_hw}, training=False
        )
        return model.predict(variables, batch)

    ch, cw = canvas_hw or (cfg.data.canvas_height, cfg.data.canvas_width)
    specs = (
        jax.ShapeDtypeStruct((batch_size, ch, cw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, 2), jnp.float32),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    # Kernel dispatch normally keys on the HOST backend, which would bake
    # the XLA fallbacks into a cross-host TPU export. Mosaic kernels lower
    # fine for the 'tpu' platform from any host (they serialize into the
    # StableHLO as custom calls — verified), so when every target platform
    # is TPU, trace under the lowering override and embed the real kernels.
    # Mixed-platform exports (e.g. ("tpu", "cpu")) cannot: the Mosaic call
    # has no CPU lowering — those keep the portable XLA paths and warn.
    if _all_tpu(platforms) and cfg.use_pallas:
        from tpudet.kernels import assume_tpu_lowering

        with assume_tpu_lowering():
            return jax_export.export(jax.jit(serve), **kwargs)(*specs)
    if platforms and "tpu" in platforms and cfg.use_pallas:
        import warnings

        warnings.warn(
            "multi-platform export with use_pallas: the artifact embeds the "
            "portable XLA paths, not the Pallas kernels — export with "
            "platforms=('tpu',) for peak TPU serving throughput",
            stacklevel=2,
        )
    if len(platforms or ()) > 1 or (
        platforms and jax.default_backend() not in platforms
    ):
        # A mixed-platform (or other-platform) artifact must carry the
        # portable XLA paths on EVERY platform — but kernel dispatch keys on
        # the host backend, so tracing on a TPU host would embed Mosaic
        # custom calls that have no CPU/CUDA lowering. Force the XLA paths
        # regardless of host.
        from tpudet.kernels import assume_xla_lowering

        with assume_xla_lowering():
            return jax_export.export(jax.jit(serve), **kwargs)(*specs)
    return jax_export.export(jax.jit(serve), **kwargs)(*specs)


def _module_name(ch: int, cw: int) -> str:
    return f"module_{ch}x{cw}.bin"


def save_artifact(
    path: str, cfg, variables, batch_size: int,
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Export and write the serving artifact zip. Returns the metadata.

    With ``cfg.data.aspect_buckets`` the artifact carries one compiled
    module per bucket canvas (the serving-side mirror of the loader's
    bucketed batching); otherwise a single module."""
    buckets = _canvas_buckets(cfg)
    meta = None
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for ch, cw in buckets:
            exported = export_model(cfg, variables, batch_size, platforms,
                                    canvas_hw=(ch, cw))
            if meta is None:
                meta = _serving_metadata(
                    cfg, batch_size, platforms or exported.platforms
                )
            zf.writestr(_module_name(ch, cw), bytes(exported.serialize()))
        zf.writestr("metadata.json", json.dumps(meta, indent=2))
    return meta


def load_artifact(path: str) -> Tuple[Dict[Tuple[int, int], Any], Dict[str, Any]]:
    """Read an artifact zip -> ({(ch, cw): Exported}, metadata dict)."""
    from jax import export as jax_export

    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("metadata.json"))
        if meta.get("artifact_version") != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {meta.get('artifact_version')} != "
                f"{ARTIFACT_VERSION}"
            )
        modules = {}
        for ch, cw in [tuple(b) for b in meta["buckets"]]:
            modules[(ch, cw)] = jax_export.deserialize(
                bytearray(zf.read(_module_name(ch, cw)))
            )
    return modules, meta


class ServingModel:
    """Host-side wrapper around a loaded (or freshly exported) artifact.

    ``detect(images)`` is the full 3b call stack for deployment: route each
    raw image to the best-fitting canvas bucket (the serving mirror of the
    training loader's aspect bucketing), resize/pad onto that canvas, batch
    per bucket (padding short batches to the exported batch size), run the
    bucket's compiled program, rescale surviving boxes to original-image
    coordinates. Results come back in input order.
    """

    def __init__(self, modules: Dict[Tuple[int, int], Any],
                 meta: Dict[str, Any]):
        import jax
        from concurrent.futures import ThreadPoolExecutor

        self.meta = meta
        self._calls = {hw: jax.jit(e.call) for hw, e in modules.items()}
        self._pool = ThreadPoolExecutor(min(8, os.cpu_count() or 1))
        # Minimal DataConfig mirroring the exported preprocessing contract.
        from tpudet.config import DataConfig

        buckets = tuple(tuple(b) for b in meta["buckets"])
        self._data_cfg = DataConfig(
            min_size=meta["min_size"],
            max_size=meta["max_size"],
            canvas_height=meta["canvas_height"],
            canvas_width=meta["canvas_width"],
            aspect_buckets=buckets if len(buckets) > 1 else (),
            max_gt_boxes=1,
            num_classes=meta["num_classes"],
        )

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        modules, meta = load_artifact(path)
        return cls(modules, meta)

    @property
    def batch_size(self) -> int:
        return self.meta["batch_size"]

    def __call__(self, image: np.ndarray, image_hw: np.ndarray):
        """Run a compiled program on an already-prepared canvas batch
        (the batch's [H, W] selects the bucket module)."""
        return self._calls[tuple(image.shape[1:3])](image, image_hw)

    def detect(
        self, images: List[np.ndarray], score_thresh: Optional[float] = None
    ) -> List[Dict[str, np.ndarray]]:
        """Raw uint8 [h,w,3] images -> per-image detections in original
        coordinates: {"boxes" [n,4], "scores" [n], "classes" [n]}."""
        import jax

        from tpudet.data.preprocess import (
            canvas_for_hw, prepare_example, rescale_to_original,
        )

        if score_thresh is None:
            score_thresh = self.meta["score_thresh"]
        bs = self.batch_size
        by_bucket: Dict[Tuple[int, int], List[int]] = {}
        for i, img in enumerate(images):
            hw = canvas_for_hw(self._data_cfg, *img.shape[:2])
            by_bucket.setdefault(tuple(hw), []).append(i)

        no_boxes = (np.zeros((0, 4), np.float32), np.zeros(0, np.int32))

        def prep(i):
            return prepare_example(self._data_cfg, images[i], *no_boxes)

        results: List[Optional[Dict[str, np.ndarray]]] = [None] * len(images)
        for bucket, idxs in by_bucket.items():
            call = self._calls[bucket]
            for start in range(0, len(idxs), bs):
                chunk = idxs[start : start + bs]
                prepared = list(self._pool.map(prep, chunk))
                pad = bs - len(prepared)
                canvases = np.stack(
                    [p["image"] for p in prepared]
                    + [np.zeros_like(prepared[0]["image"])] * pad
                )
                hw = np.stack(
                    [p["image_hw"] for p in prepared]
                    + [prepared[0]["image_hw"]] * pad
                ).astype(np.float32)
                out = jax.device_get(call(canvases, hw))
                for k, (i, p) in enumerate(zip(chunk, prepared)):
                    keep = out["valid"][k] & (out["scores"][k] >= score_thresh)
                    boxes = rescale_to_original(
                        out["boxes"][k][keep].astype(np.float32),
                        p["image_scale"], p["orig_hw"],
                    )
                    results[i] = {
                        "boxes": boxes,
                        "scores": out["scores"][k][keep],
                        "classes": out["classes"][k][keep],
                    }
                    if "masks" in out:
                        # Box-frame mask probabilities ride through
                        # unchanged — the original-coordinate rescale is
                        # carried entirely by the boxes (paste with
                        # data/masks.py::paste_mask against results[i]
                        # ["boxes"] to get image-space masks).
                        results[i]["masks"] = out["masks"][k][keep]
                    if "keypoints" in out:
                        from tpudet.data.preprocess import (
                            rescale_keypoints_to_original,
                        )

                        results[i]["keypoints"] = (
                            rescale_keypoints_to_original(
                                out["keypoints"][k][keep].astype(np.float32),
                                p["image_scale"], p["orig_hw"],
                            )
                        )
        return results  # type: ignore[return-value]
