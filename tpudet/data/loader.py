"""Dataset protocol + batching loader with background prefetch (SURVEY.md C1,
C4; call stack 3d).

``Dataset``: len + ``get_example(i)`` returning raw
``{"image": uint8 [h,w,3], "boxes": [n,4], "classes": [n]}``.

``DataLoader``: shuffles per epoch, runs host-side ``prepare_example`` in a
thread pool, stacks fixed-shape batches, and double-buffers them onto the
device (``jax.device_put`` against the mesh sharding when given) so the TPU
never waits on the host — the loader is the host half of the "preprocessing
stage feeding HBM"."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Protocol

import jax
import numpy as np

from tpudet.config import Config
from tpudet.data.preprocess import prepare_example, prepare_example_jpeg


class Dataset(Protocol):
    def __len__(self) -> int: ...

    def get_example(self, index: int) -> Dict[str, np.ndarray]: ...


_announced_native = False
_announced_fallback = False
_announced_gt_truncation = False


class _ProducerError:
    """Sentinel carrying a producer-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _resolve_decoder(cfg: Config, dataset) -> bool:
    """True -> use the native C++ fused front-end via ``dataset.get_raw``."""
    mode = getattr(cfg.data, "decoder", "auto")
    if mode not in ("auto", "native", "pil"):
        raise ValueError(
            f"unknown data.decoder {mode!r} (use 'auto', 'native' or 'pil')"
        )
    if mode == "pil":
        return False
    has_raw = hasattr(dataset, "get_raw")
    if mode == "native":
        from tpudet.native import native_available

        if not has_raw:
            raise ValueError(
                f"decoder='native' but {type(dataset).__name__} has no "
                "get_raw() (no JPEG source)"
            )
        if not native_available():
            raise RuntimeError(
                "decoder='native' but the native decoder failed to build"
            )
        return True
    if not has_raw:
        return False
    from tpudet.native import native_available

    return native_available()


class DataLoader:
    def __init__(
        self,
        cfg: Config,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        sharding=None,
        drop_last: bool = True,
        prefetch: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
        augment: bool = False,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.shuffle = shuffle
        self.seed = seed
        # Host-side train augmentation (the train CLI's loader): currently
        # data.scale_jitter. Deterministic per (seed, epoch, index), so every
        # process derives the identical factor for a given global row; the
        # canvas/bucket plan uses the UNJITTERED size and is unaffected.
        self.augment = augment
        jlo, jhi = cfg.data.scale_jitter
        if augment and (jlo, jhi) != (1.0, 1.0):
            if not 0.0 < jlo <= jhi:
                raise ValueError(
                    f"data.scale_jitter {(jlo, jhi)} must satisfy 0 < lo <= hi"
                )
        self.num_workers = num_workers
        self.sharding = sharding
        self.drop_last = drop_last
        # queue.Queue(maxsize=0) is UNBOUNDED — the opposite of "no
        # prefetch" — so clamp to at least one in-flight batch.
        self.prefetch = max(1, prefetch)
        # Multi-host input sharding: ``batch_size`` is the GLOBAL batch.
        # Every process computes the identical global batch plan (same
        # shuffle seed + dataset metadata — this includes the canvas-bucket
        # plan) and loads its disjoint strided batch_size/process_count rows
        # of every global batch; ``device_stream`` assembles the global
        # sharded array from the per-process rows. Defaults follow the JAX
        # runtime; single-host runs see 0/1 and are unaffected.
        if process_index is None or process_count is None:
            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = process_count
        self.global_batch_size = batch_size
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"global batch_size {batch_size} not divisible by "
                    f"process_count {process_count}"
                )
            if sharding is None:
                raise ValueError(
                    "multi-host loading (process_count > 1) needs a batch "
                    "sharding to assemble the global array"
                )
        self.batch_size = batch_size // process_count
        self._epoch0_plan = None  # memo for _epoch_batch_indices(0)
        if drop_last and len(dataset) < batch_size:
            # Every epoch would yield zero batches: batches() would return
            # instantly and device_stream's producer would spin through
            # epochs forever while the consumer blocks.
            raise ValueError(
                f"dataset yields {len(dataset)} examples — fewer than the "
                f"global batch size {batch_size}; reduce batch_size or pass "
                "drop_last=False"
            )
        if drop_last and self._bucketed and not self._epoch_batch_indices(0):
            # Bucketing partitions the epoch; drop_last then drops each
            # bucket's sub-batch remainder, so a dataset can exceed the
            # global batch size yet still plan ZERO batches (every bucket
            # smaller than one batch) — the same silent producer hang as
            # above. Bucket membership depends only on example H/W, never
            # the epoch shuffle, so checking epoch 0 decides all epochs.
            raise ValueError(
                f"canvas bucketing with drop_last plans zero batches: no "
                f"bucket holds a full global batch of {batch_size}; reduce "
                "batch_size, pass drop_last=False, or coarsen the buckets"
            )
        self.native_decode = _resolve_decoder(cfg, dataset)
        global _announced_native
        if self.native_decode and not _announced_native:
            _announced_native = True
            print(
                "loader: native C++ JPEG front-end enabled "
                f"(fast_dct_scale={getattr(cfg.data, 'fast_jpeg_scale', True)}"
                "; --set data.decoder=pil to disable)"
            )

    @property
    def _bucketed(self) -> bool:
        d = self.cfg.data
        return bool(getattr(d, "aspect_buckets", ())
                    or getattr(d, "orientation_buckets", False))

    def __len__(self) -> int:
        return len(self._epoch_batch_indices(0))

    def _epoch_order(self, epoch: int) -> np.ndarray:
        """GLOBAL epoch order — identical on every process (same seed)."""
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        return order

    def _epoch_batch_indices(self, epoch: int):
        """Per-epoch list of (index_array [bs], valid_mask|None) batch plans
        for THIS process.

        Planning is deterministic on the GLOBAL order with the GLOBAL batch
        size — every process computes the identical global plan (same seed,
        same dataset metadata), then takes its strided rows of every global
        batch. All processes therefore see the same batch count and canvas
        sequence per epoch and stay in lockstep at collectives — including
        with canvas bucketing, whose bucket composition would desynchronize
        hosts if each planned only its own slice (VERDICT r1 item 7).

        With bucketing (aspect_buckets / orientation_buckets) every batch is
        bucket-homogeneous, so the whole batch pads onto one static canvas;
        tail remainders of each bucket pad by repeating the bucket's last
        example (rows masked via the returned valid mask).

        The epoch-0 plan is memoized: it is deterministic in (seed, dataset),
        and three callers want it (the construction-time zero-plan guard,
        __len__, and the first epoch) — without the cache each pays the full
        O(N) example_hw pass."""
        if epoch == 0 and self._epoch0_plan is not None:
            return self._epoch0_plan
        from tpudet.data.preprocess import bucket_for_hw

        gbs = self.global_batch_size
        order = self._epoch_order(epoch)
        if not self._bucketed:
            groups = [order]
        else:
            if not hasattr(self.dataset, "example_hw"):
                raise ValueError(
                    "canvas bucketing needs dataset.example_hw(i)"
                )
            buckets = np.asarray([
                bucket_for_hw(self.cfg.data, *self.dataset.example_hw(int(i)))
                for i in order
            ])
            groups = [order[buckets == b] for b in np.unique(buckets)]

        plans = []  # global (idx [gbs], num_real)
        for g in groups:
            n_full = len(g) // gbs
            for b in range(n_full):
                plans.append((g[b * gbs : (b + 1) * gbs], gbs))
            rem = len(g) - n_full * gbs
            if rem and not self.drop_last:
                idx = np.concatenate([g[n_full * gbs:],
                                      np.full(gbs - rem, g[-1])])
                plans.append((idx, rem))
        if self.shuffle and len(groups) > 1:
            np.random.default_rng((self.seed + epoch) ^ 0x5EED).shuffle(plans)

        # This process's strided rows of every global batch. Row order within
        # the assembled global array is process-strided, which is fine: rows
        # are independent examples and every per-row field (including the
        # valid mask) is sliced identically, so rows stay self-consistent.
        pi, pc = self.process_index, self.process_count
        local = []
        for idx, num_real in plans:
            valid = None
            if num_real < gbs:
                valid = (np.arange(gbs) < num_real)[pi::pc]
            local.append((idx[pi::pc], valid))
        if epoch == 0:
            self._epoch0_plan = local
        return local

    def _jitter_factor(self, epoch: int, index: int) -> float:
        """Per-example scale-jitter factor — deterministic in (seed, epoch,
        dataset index), identical on every process, 1.0 when augmentation or
        jitter is off."""
        lo, hi = self.cfg.data.scale_jitter
        if not self.augment or (lo, hi) == (1.0, 1.0):
            return 1.0
        rng = np.random.default_rng([self.seed, epoch, index])
        return float(rng.uniform(lo, hi))

    def _make_batch(self, pool, indices, epoch: int = 0) -> Dict[str, np.ndarray]:
        def one(i):
            factor = self._jitter_factor(epoch, int(i))
            if self.native_decode:
                from tpudet.data.native_decode import NativeDecodeError

                ex = self.dataset.get_raw(int(i))
                try:
                    return prepare_example_jpeg(
                        self.cfg.data, ex["jpeg"], ex["boxes"], ex["classes"],
                        difficult=ex.get("difficult"),
                        crowd=ex.get("crowd"),
                        area=ex.get("area"),
                        masks=ex.get("masks"),
                        keypoints=ex.get("keypoints"),
                        semantic=ex.get("semantic"),
                        scale_factor=factor,
                    )
                except NativeDecodeError:
                    # libjpeg can't handle everything PIL can (e.g. CMYK/YCCK
                    # color conversion) — fall back per-image rather than
                    # killing the epoch. Other ValueErrors (bad config args)
                    # propagate: mass silent fallback would mask the bug.
                    global _announced_fallback
                    if not _announced_fallback:
                        _announced_fallback = True
                        print(
                            "loader: native decoder rejected an image "
                            f"(id={ex.get('id', i)!r}) — falling back to PIL "
                            "for such images"
                        )
            ex = self.dataset.get_example(int(i))
            return prepare_example(
                self.cfg.data, ex["image"], ex["boxes"], ex["classes"],
                difficult=ex.get("difficult"),
                crowd=ex.get("crowd"),
                area=ex.get("area"),
                masks=ex.get("masks"),
                keypoints=ex.get("keypoints"),
                semantic=ex.get("semantic"),
                scale_factor=factor,
            )
        examples = list(pool.map(one, indices))
        shapes = {tuple(ex["image"].shape) for ex in examples}
        if len(shapes) > 1:
            # Bucket planning keys off annotation-metadata dims
            # (dataset.example_hw) while decode picks the canvas from the
            # real pixels — a dataset whose metadata disagrees with its
            # files lands here. Name the offenders instead of dying in
            # np.stack (which, in the producer thread, used to hang).
            raise ValueError(
                "examples in one batch landed on different canvases "
                f"{sorted(shapes)} (dataset indices {list(indices)}) — "
                "annotation height/width metadata disagrees with the "
                "actual image files"
            )
        batch = {
            k: np.stack([ex[k] for ex in examples]) for k in examples[0]
        }
        # Dataset indices of each row (host-side bookkeeping: lets consumers
        # map detections back to dataset records, e.g. COCO-json export).
        batch["example_index"] = np.asarray(indices, np.int32)
        return batch

    def batches(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Host batches for one epoch (no device transfer)."""
        pool = ThreadPoolExecutor(self.num_workers)
        try:
            for idx, valid in self._epoch_batch_indices(epoch):
                batch = self._make_batch(pool, idx, epoch)
                if valid is not None:
                    # Tail batch padded by repeating an example; callers
                    # mask via "batch_valid".
                    batch["batch_valid"] = valid
                yield batch
        finally:
            # Non-blocking shutdown: abandoned generators (early break,
            # interpreter exit) must not join worker threads.
            pool.shutdown(wait=False, cancel_futures=True)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Endless device-prefetched stream over epochs 0, 1, 2, ..."""
        return self.device_stream()

    def device_stream(self, start_epoch: int = 0):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            epoch = start_epoch
            try:
                while not stop.is_set():
                    for batch in self.batches(epoch):
                        if self.process_count > 1:
                            # Each process holds its batch_size/process_count
                            # rows; assemble the global [global_batch, ...]
                            # sharded array from the per-process local rows.
                            dev = {
                                k: jax.make_array_from_process_local_data(
                                    self.sharding,
                                    v,
                                    (self.global_batch_size,) + v.shape[1:],
                                )
                                for k, v in batch.items()
                            }
                        else:
                            dev = jax.device_put(batch, self.sharding)
                        q.put(dev)
                        if stop.is_set():
                            return
                    epoch += 1
            except BaseException as e:  # noqa: BLE001
                # A silently dead producer means the consumer blocks on
                # q.get() forever (a corrupt image, a device_put OOM, a
                # canvas-shape mismatch...). Hand the exception to the
                # consumer thread instead.
                q.put(_ProducerError(e))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, _ProducerError):
                    raise RuntimeError(
                        "DataLoader producer thread failed"
                    ) from item.exc
                yield item
        finally:
            stop.set()
            # Drain so the producer can observe the stop flag.
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
