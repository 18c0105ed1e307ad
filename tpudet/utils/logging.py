"""Metrics logging (SURVEY.md C21, §5 observability).

The jitted step returns a metrics dict (no host callbacks inside the step —
device→host happens once per log interval here, off the critical path). Sinks:
stdout, CSV, and TensorBoard event files when TF is importable (parity with
the reference's tf.summary scalars)."""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, logdir: Optional[str] = None, use_tensorboard: bool = True):
        self.logdir = logdir
        self._csv_file = None
        self._csv = None
        self._csv_fields = None
        self._tb = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._csv_file = open(
                os.path.join(logdir, "metrics.csv"), "a", newline=""
            )
            if use_tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(logdir)
                except Exception:
                    self._tb = None
        self._t0 = time.time()
        self._last: Dict[str, tuple] = {}  # prefix -> (step, time)

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        metrics = {k: float(v) for k, v in metrics.items()}
        now = time.time()
        last = self._last.get(prefix)
        if last is not None and step > last[0]:
            dt = (now - last[1]) / (step - last[0])
            metrics["steps_per_sec"] = 1.0 / dt if dt > 0 else 0.0
        self._last[prefix] = (step, now)

        parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
        print(f"[{prefix} step {step}] {parts}", flush=True)

        if self._csv_file:
            row = {"step": step, **metrics}
            if self._csv is None:
                self._csv_fields = ["step"] + sorted(metrics.keys())
                self._csv = csv.DictWriter(
                    self._csv_file, fieldnames=self._csv_fields,
                    extrasaction="ignore",
                )
                if self._csv_file.tell() == 0:
                    self._csv.writeheader()
            self._csv.writerow(row)
            self._csv_file.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"{prefix}/{k}", v, step=step)
            self._tb.flush()

    def log_image(self, step: int, name: str, image) -> None:
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.image(name, image[None], step=step)

    def close(self):
        if self._csv_file:
            self._csv_file.close()
