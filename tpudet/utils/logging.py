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
        self._csv_path = None
        self._csv_fields: list = []
        self._csv_rows: list = []
        self._tb = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._csv_path = os.path.join(logdir, "metrics.csv")
            # Resume: absorb an existing file so a changed column set
            # rewrites cleanly instead of appending misaligned rows.
            if os.path.exists(self._csv_path):
                with open(self._csv_path, newline="") as f:
                    reader = csv.DictReader(f)
                    self._csv_rows = [dict(r) for r in reader]
                    self._csv_fields = list(reader.fieldnames or [])
            if use_tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(logdir)
                except Exception:
                    self._tb = None
        self._t0 = time.time()
        self._last: Dict[str, tuple] = {}  # prefix -> (step, time)

    def _write_csv(self, row: Dict[str, object]) -> None:
        """Append a row; columns grow over time (e.g. steps_per_sec appears
        on the second call, eval/ metrics at the first eval interval), so new
        keys extend the header and rewrite the file rather than being
        silently dropped."""
        new = [k for k in row if k not in self._csv_fields]
        self._csv_rows.append(row)
        if new:
            fields = set(self._csv_fields) | set(row)
            self._csv_fields = (
                (["step"] if "step" in fields else [])
                + sorted(fields - {"step"})
            )
            with open(self._csv_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_fields, restval="")
                w.writeheader()
                w.writerows(self._csv_rows)
        else:
            with open(self._csv_path, "a", newline="") as f:
                csv.DictWriter(
                    f, fieldnames=self._csv_fields, restval=""
                ).writerow(row)

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

        if self._csv_path:
            # Non-train prefixes get prefixed columns so an eval row is
            # distinguishable from a train row sharing the same step.
            key = (lambda k: k) if prefix == "train" else (
                lambda k: f"{prefix}/{k}"
            )
            self._write_csv({"step": step,
                             **{key(k): v for k, v in metrics.items()}})
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
        pass  # CSV writes are flushed per row; TB writers flush per log
