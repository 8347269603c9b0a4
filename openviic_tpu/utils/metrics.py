"""Structured training metrics + profiler hooks.

The reference's only observability is tqdm running-loss postfixes
(trainers/vi_trainer.py:104,117).  Here (SURVEY.md §5): per-step scalars
(loss, lr, reward, captions/sec) appended to a ``metrics.jsonl`` in the
checkpoint dir, optional TensorBoard mirroring, and ``jax.profiler`` trace
capture around a configurable step window (Perfetto/XPlane dump usable in
TensorBoard's profile tab).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, output_dir: str, tensorboard: bool = False,
                 enabled: bool = True):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        # enabled=False (non-zero hosts in multi-host runs): keep the API
        # but write nothing — one writer per shared run directory
        self._file = open(self.path if enabled else os.devnull, "a", buffering=1)
        self._tb = None
        if tensorboard and enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(output_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float], prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time()}
        for key, value in scalars.items():
            name = f"{prefix}{key}" if prefix else key
            record[name] = float(value)
            if self._tb is not None:
                self._tb.add_scalar(name, float(value), int(step))
        self._file.write(json.dumps(record) + "\n")

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Throughput meter: captions (or tokens) per second over a window."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._items = 0

    def update(self, n_items: int) -> None:
        self._items += n_items

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._items / dt if dt > 0 else 0.0


class Profiler:
    """jax.profiler trace capture for steps [start, stop)."""

    def __init__(self, output_dir: str, start_step: int = 10, num_steps: int = 5):
        self.output_dir = os.path.join(output_dir, "profile")
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def step(self, step: int) -> None:
        import jax

        if step == self.start_step and not self._active:
            os.makedirs(self.output_dir, exist_ok=True)
            jax.profiler.start_trace(self.output_dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


def maybe_enable_nan_checks(enabled: bool) -> None:
    """Debug-NaN flag (SURVEY.md §5: checkify/NaN checks behind config)."""
    if enabled:
        import jax

        jax.config.update("jax_debug_nans", True)
