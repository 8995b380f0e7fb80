"""Logging + lightweight step tracing.

Replaces the reference's rank0_print/build_logger (llava/utils.py:116-203)
and the commented-out StepTimingCallback (train.py:1842-1889) with working
equivalents; `trace_step` wraps jax.profiler regions so xprof captures get
named spans.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time
from typing import Dict, Optional

import jax

_handler_installed = False


def is_main_process() -> bool:
    return jax.process_index() == 0


def rank0_print(*args, **kwargs) -> None:
    if is_main_process():
        print(*args, **kwargs)


def build_logger(name: str, filename: Optional[str] = None) -> logging.Logger:
    global _handler_installed
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not _handler_installed:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(
            "%(asctime)s | %(levelname)s | %(name)s | %(message)s"))
        logger.addHandler(h)
        if filename:
            os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
            fh = logging.FileHandler(filename)
            fh.setFormatter(h.formatter)
            logger.addHandler(fh)
        _handler_installed = True
    return logger


class StepTimer:
    """Wall-time breakdown per step (data / compute / total) with EMA."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.times: Dict[str, float] = {}
        self._start: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            prev = self.times.get(name)
            self.times[name] = dt if prev is None else self.ema * prev + (1 - self.ema) * dt

    def summary(self) -> Dict[str, float]:
        return {k: round(v, 4) for k, v in self.times.items()}


@contextlib.contextmanager
def trace_step(name: str):
    """Named profiler span (shows up in xprof / tensorboard traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_profiler() -> None:
    jax.profiler.stop_trace()


class MetricsLogger:
    """JSONL metrics stream + optional wandb (reference: --report_to wandb)."""

    def __init__(self, out_dir: str, use_wandb: bool = False, run_name: str = ""):
        self.path = os.path.join(out_dir, "metrics.jsonl")
        os.makedirs(out_dir, exist_ok=True)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project="mavlm_tpu", name=run_name or None)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict) -> None:
        if not is_main_process():
            return
        rec = {"step": step}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(rec, step=step)
