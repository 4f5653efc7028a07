"""Profiling hooks (the reference has none — SURVEY.md section 5).

``profile_trace`` wraps a code region in a jax.profiler trace whose output
can be loaded in TensorBoard/XProf (works on TPU and the CPU test backend).
"""
from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Context manager: when log_dir is set, capture a profiler trace of the
    enclosed region into <log_dir>/plugins/profile/..."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
