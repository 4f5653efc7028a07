"""Run directory management.

Auto-numbered run directories, parity with the reference's
``get_next_log_name`` (reference tf2_0/src/utils.py:79-83: next integer
prefix under a base dir)."""
from __future__ import annotations

import os


def next_run_dir(base_dir: str, prefix: str = "run") -> str:
    """Next unused '<base>/<prefix><N>' path (N = max existing + 1)."""
    os.makedirs(base_dir, exist_ok=True)
    max_n = 0
    for name in os.listdir(base_dir):
        if name.startswith(prefix):
            suffix = name[len(prefix):].split("_")[0]
            if suffix.isdigit():
                max_n = max(max_n, int(suffix))
    return os.path.join(base_dir, f"{prefix}{max_n + 1}")
