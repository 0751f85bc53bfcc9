"""Gated wandb integration (reference uses ezpz.setup_wandb + History,
src/swift/train.py:151-152, trainer.py:125,466-476).

wandb is optional: everything degrades to a no-op when the package is
missing or ``WANDB_DISABLED`` is set, so training never depends on it.
``History`` also keeps an in-memory metric history (the ezpz.History
equivalent) and can dump it to jsonl at the end of a run.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Optional


def _wandb():
    if os.environ.get("WANDB_DISABLED"):
        return None
    try:
        import wandb

        return wandb
    except ImportError:
        return None


def setup_wandb(project_name: str, config: Optional[dict] = None, **kwargs):
    """Init a wandb run on the main process; returns the run or None."""
    from swift_tpu.utils.io import is_main_process

    wb = _wandb()
    if wb is None or not is_main_process():
        return None
    return wb.init(project=project_name, config=config, **kwargs)


class History:
    """Metric history: accumulates locally, mirrors to wandb when active."""

    def __init__(self):
        self._data: dict[str, list] = defaultdict(list)

    def update(self, metrics: dict, precision: int = 4, summarize: bool = False) -> str:
        wb = _wandb()
        if wb is not None and wb.run is not None:
            wb.log(metrics)
        parts = []
        for k, v in metrics.items():
            self._data[k].append(v)
            if isinstance(v, float):
                parts.append(f"{k}={v:.{precision}g}")
            else:
                parts.append(f"{k}={v}")
        return " ".join(parts)

    def finalize(self, outdir: str, fname: str = "history") -> str:
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, f"{fname}.json")
        with open(path, "w") as f:
            json.dump({k: v for k, v in self._data.items()}, f)
        return path
