"""Training metrics logging.

wandb-compatible surface (reference logs through wandb, train.py:140-151):
if wandb is importable and enabled it is used; otherwise metrics stream to a
JSONL file + stdout so headless runs keep full observability.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, project: str = "vnl_tpu", run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None,
                 out_dir: str = "./logs", use_wandb: bool = True):
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project, name=run_name, config=config)
            except Exception:
                self._wandb = None
        os.makedirs(out_dir, exist_ok=True)
        stamp = run_name or time.strftime("%Y%m%d-%H%M%S")
        self._path = os.path.join(out_dir, f"metrics_{stamp}.jsonl")
        self._f = open(self._path, "a")
        if config is not None:
            self._f.write(json.dumps({"_config": _jsonable(config)}) + "\n")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        record = {"_step": step, **_jsonable(metrics)}
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def _jsonable(d: Any) -> Any:
    if isinstance(d, dict):
        return {k: _jsonable(v) for k, v in d.items()}
    if isinstance(d, (list, tuple)):
        return [_jsonable(v) for v in d]
    try:
        return float(d)
    except (TypeError, ValueError):
        return str(d)
