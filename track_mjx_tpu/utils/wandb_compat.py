"""wandb compatibility layer.

The reference logs to Weights & Biases (track_mjx/agent/wandb_logging.py,
train.py:269-276). This module re-exports the real `wandb` when it is
installed; otherwise it provides a local drop-in that records scalar logs to
a JSONL file and keeps the same API surface used by the framework
(init/log/run.id/Video/Table/plot.line/finish), so training runs are fully
observable on machines without wandb or egress.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Optional

try:  # pragma: no cover - depends on environment
    import wandb as _real_wandb

    wandb = _real_wandb
    USING_REAL_WANDB = True
except Exception:  # ModuleNotFoundError or broken install
    USING_REAL_WANDB = False

    class _Run:
        def __init__(self, run_id: str, dir_: Path):
            self.id = run_id
            self.dir = str(dir_)

    class _Video:
        def __init__(self, path: str, format: str = "mp4", **kw):
            self.path = path
            self.format = format

        def to_json(self):
            return {"_type": "video-file", "path": self.path}

    class _Table:
        def __init__(self, data=None, columns=None, **kw):
            self.data = data or []
            self.columns = columns or []

        def to_json(self):
            return {"_type": "table", "columns": self.columns, "nrows": len(self.data)}

    class _Plot:
        @staticmethod
        def line(table, x, y, title=""):
            return {"_type": "line-plot", "x": x, "y": y, "title": title}

        @staticmethod
        def scatter(table, x, y, title=""):
            return {"_type": "scatter-plot", "x": x, "y": y, "title": title}

    def _jsonable(v: Any):
        if hasattr(v, "to_json"):
            return v.to_json()
        if isinstance(v, dict):
            return {k: _jsonable(x) for k, x in v.items()}
        if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            return v.item()
        if isinstance(v, (int, float, str, bool, type(None))):
            return v
        try:
            import numpy as np

            if isinstance(v, np.ndarray):
                return v.tolist() if v.size <= 64 else f"<array {v.shape}>"
        except Exception:
            pass
        return str(v)

    class _LocalWandb:
        """Minimal local stand-in for the wandb module."""

        def __init__(self):
            self.run: Optional[_Run] = None
            self._file = None
            self._pending: dict = {}
            self.Video = _Video
            self.Table = _Table
            self.plot = _Plot()

        def init(
            self,
            project: str = "local",
            config: Any = None,
            id: Optional[str] = None,
            resume: str = "allow",
            group: str = "",
            notes: str = "",
            dir: Optional[str] = None,
            **kw,
        ):
            run_id = id or time.strftime("%y%m%d_%H%M%S")
            out_dir = Path(dir or "wandb_local") / project / run_id
            out_dir.mkdir(parents=True, exist_ok=True)
            self.run = _Run(run_id, out_dir)
            mode = "a" if resume in ("must", "allow") else "w"
            self._file = open(out_dir / "metrics.jsonl", mode)
            if config is not None:
                with open(out_dir / "config.json", "w") as f:
                    json.dump(_jsonable(config), f, indent=2, default=str)
            return self.run

        def log(self, metrics: dict, commit: bool = True, step: Optional[int] = None):
            self._pending.update({k: _jsonable(v) for k, v in metrics.items()})
            if commit:
                record = {"_timestamp": time.time(), **self._pending}
                if step is not None:
                    record["_step"] = step
                if self._file is not None:
                    self._file.write(json.dumps(record, default=str) + "\n")
                    self._file.flush()
                self._pending = {}

        def finish(self):
            if self._pending:
                self.log({}, commit=True)
            if self._file is not None:
                self._file.close()
                self._file = None

    wandb = _LocalWandb()
