"""Structured per-step metrics (the reference's stdout "2"/"3"/"DT"/"Error"
prints, ``fluid.cc:1383-1502`` / ``mpm.cc:1315-1428``, as machine-readable
JSONL plus human-readable console lines)."""

from __future__ import annotations

import json
import sys
import time
from typing import IO


class MetricsLogger:
    def __init__(self, path: str | None = None, echo: bool = True,
                 echo_every: int = 1):
        if path:
            import os
            parent = os.path.dirname(os.path.abspath(path))
            os.makedirs(parent, exist_ok=True)
        self._fh: IO | None = open(path, "a") if path else None
        self._echo = echo
        self._every = max(1, echo_every)
        self._t0 = time.time()

    def log(self, frame: int, metrics: dict):
        rec = {"frame": frame, "wall_time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            if hasattr(v, "ndim") and v.ndim == 0:
                rec[k] = float(v)
            elif isinstance(v, (int, float, str, bool)):
                rec[k] = v
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._echo and frame % self._every == 0:
            bits = " ".join(f"{k}={rec[k]:.5g}" if isinstance(rec[k], float)
                            else f"{k}={rec[k]}"
                            for k in ("dt", "error", "outer_iters", "cg_iters",
                                      "kinetic_energy", "max_speed")
                            if k in rec)
            print(f"frame {frame:4d} [{rec['wall_time']:8.1f}s] {bits}",
                  file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
