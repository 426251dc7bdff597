"""Streaming columnar run logger.

Produces the artifact layout the evaluation tooling expects —
``<results>/logs/<stamp>_<name>/{data.npz, data.csv, meta.json}`` (same
on-disk contract as the reference's src/utils/logging.py) — but with a
different engine: instead of buffering row dicts and post-processing at
save(), the schema is frozen on the first `log()` call, each channel gets a
preallocated numpy column that grows geometrically, and the CSV is written
*incrementally* as rows arrive (so a killed run still leaves a usable CSV).
This suits long TPU ensemble sweeps where buffering every python row dict
for 10^5 ticks is wasteful.
"""

from __future__ import annotations

import csv
import json
import time
from dataclasses import asdict, is_dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

_CSV_VEC_MAX = 10   # 1-D vectors up to this size widen into per-index columns


def jsonable(x: Any) -> Any:
    """Recursively coerce to something json.dump accepts."""
    if isinstance(x, (np.integer, np.floating, np.bool_)):
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    if is_dataclass(x) and not isinstance(x, type):
        return jsonable(asdict(x))
    if isinstance(x, dict):
        return {str(k): jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [jsonable(v) for v in x]
    if isinstance(x, Path):
        return str(x)
    if x is None or isinstance(x, (str, int, float, bool)):
        return x
    return str(x)


class _Column:
    """A single logged channel: growable numpy storage + CSV cell policy."""

    def __init__(self, name: str, first: Any):
        self.name = name
        if isinstance(first, np.ndarray):
            self.shape = first.shape
            self.dtype = (first.dtype if first.dtype.kind in "fiub"
                          else np.dtype(object))
        elif isinstance(first, (bool, int, float, np.generic)):
            self.shape = ()
            self.dtype = np.dtype(float)
        else:
            self.shape = ()
            self.dtype = np.dtype(object)
        self.widen = (len(self.shape) == 1 and self.shape[0] <= _CSV_VEC_MAX
                      and self.dtype != object)
        self._n = 0
        cap = 1024
        if self.dtype == object:
            self._buf: Any = []
        else:
            self._buf = np.empty((cap,) + self.shape, dtype=self.dtype)

    def csv_header(self) -> list:
        if self.widen:
            return [f"{self.name}[{i}]" for i in range(self.shape[0])]
        return [self.name]

    def csv_cells(self, value: Any) -> list:
        if self.widen:
            return list(np.asarray(value).reshape(-1))
        if isinstance(value, np.ndarray):
            return [jsonable(value)]
        return [value]

    def push(self, value: Any) -> None:
        if self.dtype == object:
            self._buf.append(jsonable(value))
            self._n += 1
            return
        if self._n == len(self._buf):
            grown = np.empty((2 * len(self._buf),) + self.shape, self.dtype)
            grown[: self._n] = self._buf
            self._buf = grown
        self._buf[self._n] = value
        self._n += 1

    def array(self) -> np.ndarray:
        if self.dtype == object:
            return np.array(self._buf, dtype=object)
        return self._buf[: self._n]


class RunLogger:
    """log(**channels) per tick; save() finalizes npz + meta (CSV streams)."""

    def __init__(self, run_name: str, results_dir: Path | str = "results",
                 notes: Optional[Dict[str, Any]] = None,
                 overwrite: bool = False):
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self.results_dir = Path(results_dir)
        self.logs_dir = self.results_dir / "logs"
        self.run_dir = self.logs_dir / f"{stamp}_{run_name}"
        if self.run_dir.exists() and not overwrite:
            raise FileExistsError(f"Run dir exists: {self.run_dir}")
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.meta: Dict[str, Any] = {
            "run_name": run_name, "timestamp": stamp,
            "notes": jsonable(notes or {}),
        }
        self._schema: Optional[list[str]] = None       # frozen key order
        self._cols: Dict[str, _Column] = {}
        self._csv_file = None
        self._csv = None
        self._n_rows = 0

    # artifact paths (stable contract consumed by plots/tests)
    @property
    def path_npz(self) -> Path:
        return self.run_dir / "data.npz"

    @property
    def path_csv(self) -> Path:
        return self.run_dir / "data.csv"

    @property
    def path_meta(self) -> Path:
        return self.run_dir / "meta.json"

    def _freeze_schema(self, row: Dict[str, Any]) -> None:
        self._schema = sorted(row.keys())
        header: list[str] = []
        for k in self._schema:
            col = _Column(k, row[k])
            self._cols[k] = col
            header.extend(col.csv_header())
        self._csv_file = open(self.path_csv, "w", newline="")
        self._csv = csv.writer(self._csv_file)
        self._csv.writerow(header)

    def log(self, **row: Any) -> None:
        if self._schema is None:
            self._freeze_schema(row)
        cells: list = []
        for k in self._schema:
            v = row.get(k)
            self._cols[k].push(v)
            cells.extend(self._cols[k].csv_cells(v))
        self._csv.writerow(cells)
        self._n_rows += 1

    def set_meta(self, **kwargs: Any) -> None:
        self.meta.update(jsonable(kwargs))

    def save(self) -> None:
        with open(self.path_meta, "w") as f:
            json.dump(self.meta, f, indent=2)
        if self._csv_file is not None:
            self._csv_file.flush()
        if self._n_rows == 0:
            return
        np.savez_compressed(
            self.path_npz, **{k: c.array() for k, c in self._cols.items()})

    def close(self) -> None:
        if self._csv_file is not None:
            self._csv_file.close()
            self._csv_file = None

    def __del__(self):  # best-effort handle release
        try:
            self.close()
        except Exception:
            pass
