"""Metadata-driven example table.

Equivalent of the reference's DataTable (reference:
parakeet/datasets/data_table.py:23-151): a list-of-dicts metadata table with
per-field converters (e.g. ``np.load`` for feature paths) and an optional
in-memory cache.  Being framework-free numpy/host code, it pairs with the
bucketed batchers in ``parakeet_tpu.data.batch`` to feed jitted steps.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

__all__ = ["DataTable", "read_jsonl", "write_jsonl"]


def read_jsonl(path) -> List[Dict[str, Any]]:
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def write_jsonl(path, records: Sequence[Dict[str, Any]]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")


class DataTable:
    """A dataset view over a list of metadata dicts.

    Parameters
    ----------
    data : list of dicts (rows).
    fields : which keys to keep; default all keys of the first row.
    converters : optional per-field callables applied lazily at access
        time (e.g. ``{"speech": np.load}``).
    use_cache : cache converted examples in memory.
    """

    def __init__(self,
                 data: Sequence[Dict[str, Any]],
                 fields: Optional[Sequence[str]] = None,
                 converters: Optional[Dict[str, Callable]] = None,
                 use_cache: bool = False):
        if not data:
            raise ValueError("data should not be empty")
        self.data = list(data)
        self.fields = list(fields) if fields is not None else list(
            self.data[0].keys())
        self.converters = dict(converters or {})
        self.use_cache = use_cache
        self._cache: Dict[int, Dict[str, Any]] = {}

    @classmethod
    def from_jsonl(cls, path, **kwargs) -> "DataTable":
        return cls(read_jsonl(path), **kwargs)

    def _convert(self, row: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for name in self.fields:
            value = row[name]
            conv = self.converters.get(name)
            out[name] = conv(value) if conv is not None else value
        return out

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if self.use_cache and idx in self._cache:
            return self._cache[idx]
        example = self._convert(self.data[idx])
        if self.use_cache:
            self._cache[idx] = example
        return example

    def __len__(self) -> int:
        return len(self.data)
