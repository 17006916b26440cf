"""Pytree checkpointing with a snapshot ring.

One checkpoint format for the whole framework (the reference carries two:
.pdz archives + step-N.pdparams, SURVEY §5.4; reference:
parakeet/training/extensions/snapshot.py:36-111, parakeet/utils/
checkpoint.py:31-127).  Design:

- a checkpoint is a single ``.npz`` holding the flattened pytree (arrays)
  plus a JSON sidecar entry for scalars/metadata — multihost-safe because
  only process 0 writes, and device arrays are pulled to host first.
- ``records.jsonl`` is the ring ledger: newest-last records with path,
  iteration, timestamp; ``max_size`` newest snapshots are kept.
- resume = read newest record, load, return the pytree with the original
  structure (the caller supplies a template for structure/dtype).
"""
from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

__all__ = [
    "load_variables","flatten_tree", "unflatten_tree", "save_pytree", "load_pytree",
           "SnapshotRing", "latest_record", "resolve_record_path"]

_SEP = "::"


def _leaf_to_host(leaf) -> np.ndarray:
    """Leaf -> full (global-shape) host ndarray, whatever its sharding.

    Checkpoints are topology-free: a TP/PP-sharded train state saves as
    the gathered global arrays, so a snapshot written under one mesh
    resumes under any other (re-placement happens on load, see
    StandardUpdater.load).  Fully-addressable arrays (single process,
    incl. sharded-over-local-devices) gather via ``np.asarray``; multi-
    host-sharded leaves all-gather across processes first.
    """
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils
        leaf = multihost_utils.process_allgather(leaf, tiled=True)
    return np.asarray(leaf)


def flatten_tree(tree) -> Dict[str, np.ndarray]:
    """Pytree -> {path::to::leaf: full host ndarray} (gathers shards)."""
    flat: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_key_str(k) for k in path)
        flat[key] = _leaf_to_host(leaf)
    return flat


def _key_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def nest_flat(flat: Dict[str, np.ndarray]) -> Dict[str, any]:
    """Flat {a::b::c: arr} -> nested dicts (no template needed).

    Non-dict pytree nodes (TrainState fields, tuples) come back as plain
    dicts keyed by field name / index — good enough for loading params for
    inference without reconstructing the exact TrainState type.
    """
    nested: Dict[str, any] = {}
    for key, value in flat.items():
        node = nested
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return nested


def unflatten_tree(template, flat: Dict[str, np.ndarray]):
    """Rebuild a pytree shaped like ``template`` from flattened arrays."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = _SEP.join(_key_str(k) for k in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        value = flat[key]
        if hasattr(leaf, "dtype"):
            value = value.astype(leaf.dtype)
            if value.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {key!r}: checkpoint "
                    f"{value.shape} vs template {leaf.shape}")
        leaves.append(value)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_pytree(path, tree, metadata: Optional[dict] = None) -> None:
    """Atomically save a pytree (+ JSON metadata) to ``path`` (.npz).

    Multi-process safe: ``flatten_tree``'s gather is a collective, so
    EVERY process must call this; only process 0 then writes the file
    (the reference's rank-0-IO discipline, utils/mp_tools.py) — two
    processes on one host would otherwise race on the same tmp path.
    """
    path = Path(path)
    flat = flatten_tree(tree)          # collective (process_allgather)
    if jax.process_index() != 0:
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    flat["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_pytree(path, template=None):
    """Load (tree-or-flat-dict, metadata) from ``path``.

    With a ``template`` the original pytree structure is restored;
    otherwise the flat {key: array} dict is returned.
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    meta_raw = flat.pop("__metadata__", None)
    metadata = (json.loads(bytes(meta_raw.tobytes()).decode())
                if meta_raw is not None else {})
    if template is not None:
        return unflatten_tree(template, flat), metadata
    return flat, metadata


def resolve_record_path(record: dict, directory) -> str:
    """A record's snapshot path, resolved against ``directory``.

    Records store the snapshot filename relative to the checkpoint
    directory so an experiment dir can be copied or moved wholesale
    (absolute paths from older ledgers still resolve as-is)."""
    p = Path(record["path"])
    return str(p if p.is_absolute() else Path(directory) / p)


def latest_record(directory) -> Optional[dict]:
    """Newest record from ``records.jsonl`` in ``directory`` (or None;
    the record's ``path`` is resolved against ``directory``)."""
    records_path = Path(directory) / "records.jsonl"
    if not records_path.exists():
        return None
    last = None
    with open(records_path) as f:
        for line in f:
            line = line.strip()
            if line:
                last = json.loads(line)
    if last is not None:
        last["path"] = resolve_record_path(last, directory)
    return last


class SnapshotRing:
    """Keeps the ``max_size`` newest snapshots + a records.jsonl ledger."""

    def __init__(self, directory, max_size: int = 5,
                 prefix: str = "snapshot_iter_"):
        self.directory = Path(directory)
        self.max_size = max_size
        self.prefix = prefix
        self.records: List[dict] = []
        records_path = self.directory / "records.jsonl"
        if records_path.exists():
            with open(records_path) as f:
                self.records = [json.loads(l) for l in f if l.strip()]

    def path_for(self, iteration: int) -> Path:
        return self.directory / f"{self.prefix}{iteration}.npz"

    def save(self, iteration: int, tree, metadata: Optional[dict] = None
             ) -> Path:
        path = self.path_for(iteration)
        meta = dict(metadata or {})
        meta["iteration"] = iteration
        save_pytree(path, tree, meta)
        self.register(path, iteration)
        return path

    def register(self, path, iteration: int) -> None:
        """Record an externally written snapshot and prune the ring.

        The ledger stores the path relative to the ring directory when
        possible, so experiment dirs stay relocatable."""
        path = Path(path)
        try:
            stored = str(path.resolve().relative_to(
                self.directory.resolve()))
        except ValueError:
            stored = str(path)
        self.records.append({
            "time": time.time(),
            "path": stored,
            "iteration": iteration,
        })
        while len(self.records) > self.max_size:
            victim = self.records.pop(0)
            try:
                os.unlink(resolve_record_path(victim, self.directory))
            except FileNotFoundError:
                pass
        self._write_records()

    def _write_records(self) -> None:
        self.directory.mkdir(parents=True, exist_ok=True)
        tmp = self.directory / "records.jsonl.tmp"
        with open(tmp, "w") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, self.directory / "records.jsonl")

    def latest(self) -> Optional[dict]:
        """Newest record with its ``path`` resolved to a usable path."""
        if not self.records:
            return None
        rec = dict(self.records[-1])
        rec["path"] = resolve_record_path(rec, self.directory)
        return rec


def load_variables(path):
    """Checkpoint -> flax variables dict for inference.

    Returns {"params": ..., possibly "batch_stats": ...}; unwraps a
    {"generator": ...} GAN sub-dict (the Snapshot format stores the
    whole train state, inference wants one network — the analog of the
    reference pulling e.g. ["generator_params"],
    examples/fastspeech2/baker/synthesize_e2e.py:36-42).
    """
    flat, _ = load_pytree(path)
    tree = nest_flat(flat)
    params = tree.get("params", tree)
    if isinstance(params, dict) and "generator" in params:
        params = params["generator"]
    variables = {"params": params}
    if "batch_stats" in tree:
        variables["batch_stats"] = tree["batch_stats"]
    return variables
