"""Device mesh and sharding helpers (SPMD).

The TPU-native replacement for the reference's distributed surface —
paddle.DataParallel + dist.spawn + NCCL allreduce (reference:
examples/fastspeech2/train.py:53,136,208; SURVEY §2.9).  Instead of process
spawning and wrapped modules, we build a ``jax.sharding.Mesh`` and annotate
shardings: parameters replicated, batch sharded over the ``data`` axis.
XLA inserts the gradient all-reduce over ICI automatically; the same code
scales to multihost via ``jax.distributed.initialize`` + DCN.

A ``model`` axis is provisioned for tensor parallelism of larger models;
with mesh shape (N, 1) the behavior is pure DP.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_sharding",
           "rank_zero_only", "process_index", "local_batch_slice",
           "fs2_tp_spec", "transformer_tp_spec", "shard_params_by_rule",
           "pp_stack_spec", "fs2_tp_pp_spec"]


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None,
              pipe: Optional[int] = None) -> Mesh:
    """Build a ('data', 'model') mesh; data=-1 uses all remaining devices.

    ``pipe`` adds a third axis for composed TP x PP runs — mesh shape
    (data, model, pipe): tensor parallelism auto-partitions over
    'model' while the pipeline runner is manual over 'pipe' (partial-
    manual shard_map, see parallel/pipeline.py)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    p = pipe or 1
    if data == -1:
        if n % (model * p):
            raise ValueError(
                f"{n} devices not divisible by model={model} x pipe={p}")
        data = n // (model * p)
    if data * model * p > n:
        raise ValueError(f"mesh {data}x{model}x{p} > {n} devices")
    devices = devices[:data * model * p]  # e.g. --dp 2 on an 8-device host
    if pipe is None:
        dev_array = np.asarray(devices).reshape(data, model)
        return Mesh(dev_array, axis_names=("data", "model"))
    dev_array = np.asarray(devices).reshape(data, model, p)
    return Mesh(dev_array, axis_names=("data", "model", "pipe"))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch: leading axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Place a batch pytree with the leading axis sharded over 'data'.

    Every array's first dimension must be divisible by the data axis size.
    """
    sharding = data_parallel_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), sharding), batch)


def process_index() -> int:
    return jax.process_index()


def rank_zero_only(fn):
    """Decorator: run only on process 0 (reference: utils/mp_tools.py:21)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if jax.process_index() == 0:
            return fn(*args, **kwargs)
        return None
    return wrapper


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of a globally-sharded batch (multihost input)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


# ---- tensor parallelism -----------------------------------------------

def transformer_tp_spec(path: str, leaf) -> P:
    """PartitionSpec for any ESPnet-style transformer param by its
    '/'-joined path: attention heads and FFN hidden dims shard over the
    'model' axis, everything else is replicated.

    Megatron-style column/row split per transformer block: q/k/v project
    onto sharded heads (column), the out-projection contracts them back
    (row, XLA inserts the all-reduce); the positionwise hidden dim
    expands (column) then contracts (row) — both the conv flavor
    (MultiLayerConv, FastSpeech2/SpeedySpeech-style) and the linear
    flavor ('ff' PositionwiseFeedForward, TransformerTTS encoder +
    decoder self/src attention blocks).
    """
    if "self_attn" in path or "src_attn" in path:
        if path.endswith(("q/kernel", "k/kernel", "v/kernel")):
            return P(None, "model", None)     # (in, heads, dk)
        if path.endswith(("q/bias", "k/bias", "v/bias")):
            return P("model", None)           # (heads, dk)
        if path.endswith("out/kernel"):
            return P("model", None, None)     # (heads, dk, feat)
    if "MultiLayerConv" in path:
        if path.endswith("Conv_0/kernel"):
            return P(None, None, "model")     # (k, in, hidden)
        if path.endswith("Conv_0/bias"):
            return P("model")
        if path.endswith("Conv_1/kernel"):
            return P(None, "model", None)     # (k, hidden, in)
    if "/ff/" in path:
        if path.endswith("Dense_0/kernel"):
            return P(None, "model")           # (in, hidden)
        if path.endswith("Dense_0/bias"):
            return P("model")
        if path.endswith("Dense_1/kernel"):
            return P("model", None)           # (hidden, in)
    return P()


# FastSpeech2's params are a subset of the generic transformer layout
fs2_tp_spec = transformer_tp_spec


# ---- pipeline parallelism ----------------------------------------------

def pp_stack_spec(path: str, leaf) -> P:
    """PartitionSpec for pipeline-parallel training state: the
    depth-stacked transformer layer params (and their optimizer
    moments — same path suffix) shard their leading L dim over the
    'model' axis, matching the pipeline runner's shard_map in_specs so
    no resharding happens at the stage boundary each step.  Everything
    else replicates."""
    if "/layers/" in path:
        return P("model")
    return P()


def fs2_tp_pp_spec(path: str, leaf) -> P:
    """PartitionSpec rule for composed TP x PP training state on a
    3-axis ('data', 'model', 'pipe') mesh: depth-stacked layer params
    shard their leading L dim over 'pipe' AND their head/FFN-hidden
    dims over 'model' (the per-layer :func:`fs2_tp_spec`, shifted one
    dim right by the stack); everything else follows plain TP."""
    if "/layers/" in path:
        return P("pipe", *fs2_tp_spec(path, leaf))
    return fs2_tp_spec(path, leaf)


def shard_params_by_rule(params, mesh: Mesh, rule) -> dict:
    """device_put each param with the PartitionSpec from rule(path, leaf)."""

    def place(path_entries, leaf):
        path = "/".join(getattr(p, "key", str(p)) for p in path_entries)
        return jax.device_put(leaf, NamedSharding(mesh, rule(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)
