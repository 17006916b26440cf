"""Pipeline parallelism (GPipe-style) over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md 2.9: DP only).
This is the additive TPU-native scaling mode completing the DP/TP/SP
set: a depth-stacked run of identical layers is split into
contiguous *stages* over a mesh axis, and microbatches stream through
the stages so all devices compute concurrently (modulo the pipeline
fill/drain bubble of (S-1)/(M+S-1) for S stages and M microbatches).

Mechanics (inside ``shard_map``):

- layer parameters are depth-stacked — every leaf has leading dim L —
  and sharded over the pipe axis, L/S contiguous layers per device;
- one ``lax.scan`` runs M+S-1 steps; each step applies this stage's
  layers to its resident microbatch, then ``ppermute``s the activation
  one hop down the ring.  Stage 0 injects microbatch t at step t; the
  last stage's outputs from steps S-1.. are the finished microbatches,
  in order — no gather buffer, just the scan's stacked ys.
- the pipelined state may be a pytree of (B, ...) arrays, so
  per-example auxiliaries (padding masks, conditioning) travel with
  their microbatch through the ring; ``layer_fn`` must preserve the
  structure.
- everything (ppermute, masks, scans) is reverse-differentiable, so
  ``jax.grad`` through :func:`pipelined_layers` gives exact gradients
  (the transpose schedules the drain in reverse).

The shipped TTS models (<50 M params) never *need* PP — it exists for
scale headroom (deep decoder stacks / long frame sequences) and
composes with the ``data`` mesh axis for DP x PP.  Loss/grad identity
vs the serial stack is tested on the 8-device CPU mesh
(tests/test_pipeline_parallel.py) and dry-run as a
``__graft_entry__.dryrun_multichip`` leg.

Activation memory: reverse-mode saves each step's carry, so training
memory scales with M+S-1 step activations of one microbatch; wrap
``layer_fn`` in ``jax.checkpoint`` to trade FLOPs back for HBM.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


__all__ = ["pipeline_layers", "pipelined_layers", "make_pp_layer_runner",
           "stack_layer_params", "unstack_layer_params"]


def pipeline_layers(layer_fn: Callable, stacked_params, x, *,
                    axis_name: str, n_microbatches: int,
                    broadcast_out: bool = True):
    """Run ``L`` stacked layers over ``x`` with microbatch pipelining.

    Must run inside ``shard_map`` with ``stacked_params`` leaves
    sharded on their leading (depth) dim over ``axis_name``.

    Parameters
    ----------
    layer_fn : (one_layer_params, state) -> state — one layer,
        structure- and shape-preserving over ``state``.
    stacked_params : pytree; every leaf (L_local, ...) — this stage's
        contiguous slice of the depth-stacked parameters.
    x : pytree of (B, ...) arrays — the full (replicated) batch and any
        per-example auxiliaries (masks, conditioning) the layers read;
        B % n_microbatches == 0.
    broadcast_out : when True (default) the output is psum-broadcast
        from the last stage so every device returns the real (B, ...)
        result.  Set False when a downstream masked loss handles the
        "only the last stage is real" convention and the extra
        all-reduce matters.

    Returns the ``x``-structured state after all L = S * L_local layers.
    """
    s = jax.lax.psum(1, axis_name)              # static under shard_map
    sid = jax.lax.axis_index(axis_name)
    m = n_microbatches
    tmap = partial(jax.tree_util.tree_map)
    b = jax.tree_util.tree_leaves(x)[0].shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    xm = tmap(lambda a: a.reshape(m, b // m, *a.shape[1:]), x)
    # one hop down the line; no wraparound — ppermute leaves stage 0's
    # input zeros, which the injection overwrites while real microbatches
    # remain, and which are computed-but-never-collected afterwards
    perm = [(i, i + 1) for i in range(s - 1)]

    def apply_stage(h):
        def body(hh, p):
            return layer_fn(p, hh), None
        h, _ = jax.lax.scan(body, h, stacked_params)
        return h

    # the carry init must carry the same varying-axes type as the loop
    # output: zeros_like(xm[0]) inherits whatever OTHER mesh axes x
    # varies over (e.g. an outer data axis), and pcast adds the pipe
    # axis (see ring_attention; shard_map carry-type rule)
    state0 = tmap(
        lambda a: jax.lax.pcast(jnp.zeros_like(a[0]), (axis_name,),
                                to="varying"), xm)

    def step(state, t):
        inject = tmap(lambda a: jax.lax.dynamic_index_in_dim(
            a, jnp.clip(t, 0, m - 1), 0, keepdims=False), xm)
        take = jnp.logical_and(sid == 0, t < m)
        y = apply_stage(tmap(lambda i, h: jnp.where(take, i, h),
                             inject, state))
        return tmap(lambda a: jax.lax.ppermute(a, axis_name, perm), y), y

    _, ys = jax.lax.scan(step, state0, jnp.arange(m + s - 1))
    # on the last stage, step t emits finished microbatch t-(S-1):
    # steps S-1 .. M+S-2 are microbatches 0..M-1, in order
    out = tmap(lambda a: a[s - 1:].reshape(b, *a.shape[2:]), ys)
    if broadcast_out:
        out = tmap(
            lambda a: jax.lax.psum(
                jnp.where(sid == s - 1, a, jnp.zeros_like(a)), axis_name),
            out)
    return out


def stack_layer_params(params, num_layers: int, prefix: str = "layer_",
                       name: str = "layers"):
    """Convert a per-layer param dict (``layer_0`` .. ``layer_{n-1}``
    subtrees, the standard TransformerEncoder layout) into the
    depth-stacked layout the PP runner consumes (one ``layers`` subtree,
    every leaf gaining a leading L dim).  Other keys pass through."""
    out = {k: v for k, v in params.items() if not k.startswith(prefix)}
    layers = [params[f"{prefix}{i}"] for i in range(num_layers)]
    out[name] = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *layers)
    return out


def unstack_layer_params(params, prefix: str = "layer_",
                         name: str = "layers"):
    """Inverse of :func:`stack_layer_params` (for converting a
    PP-trained snapshot back to the standard layout every synthesize
    CLI and checkpoint converter understands)."""
    out = {k: v for k, v in params.items() if k != name}
    stacked = params[name]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        out[f"{prefix}{i}"] = jax.tree_util.tree_map(
            lambda leaf: leaf[i], stacked)
    return out


def make_pp_layer_runner(mesh: Mesh, axis: str = "model", *,
                         n_microbatches: int = 4,
                         data_axis: str = "data") -> Callable:
    """Build a ``layer_runner`` for ``nn.transformer.TransformerEncoder``:
    the encoder's homogeneous layer stack streams through
    :func:`pipeline_layers` stages over ``mesh[axis]`` instead of running
    as a serial python loop.

    The runner signature (what TransformerEncoder calls):
    ``runner(layer_module, stacked_params, x, mask, deterministic,
    dropout_key) -> x`` where ``stacked_params`` is the encoder's
    depth-stacked layer params (leading dim L on every leaf).

    Composes with data parallelism on the same mesh: the batch dim of
    ``x``/``mask`` is sharded over ``data_axis`` (when present in the
    mesh with size > 1), the depth dim over ``axis`` — one shard_map,
    so a ``--dp 2 --pp 4`` recipe run keeps DP batch sharding intact
    inside the pipelined stacks.

    Dropout: flax threads one 'dropout' rng through a serial layer
    loop; inside the pipeline each (layer, microbatch) derives its key
    as ``fold_in(fold_in(base, microbatch), layer_index)`` — same
    statistics, different stream, so loss-parity tests against the
    serial stack must run with dropout 0 (training-parity is asserted
    that way in tests/test_tp_pp_recipes.py).
    """

    def runner(layer_module, stacked_params, x, mask, *,
               deterministic: bool, dropout_key=None):
        leading = [leaf.shape[0]
                   for leaf in jax.tree_util.tree_leaves(stacked_params)]
        n_layers = leading[0]
        size = mesh.shape[axis]
        if n_layers % size:
            raise ValueError(f"{n_layers} layers not divisible by "
                             f"{size}-stage pipe axis {axis!r}")
        b = x.shape[0]
        m = n_microbatches
        dsize = (mesh.shape[data_axis] if data_axis in mesh.shape else 1)
        # pad the batch up to a multiple of (microbatches x data shards)
        # so small eval batches pipeline too; padded rows are zeros with
        # an all-True mask (finite garbage, sliced off below)
        quantum = m * dsize
        b_pad = -(-b // quantum) * quantum
        pad = b_pad - b
        x_in = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        state = {"h": x_in}
        if mask is not None:
            state["mask"] = jnp.pad(
                mask, ((0, pad),) + ((0, 0),) * (mask.ndim - 1),
                constant_values=True)
        if not deterministic and dropout_key is not None:
            # one id per (data shard, shard-local microbatch): shard_map
            # splits the batch over data_axis FIRST, then each shard
            # cuts its local rows into m microbatches — ids derived from
            # the global microbatch size would repeat across shards and
            # reuse dropout masks between distinct microbatches.
            b_local = b_pad // dsize
            assert b_local % m == 0, (
                f"b_pad={b_pad} must pad to a multiple of m*dsize "
                f"({m}*{dsize}); got shard-local batch {b_local}")
            rows = jnp.arange(b_pad)
            mb_ids = ((rows // b_local) * m
                      + (rows % b_local) // (b_local // m))
            state["key"] = jax.vmap(
                lambda i: jax.random.fold_in(dropout_key, i))(mb_ids)
        sp = {"params": stacked_params, "idx": jnp.arange(n_layers)}

        def layer_fn(p, s):
            rngs = None
            if "key" in s:
                rngs = {"dropout": jax.random.fold_in(s["key"][0],
                                                      p["idx"])}
            h, _ = layer_module.apply(
                {"params": p["params"]}, s["h"], s.get("mask"),
                deterministic=deterministic, rngs=rngs)
            return {**s, "h": h}

        dspec = data_axis if (data_axis in mesh.shape
                              and mesh.shape[data_axis] > 1) else None
        fn = partial(pipeline_layers, layer_fn, axis_name=axis,
                     n_microbatches=m)
        # partial-manual composition: mesh axes beyond the pipe/data
        # pair (e.g. a 'model' TP axis on a 3-axis DPxTPxPP mesh) stay
        # AUTO — the stage matmuls are GSPMD-partitioned over them from
        # the params' NamedShardings (fs2_tp_pp_spec), while ppermute/
        # psum are manual over the pipe axis only
        manual = {axis} | ({data_axis} if data_axis in mesh.shape else set())
        kwargs = {}
        if set(mesh.axis_names) - manual:
            kwargs["axis_names"] = frozenset(manual)
        out = jax.shard_map(fn, mesh=mesh,
                            in_specs=(P(axis), P(dspec)),
                            out_specs=P(dspec), **kwargs)(sp, state)
        return out["h"][:b]

    return runner


def pipelined_layers(layer_fn: Callable, stacked_params, x, mesh: Mesh,
                     axis: str = "model", *, n_microbatches: int):
    """Host-side wrapper: shard the depth-stacked ``stacked_params``
    over ``mesh[axis]`` (leading dim of every leaf) and pipeline ``x``
    (a (B, ...) array or pytree of them) through the stages.  Depth L
    must be divisible by the axis size.

    Composes with a ``data`` axis: call :func:`pipeline_layers` under
    your own shard_map with the batch sharded over ``data`` (see
    tests/test_pipeline_parallel.py) — this wrapper replicates ``x``.
    """
    size = mesh.shape[axis]
    for leaf in jax.tree_util.tree_leaves(stacked_params):
        if leaf.shape[0] % size:
            raise ValueError(
                f"stacked depth {leaf.shape[0]} not divisible by "
                f"{size}-stage pipe axis {axis!r}")
    fn = partial(pipeline_layers, layer_fn, axis_name=axis,
                 n_microbatches=n_microbatches)
    shard_fn = jax.shard_map(
        fn, mesh=mesh, in_specs=(P(axis), P()), out_specs=P())
    return shard_fn(stacked_params, x)
