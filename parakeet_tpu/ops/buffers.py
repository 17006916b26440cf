"""Loop-carry buffer allocation.

Workaround for an axon (TPU) backend miscompile, bisected in round 2
(repro: tools/diagnose_axon_carry_init.py): a while-loop carry buffer
whose initial value is a compile-time constant (``jnp.zeros`` created
inside the jitted program) and which is PARTIALLY written in-loop via
``lax.dynamic_update_slice`` can skip its zero-initialization — the
loop's in-place buffer aliasing then exposes uninitialized device
memory in the rows not yet written.  Observed as deterministic
NaN/garbage from step 0 for 16-bit dtypes (bf16/fp16); fp32 buffers
and CPU are unaffected; ``unroll>=2``, passing the buffer as a runtime
argument, or an ``optimization_barrier`` on the init all avoid it.

``carry_buffer`` applies the cheapest fix: an optimization barrier
forces XLA to materialize the zeros once, outside the loop.  Use it
for any scan/while carry that is INDEX-written (dynamic_update_slice /
``.at[i].set``) rather than fully rewritten each step — e.g. the
preallocated KV caches of AR transformer decode.  Fully-rewritten
carries (ring-buffer shifts, accumulators) do not need it: every
iteration overwrites the whole buffer, so uninitialized memory cannot
survive.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["carry_buffer"]


def carry_buffer(shape, dtype=jnp.float32) -> jnp.ndarray:
    """A zeros buffer safe to carry through scan and index-write on the
    axon backend (materialized via optimization_barrier; see module
    docstring).  Semantically identical to ``jnp.zeros(shape, dtype)``."""
    return jax.lax.optimization_barrier(jnp.zeros(shape, dtype))
