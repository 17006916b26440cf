#!/usr/bin/env python
"""Minimal repro + diagnosis of the axon while-loop carry-init miscompile.

Symptom (round 1, CLAUDE.md lore): jitted bf16 TransformerTTS AR decode
produced NaN on the axon TPU backend — CPU jitted and axon op-by-op were
both fine — so AR decode was pinned to fp32.

Round-2 bisection (this script) reduced it to a backend bug that has
nothing to do with the model or with bf16 arithmetic:

    A while-loop (lax.scan) carry buffer whose initial value is a
    compile-time constant (jnp.zeros created INSIDE the jitted program)
    and which is partially written in-loop via dynamic_update_slice can
    skip its zero-initialization: the loop's in-place double buffering
    aliases uninitialized device memory in the not-yet-written rows.

Evidence matrix (v5e, axon backend, 2026-08-17):
  - bf16/fp16 carries: deterministic NaN/garbage from scan step 0
  - the SAME graph: clean on CPU, clean unjitted on axon, clean at fp32
  - unroll=2, init-as-runtime-argument, or optimization_barrier on the
    init each make it disappear (all three change buffer materialization)
  - a write+readback probe shows the 'zeros' buffer containing nonzero
    junk before any row is written

Framework fix: ops/buffers.py carry_buffer() (optimization_barrier on
the init), applied to the TransformerTTS KV caches — bf16 AR decode is
re-enabled.  Run this script on the axon backend to confirm the bug and
the fix:

    PYTHONPATH=.:/root/.axon_site python tools/diagnose_axon_carry_init.py
"""
import numpy as np
import jax
import jax.numpy as jnp

BF = jnp.bfloat16
TMAX, D, H, B = 16, 64, 4, 1
DK = D // H


def _scan(ck0, W):
    """1-'layer' cached-attention skeleton: write a row at step t, read
    the whole cache back through two einsums (enough feedback for junk
    rows to reach the output)."""
    def step(carry, _):
        ck, prev, t = carry
        k1 = jnp.einsum("bqd,dhk->bqhk", prev, W.astype(BF))
        ck = jax.lax.dynamic_update_slice(ck, k1, (0, t, 0, 0))
        s = jnp.einsum("bkhd,bkhd->bhk", ck, ck,
                       preferred_element_type=jnp.float32)
        o = jnp.einsum("bhk,bkhd->bhd", s.astype(BF), ck,
                       preferred_element_type=jnp.float32).astype(BF)
        x = o.reshape(B, 1, D) * 0.01
        return (ck, x, t + 1), x[:, 0]

    init = (ck0, jnp.full((B, 1, D), 0.1, BF), jnp.zeros((), jnp.int32))
    return jax.lax.scan(step, init, None, length=TMAX)[1]


def _probe():
    """Value-level probe: write a row of ones per step; the running sum
    must be exactly (t+1) * H * DK if the buffer really started zeroed."""
    def step(carry, _):
        ck, t = carry
        ck = jax.lax.dynamic_update_slice(
            ck, jnp.full((1, 1, H, DK), 1.0, BF), (0, t, 0, 0))
        return (ck, t + 1), jnp.sum(ck.astype(jnp.float32))

    init = (jnp.zeros((B, TMAX, H, DK), BF), jnp.zeros((), jnp.int32))
    return jax.lax.scan(step, init, None, length=TMAX)[1]


def main():
    print(f"backend: {jax.default_backend()}, "
          f"devices: {jax.devices()[:1]}")
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.uniform(-0.125, 0.125, (D, H, DK)), jnp.float32)

    bug = jax.jit(lambda W: _scan(jnp.zeros((B, TMAX, H, DK), BF), W))
    fix = jax.jit(lambda W: _scan(jax.lax.optimization_barrier(
        jnp.zeros((B, TMAX, H, DK), BF)), W))

    out_bug = np.asarray(bug(W), np.float32)
    out_fix = np.asarray(fix(W), np.float32)
    sums = np.asarray(_probe_jit()(), np.float32)
    expect = (np.arange(TMAX, dtype=np.float32) + 1) * H * DK
    drift = float(np.abs(sums - expect).max())

    print(f"constant-zeros init : finite={np.isfinite(out_bug).all()}"
          f"  (bug present if False)")
    print(f"optimization_barrier: finite={np.isfinite(out_fix).all()}"
          f"  (must be True)")
    print(f"write+sum probe     : max drift from exact = {drift:.2e}"
          f"  (junk in 'zeros' buffer if > 0)")
    if not bool(np.isfinite(out_bug).all()):
        print("=> bug REPRODUCED; carry_buffer() workaround required")
    elif drift > 0:
        print("=> partial symptom: buffer junk without NaN this run")
    else:
        print("=> bug not visible on this backend/run")


def _probe_jit():
    return jax.jit(_probe)


if __name__ == "__main__":
    main()
