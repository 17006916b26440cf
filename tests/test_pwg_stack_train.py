"""Custom-VJP fused residual stack == XLA path, values AND gradients
(interpret mode on CPU; the same kernels compile natively on TPU).

The fused forward computes in bf16 (fp32 accumulation); its VJP is the
exact transpose of that bf16 computation, so both value and gradient
comparisons against the fp32 XLA reference carry bf16-scale tolerances.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

from parakeet_tpu.ops.pallas import pwg_stack, pwg_stack_train
from parakeet_tpu.ops.pallas.pwg_stack import fused_residual_stack
from parakeet_tpu.ops.pallas.pwg_stack_train import (
    fused_residual_stack_train)

CR, CA, LAYERS, STACKS = 32, 20, 6, 3
DILS = tuple(2 ** (i % (LAYERS // STACKS)) for i in range(LAYERS))


@pytest.fixture(autouse=True)
def small_blocks(monkeypatch):
    monkeypatch.setattr(pwg_stack, "_BLOCK", 256)
    monkeypatch.setattr(pwg_stack, "_HALO", 64)
    monkeypatch.setattr(pwg_stack, "_SLACK", 32)
    monkeypatch.setattr(pwg_stack_train, "_BWD_BLOCK", 128)


def _rand_weights(rng, scale=0.3):
    def n(*s):
        return jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * scale)
    return dict(conv=n(LAYERS, 3, CR, 2 * CR), conv_b=n(LAYERS, 2 * CR),
                aux=n(LAYERS, CA, 2 * CR),
                skip=n(LAYERS, CR, CR), out=n(LAYERS, CR, CR),
                skip_b=n(LAYERS, CR), out_b=n(LAYERS, CR))


def _ref_stack(x, c, w, dils):
    """fp32 XLA reference of the same math (SAME zero padding)."""
    skips = 0.0
    for i, d in enumerate(dils):
        t = x.shape[1]
        left = jnp.pad(x, ((0, 0), (d, 0), (0, 0)))[:, :t]
        right = jnp.pad(x, ((0, 0), (0, d), (0, 0)))[:, d:]
        g = (left @ w["conv"][i, 0] + x @ w["conv"][i, 1]
             + right @ w["conv"][i, 2] + w["conv_b"][i]
             + c @ w["aux"][i])
        h = jnp.tanh(g[..., :CR]) * jax.nn.sigmoid(g[..., CR:])
        skips = skips + h @ w["skip"][i] + w["skip_b"][i]
        x = (h @ w["out"][i] + w["out_b"][i] + x) * math.sqrt(0.5)
    return x, skips


def _setup(t=700, b=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, CR)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((b, t, CA)).astype(np.float32))
    w = _rand_weights(rng)
    wx = jnp.asarray(rng.standard_normal((b, t, CR)).astype(np.float32))
    ws = jnp.asarray(rng.standard_normal((b, t, CR)).astype(np.float32))
    return x, c, w, wx, ws


def test_train_forward_matches_inference_kernel():
    x, c, w, _, _ = _setup()
    xt, st = fused_residual_stack_train(x, c, w, dilations=DILS,
                                        stacks=STACKS)
    xi, si = fused_residual_stack(x, c, w, dilations=DILS, stacks=STACKS)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xi, np.float32),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st), np.asarray(si),
                               rtol=1e-6, atol=1e-6)


def test_train_forward_matches_xla_reference():
    x, c, w, _, _ = _setup()
    xt, st = fused_residual_stack_train(x, c, w, dilations=DILS,
                                        stacks=STACKS)
    xr, sr = _ref_stack(x, c, w, DILS)
    # bf16 matmul noise amplified through 6 gated layers; the tail of
    # the error distribution on O(1) activations reaches ~0.15
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xr),
                               rtol=0.05, atol=0.2)
    np.testing.assert_allclose(np.asarray(st), np.asarray(sr),
                               rtol=0.05, atol=0.2)


def _grad_compare(t, seed, rtol=0.08):
    x, c, w, wx, ws = _setup(t=t, seed=seed)

    def loss_fused(x, c, w):
        xf, sk = fused_residual_stack_train(x, c, w, dilations=DILS,
                                            stacks=STACKS)
        return jnp.sum(xf * wx[:, :t]) + jnp.sum(sk * ws[:, :t])

    def loss_ref(x, c, w):
        xf, sk = _ref_stack(x, c, w, DILS)
        return jnp.sum(xf * wx[:, :t]) + jnp.sum(sk * ws[:, :t])

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, c, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, c, w)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (path, a), (_, b) in zip(flat_f, flat_r):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=rtol * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_gradients_match_xla_multi_block():
    """T spans several backward blocks: exercises the reverse-grid
    carried dtaps tails and both halo directions."""
    _grad_compare(t=700, seed=1)


def test_gradients_match_xla_single_block_ragged():
    """T < one forward block with a ragged tail (t_signal masking)."""
    _grad_compare(t=200, seed=2)


def test_residual_stack_pallas_train_grads_match_xla():
    """Module-level: impl='pallas' under grad (deterministic=False)
    differentiates through the weight-norm fold + fused stack and
    matches the XLA path's gradients."""
    from parakeet_tpu.models.parallel_wavegan import ResidualStack

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 300, CR)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 300, CA)).astype(np.float32))
    wx = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    def build(impl):
        return ResidualStack(layers=LAYERS, stacks=STACKS, kernel_size=3,
                             residual_channels=CR, gate_channels=2 * CR,
                             skip_channels=CR, aux_channels=CA, impl=impl)

    v = build("xla").init(jax.random.PRNGKey(0), x, c)

    def loss(params, impl):
        xf, sk = build(impl).apply({"params": params}, x, c,
                                   deterministic=False)
        return jnp.sum(xf * wx) + jnp.sum(sk)

    gx = jax.grad(lambda p: loss(p, "xla"))(v["params"])
    gp = jax.grad(lambda p: loss(p, "pallas"))(v["params"])
    flat_x, _ = jax.tree_util.tree_flatten_with_path(gx)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(gp)
    for (path, a), (_, b) in zip(flat_p, flat_x):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=0.08, atol=0.08 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_train_supported_gate():
    assert pwg_stack_train.fused_stack_train_supported(
        CR, 2 * CR, CR, 3, LAYERS, STACKS, aux_channels=CA)
    assert not pwg_stack_train.fused_stack_train_supported(
        CR, 2 * CR, CR, 5, LAYERS, STACKS, aux_channels=CA)
