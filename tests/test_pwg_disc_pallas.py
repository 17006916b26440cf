"""Parity tests for the fused Pallas PWG discriminator tail.

Strategy mirrors tests/test_pwg_pallas_stack.py / test_pwg_stack_train.py:
the kernels run in Pallas interpreter mode on CPU (identical program,
no TPU required) and are compared against the definitionally-correct
XLA shifted-matmul path (conv1d_taps + leaky_relu) at bf16 tolerances —
the kernel's matmuls are bf16 with fp32 accumulation by design.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_tpu.models.parallel_wavegan import conv1d_taps
from parakeet_tpu.ops.pallas.pwg_disc import (DISC_TAIL_DILS,
                                              fused_disc_tail)

SLOPE = 0.2


def _make_weights(rng):
    """Unit-gain layers (||k|| ~ lecun scale): a weight-normalized
    discriminator keeps the activation scale O(1) across its 10
    layers; the r4 first-draft test used 3x-lecun weights whose 2x
    per-layer gain blew the signal to +-13 and with it the compounded
    bf16 rounding — unrepresentative of any trained WN model."""
    kernels, biases = [], []
    for j, _ in enumerate(DISC_TAIL_DILS):
        cout = 1 if j == len(DISC_TAIL_DILS) - 1 else 64
        kernels.append(jnp.asarray(
            rng.normal(size=(3, 64, cout)) / np.sqrt(3 * 64), jnp.float32))
        biases.append(jnp.asarray(rng.normal(size=(cout,)) * 0.05,
                                  jnp.float32))
    return kernels, biases


def _xla_tail(h, kernels, biases):
    x = h
    for j, d in enumerate(DISC_TAIL_DILS):
        x = conv1d_taps(x, kernels[j], d, "SAME") + biases[j]
        if j < len(DISC_TAIL_DILS) - 1:
            x = jnp.where(x > 0, x, SLOPE * x)
    return x


@pytest.mark.parametrize("t", [4096, 6000])
def test_fused_disc_tail_forward_matches_xla(t):
    rng = np.random.default_rng(0)
    kernels, biases = _make_weights(rng)
    h = jnp.asarray(rng.normal(size=(2, t, 64)), jnp.float32)
    got = fused_disc_tail(h, kernels, biases, negative_slope=SLOPE)
    want = _xla_tail(h, kernels, biases)
    assert got.shape == (2, t, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)
    # scale-relative check: bf16 rounding on a ~1-range signal
    err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    rng_span = np.ptp(np.asarray(want))
    assert err / max(rng_span, 1e-6) < 2e-2, (err, rng_span)


def _xla_tail_bf16(h, kernels, biases):
    """bf16-operand emulation of the kernel's matmul semantics: the
    fused VJP is the exact transpose of the bf16 forward, and
    LeakyReLU's derivative is discontinuous at 0, so near-zero
    activations legitimately pick different masks under fp32 vs bf16
    rounding — grads must be compared against the same rounding class
    (pointwise-max vs the fp32 path is dominated by those measure-zero
    mask flips; see module docstring)."""
    x = h
    for j, d in enumerate(DISC_TAIL_DILS):
        xr = x.astype(jnp.bfloat16).astype(jnp.float32)
        kr = kernels[j].astype(jnp.bfloat16).astype(jnp.float32)
        x = conv1d_taps(xr, kr, d, "SAME") + biases[j]
        if j < len(DISC_TAIL_DILS) - 1:
            x = jnp.where(x > 0, x, SLOPE * x)
    return x


def test_fused_disc_tail_grads_match_xla():
    t = 6000
    rng = np.random.default_rng(1)
    kernels, biases = _make_weights(rng)
    h = jnp.asarray(rng.normal(size=(1, t, 64)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(1, t, 1)), jnp.float32)

    def loss_fused(h, kernels, biases):
        return jnp.sum(fused_disc_tail(h, kernels, biases,
                                       negative_slope=SLOPE) * ct)

    def loss_xla(h, kernels, biases):
        return jnp.sum(_xla_tail_bf16(h, kernels, biases) * ct)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(h, kernels, biases)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(h, kernels, biases)

    def rel_l2(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)

    assert rel_l2(g_f[0], g_x[0]) < 3e-2, \
        f"dh rel-L2 {rel_l2(g_f[0], g_x[0])}"
    for j in range(len(DISC_TAIL_DILS)):
        assert rel_l2(g_f[1][j], g_x[1][j]) < 3e-2, \
            f"dW[{j}] rel-L2 {rel_l2(g_f[1][j], g_x[1][j])}"
        # bias grads are 6000-row sums of random-sign dpre: the sum
        # cancels to ~sqrt(T) of the element scale, so the same bf16
        # element noise is relatively ~2x larger than on dW
        assert rel_l2(g_f[2][j], g_x[2][j]) < 7e-2, \
            f"db[{j}] rel-L2 {rel_l2(g_f[2][j], g_x[2][j])}"


def test_vjp_recompute_matches_save_bitwise():
    """The round-5 recompute VJP rebuilds the per-layer streams in the
    backward with the same dot order and bf16 rounding points as the
    save variant's forward, so its gradients must be BITWISE equal to
    the save-mode gradients (not merely close)."""
    t = 6000
    rng = np.random.default_rng(3)
    kernels, biases = _make_weights(rng)
    h = jnp.asarray(rng.normal(size=(2, t, 64)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, t, 1)), jnp.float32)

    def loss(mode):
        def f(h, kernels, biases):
            return jnp.sum(fused_disc_tail(
                h, kernels, biases, negative_slope=SLOPE,
                vjp_mode=mode) * ct)
        return jax.grad(f, argnums=(0, 1, 2))(h, kernels, biases)

    g_r = loss("recompute")
    g_s = loss("save")
    np.testing.assert_array_equal(np.asarray(g_r[0]), np.asarray(g_s[0]))
    for j in range(len(DISC_TAIL_DILS)):
        np.testing.assert_array_equal(np.asarray(g_r[1][j]),
                                      np.asarray(g_s[1][j]))
        np.testing.assert_array_equal(np.asarray(g_r[2][j]),
                                      np.asarray(g_s[2][j]))


def test_pwg_discriminator_impl_pallas_integration():
    """PWGDiscriminator(impl='pallas') must share the XLA variant's
    param tree exactly (checkpoints interchangeable) and agree on
    logits and input-gradients at bf16 tolerances."""
    from parakeet_tpu.models import PWGDiscriminator

    t = 4500
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.normal(size=(2, t, 1)) * 0.3, jnp.float32)
    d_x = PWGDiscriminator(layers=10, conv_channels=64, impl="xla")
    d_p = PWGDiscriminator(layers=10, conv_channels=64, impl="pallas")
    vx = d_x.init(jax.random.PRNGKey(0), wav)
    vp = d_p.init(jax.random.PRNGKey(0), wav)
    tx = jax.tree_util.tree_structure(vx)
    tp = jax.tree_util.tree_structure(vp)
    assert tx == tp, f"param trees differ:\n{tx}\n{tp}"
    for a, b in zip(jax.tree_util.tree_leaves(vx),
                    jax.tree_util.tree_leaves(vp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    lx = d_x.apply(vx, wav)
    lp = d_p.apply(vx, wav)
    assert lp.shape == lx.shape == (2, t, 1)
    scale = float(np.max(np.abs(np.asarray(lx)))) or 1.0
    assert np.max(np.abs(np.asarray(lp) - np.asarray(lx))) / scale < 3e-2

    # adversarial-style gradient into the input (the gen-update path)
    def adv(wav, apply):
        return jnp.mean((apply(vx, wav) - 1.0) ** 2)

    gx = jax.grad(lambda w: adv(w, d_x.apply))(wav)
    gp = jax.grad(lambda w: adv(w, d_p.apply))(wav)
    num = np.linalg.norm(np.asarray(gp) - np.asarray(gx))
    den = max(np.linalg.norm(np.asarray(gx)), 1e-9)
    # vs the FP32 path this is a plumbing/scale check only: at random
    # init the activations cluster near LeakyReLU's kink and the MSE
    # grad cancels to ~1e-3 norm, so bf16-vs-fp32 mask flips dominate
    # the relative number (~0.13 here).  Exact gradient semantics (vs
    # the bf16-emulated reference) are pinned at 3e-2 above.
    assert num / den < 0.25, f"adv input-grad rel-L2 {num / den}"


def test_pwg_discriminator_impl_auto_policy(monkeypatch):
    """impl='auto' must apply the measured round-4 policy: fused
    kernel only on TPU + fp32 + supported config; XLA on bf16, on
    non-TPU backends, and on unsupported shapes (docs/tpu_performance
    .md PWGAN row)."""
    import parakeet_tpu.ops.pallas.pwg_disc as pwg_disc
    from parakeet_tpu.models import PWGDiscriminator

    wav = jnp.zeros((1, 512, 1), jnp.float32)
    params = PWGDiscriminator(layers=10, conv_channels=64,
                              impl="xla").init(jax.random.PRNGKey(0), wav)

    class _Routed(Exception):
        pass

    def _sentinel(*a, **k):
        raise _Routed

    monkeypatch.setattr(pwg_disc, "fused_disc_tail", _sentinel)

    def run(impl, backend, dtype=jnp.float32):
        monkeypatch.setattr(jax, "default_backend", lambda: backend)
        d = PWGDiscriminator(layers=10, conv_channels=64, impl=impl,
                             dtype=dtype)
        return d.apply(params, wav.astype(dtype))

    # fp32 on TPU -> fused kernel (sentinel fires)
    with pytest.raises(_Routed):
        run("auto", "tpu")
    # bf16 on TPU -> XLA (measured slower fused; must NOT route)
    out = run("auto", "tpu", jnp.bfloat16)
    assert out.shape == (1, 512, 1)
    # fp32 off-TPU -> XLA
    out = run("auto", "cpu")
    assert out.shape == (1, 512, 1)
    # unsupported config (conv_channels != 64) -> XLA even on TPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    d_small = PWGDiscriminator(layers=10, conv_channels=32, impl="auto")
    p_small = d_small.init(jax.random.PRNGKey(0), wav)
    assert d_small.apply(p_small, wav).shape == (1, 512, 1)
    # explicit impl='pallas' still routes unconditionally
    with pytest.raises(_Routed):
        run("pallas", "cpu")
