"""Fused Pallas residual stack == XLA shifted-matmul path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.models.parallel_wavegan import ResidualStack


def _build(impl):
    return ResidualStack(layers=6, stacks=3, kernel_size=3,
                         residual_channels=32, gate_channels=64,
                         skip_channels=32, aux_channels=20, impl=impl)


def test_pallas_stack_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 300, 32)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 300, 20)).astype(np.float32))

    xla = _build("xla")
    v = xla.init(jax.random.PRNGKey(0), x, c)
    x_ref, s_ref = xla.apply(v, x, c)

    pal = _build("pallas")
    x_got, s_got = pal.apply(v, x, c)

    # pallas computes in bf16; compare with a tolerance scaled to range
    np.testing.assert_allclose(np.asarray(x_got, np.float32),
                               np.asarray(x_ref, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref),
                               rtol=0.05, atol=0.05)
    # and the skip energies should be close in aggregate
    assert abs(float(jnp.mean(s_got - s_ref))) < 1e-2


def test_pallas_stack_cross_block_tails(monkeypatch):
    """Exercise grid steps f > 0: the carried left tails, right-only
    halo, and slack overread only activate when T > _BLOCK, which the
    production _BLOCK=4096 never reaches in CI — shrink the block so a
    small input spans several grid steps."""
    from parakeet_tpu.ops.pallas import pwg_stack

    monkeypatch.setattr(pwg_stack, "_BLOCK", 256)
    monkeypatch.setattr(pwg_stack, "_HALO", 64)
    monkeypatch.setattr(pwg_stack, "_SLACK", 32)

    rng = np.random.default_rng(1)
    # 3 blocks + a ragged tail; dilations 1,2,4 per group (sum 7 < 64)
    x = jnp.asarray(rng.standard_normal((2, 700, 32)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 700, 20)).astype(np.float32))

    xla = _build("xla")
    v = xla.init(jax.random.PRNGKey(0), x, c)
    x_ref, s_ref = xla.apply(v, x, c)
    x_got, s_got = _build("pallas").apply(v, x, c)

    np.testing.assert_allclose(np.asarray(x_got, np.float32),
                               np.asarray(x_ref, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref),
                               rtol=0.05, atol=0.05)
