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
