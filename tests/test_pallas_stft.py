"""Pallas fused STFT kernel vs the XLA einsum formulation.

On the CPU test backend the kernel runs in interpreter mode (exact, slow),
so shapes are kept tiny; the TPU-compiled path is exercised by the verify
drive and bench.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_tpu.ops.pallas import stft_magnitude_pallas
from parakeet_tpu.ops.stft import stft_magnitude


@pytest.mark.parametrize("n_fft,hop", [(256, 64), (512, 120)])
def test_pallas_stft_matches_reference(n_fft, hop):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
    ref = stft_magnitude(x, n_fft, hop)
    got = stft_magnitude_pallas(x, n_fft, hop)
    assert got.shape == ref.shape
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(ref))
    assert rel < 1e-4, rel


def test_pallas_stft_gradient_matches_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 1500)).astype(np.float32))

    gp = jax.grad(lambda v: jnp.sum(stft_magnitude_pallas(v, 256, 64)))(x)
    gr = jax.grad(lambda v: jnp.sum(stft_magnitude(v, 256, 64)))(x)
    rel = float(jnp.max(jnp.abs(gp - gr)) / (jnp.max(jnp.abs(gr)) + 1e-9))
    assert rel < 1e-4, rel
