"""configure_rng_impl / seed_everything (training/seeding.py).

The rng_impl knob is perf-load-bearing (FastSpeech2 +59%, TransformerTTS
+45% with 'rbg' — docs/tpu_performance.md round 5), so pin its contract:
key shapes per impl, derivability (split / fold_in / normal), recipe
spelling, and the invalid-name error.  Global config is restored after
each test — the impl choice must not leak into the rest of the suite.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_tpu.training.seeding import configure_rng_impl, seed_everything


@pytest.fixture
def restore_impl():
    before = jax.config.jax_default_prng_impl
    yield
    jax.config.update("jax_default_prng_impl", before)


def _usable(key):
    a, b = jax.random.split(key)
    x = jax.random.normal(jax.random.fold_in(a, 3), (4, 8))
    assert bool(jnp.isfinite(x).all())
    return a, b


def test_rbg_key_shape_and_draws(restore_impl):
    configure_rng_impl("rbg")
    key = jax.random.PRNGKey(0)
    assert key.shape == (4,) and key.dtype == jnp.uint32
    _usable(key)


def test_threefry_key_shape_and_draws(restore_impl):
    configure_rng_impl("threefry")
    key = jax.random.PRNGKey(0)
    assert key.shape == (2,) and key.dtype == jnp.uint32
    _usable(key)
    # the long spelling is accepted too (the jax config name)
    configure_rng_impl("threefry2x32")


def test_invalid_impl_raises(restore_impl):
    with pytest.raises(ValueError, match="unknown rng impl"):
        configure_rng_impl("philox")


def test_seed_everything_rng_impl(restore_impl):
    key = seed_everything(7, rng_impl="rbg")
    assert key.shape == (4,)
    # python/numpy seeding still happens
    a = np.random.rand()
    seed_everything(7, rng_impl="rbg")
    assert np.random.rand() == a


def test_seed_everything_default_leaves_impl_alone(restore_impl):
    configure_rng_impl("threefry")
    key = seed_everything(7)                 # rng_impl=None: no change
    assert key.shape == (2,)
