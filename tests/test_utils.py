"""Utils tests: error rates, layer tools, profiler options."""
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_tpu.utils import (ProfilerOptions, StepTimer, cer,
                                freeze_optimizer, gradient_norm,
                                levenshtein, num_parameters, wer)


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([], [1, 2]) == 2
    assert levenshtein("abc", "abc") == 0


def test_wer_cer():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the bat sat") == pytest.approx(1 / 3)
    assert cer("abcd", "abed") == pytest.approx(0.25)
    with pytest.raises(ValueError):
        wer("", "x")


def test_num_parameters_and_gradient_norm():
    params = {"a": jnp.ones((2, 3)), "b": {"c": jnp.ones(4)}}
    assert num_parameters(params) == 10
    g = gradient_norm(params)
    assert float(g) == pytest.approx(np.sqrt(10.0))


def test_freeze_optimizer():
    import optax
    params = {"enc": jnp.ones(3), "dec": jnp.ones(3)}
    tx = freeze_optimizer(optax.sgd(1.0), params,
                          lambda name: name.startswith("enc"))
    state = tx.init(params)
    grads = {"enc": jnp.ones(3), "dec": jnp.ones(3)}
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["enc"]), 0.0)
    np.testing.assert_array_equal(np.asarray(updates["dec"]), -1.0)


def test_profiler_options_parse():
    o = ProfilerOptions("batch_range=[5,8];profile_path=/tmp/x;"
                        "exit_on_finished=true")
    assert o.batch_range == [5, 8]
    assert o.profile_path == "/tmp/x"
    assert o.exit_on_finished
    with pytest.raises(ValueError):
        ProfilerOptions("batch_range=[8,5]")


def test_step_timer():
    t = StepTimer()
    t.tick_reader()
    t.tick_batch(4)
    s = t.stats
    assert s["avg_ips"] > 0
    assert s["avg_batch_cost"] >= s["avg_reader_cost"]
