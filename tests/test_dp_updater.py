"""StandardUpdater data-parallel path: mesh replication + batch sharding
(the --dp recipe flag; replaces the reference's paddle.DataParallel wrap,
SURVEY §2.9)."""
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

import jax
import numpy as np

from parakeet_tpu import training as T
from parakeet_tpu.models import (init_fs2_train_state,
                                 make_fs2_train_step)
from parakeet_tpu.parallel.mesh import make_mesh
from parakeet_tpu.training.updater import StandardUpdater

from test_models_train import fs2_batch, tiny_fs2


def test_standard_updater_dp_mesh():
    assert jax.device_count() == 8
    mesh = make_mesh(data=8)
    model = tiny_fs2()
    tx = T.build_optimizer("adam", 1e-3)
    batch = fs2_batch(b=16)
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_fs2_train_step(model, tx)

    batches = [jax.tree_util.tree_map(np.asarray, fs2_batch(b=16, seed=s))
               for s in range(3)]
    updater = StandardUpdater(step, state, batches, mesh=mesh)
    for _ in range(3):
        updater.update()
    assert updater.state.iteration == 3
    assert np.isfinite(float(updater.last_metrics["loss"]))
    leaf = jax.tree_util.tree_leaves(updater.train_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_fs2_tensor_parallel_matches_dp():
    """2-D (data x model) mesh with Megatron-style head/FFN sharding
    produces the same loss as pure DP (XLA inserts the collectives)."""
    from parakeet_tpu.parallel import fs2_tp_spec, replicate, \
        shard_batch, shard_params_by_rule

    model = tiny_fs2()
    tx = T.build_optimizer("adam", 1e-3)
    batch = fs2_batch(b=8)
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0), batch)
    state_copy = jax.tree_util.tree_map(jax.numpy.array, state)
    step = make_fs2_train_step(model, tx)

    mesh_dp = make_mesh(data=8)
    with mesh_dp:
        s = replicate(state, mesh_dp)
        _, m_dp = step(s, shard_batch(batch, mesh_dp))

    mesh_tp = make_mesh(data=4, model=2)
    with mesh_tp:
        s2 = replicate(state_copy, mesh_tp)
        sharded_params = shard_params_by_rule(s2.params, mesh_tp,
                                              fs2_tp_spec)
        # the attention kernels must actually be distributed
        qk = sharded_params["encoder"]["layer_0"]["self_attn"]["q"][
            "kernel"]
        assert not qk.sharding.is_fully_replicated
        s2 = s2.replace(params=sharded_params)
        _, m_tp = step(s2, shard_batch(batch, mesh_tp))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)
