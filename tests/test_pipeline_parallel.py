"""Pipeline parallelism == serial layer stack, values AND gradients
(8-device CPU mesh; conftest forces the virtual devices).

Beyond-reference feature (SURVEY.md 2.9: the reference is DP-only);
parallel/pipeline.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`
from jax.sharding import Mesh, PartitionSpec as P

from parakeet_tpu.parallel import pipeline_layers, pipelined_layers

L, B, T, D = 8, 16, 12, 32


def _mlp_setup(seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "w": jnp.asarray(rng.standard_normal((L, D, D)).astype(np.float32)
                         * 0.3),
        "b": jnp.asarray(rng.standard_normal((L, D)).astype(np.float32)
                         * 0.1)}
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    w_out = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    return params, x, w_out


def _layer_fn(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _serial(layer_fn, params, x):
    def body(h, p):
        return layer_fn(p, h), None
    h, _ = jax.lax.scan(body, x, params)
    return h


def _pipe_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("model",))


@pytest.mark.parametrize("stages,micro", [(4, 4), (8, 2), (2, 8), (1, 4)])
def test_pipeline_forward_matches_serial(stages, micro):
    params, x, _ = _mlp_setup()
    ref = _serial(_layer_fn, params, x)
    out = pipelined_layers(_layer_fn, params, x, _pipe_mesh(stages),
                           "model", n_microbatches=micro)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pipeline_gradients_match_serial():
    params, x, w_out = _mlp_setup(seed=1)
    mesh = _pipe_mesh(4)

    def loss_pp(params, x):
        y = pipelined_layers(_layer_fn, params, x, mesh, "model",
                             n_microbatches=4)
        return jnp.sum(y * w_out)

    def loss_ref(params, x):
        return jnp.sum(_serial(_layer_fn, params, x) * w_out)

    gp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, x)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_transformer_stack():
    """Real EncoderLayer stack: vmap-init stacked params, pipeline the
    depth dim with the padding mask riding the state pytree, compare
    against the serial application."""
    from parakeet_tpu.nn.transformer import EncoderLayer

    layer = EncoderLayer(d_model=D, n_heads=4, units=2 * D,
                         dropout_rate=0.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, 1, T)) > 0.2)
    keys = jax.random.split(jax.random.PRNGKey(0), L)
    stacked = jax.vmap(
        lambda k: layer.init(k, x[:1], mask[:1])["params"])(keys)

    def layer_fn(p, state):
        h, _ = layer.apply({"params": p}, state["h"], state["mask"])
        return {"h": h, "mask": state["mask"]}

    ref = _serial(layer_fn, stacked, {"h": x, "mask": mask})["h"]
    out = pipelined_layers(layer_fn, stacked, {"h": x, "mask": mask},
                           _pipe_mesh(4), "model", n_microbatches=4)
    # microbatch-vs-full-batch XLA vectorization differences reach
    # ~4e-6 on O(10) activations (the serial stack applied to one
    # microbatch shows the same deviation)
    np.testing.assert_allclose(np.asarray(out["h"]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_composes_with_data_parallel():
    """DP x PP on one (data=2, model=4) mesh: batch sharded over data,
    depth sharded over model, one shard_map."""
    params, x, _ = _mlp_setup(seed=3)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    ref = _serial(_layer_fn, params, x)

    fn = jax.shard_map(
        lambda p, xx: pipeline_layers(_layer_fn, p, xx,
                                      axis_name="model",
                                      n_microbatches=4),
        mesh=mesh, in_specs=(P("model"), P("data")),
        out_specs=P("data"))
    out = fn(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pp_dropout_keys_unique_per_shard_microbatch():
    """Regression: under DP x PP the dropout key must differ per
    (data shard, shard-local microbatch).  Ids derived from the GLOBAL
    microbatch size repeat across data shards, so both local
    microbatches of a shard got the same key — identical dropout masks
    for different examples."""
    from parakeet_tpu.nn.transformer import EncoderLayer
    from parakeet_tpu.parallel.pipeline import make_pp_layer_runner

    layer = EncoderLayer(d_model=D, n_heads=4, units=2 * D,
                         dropout_rate=0.5)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("data", "model"))
    runner = make_pp_layer_runner(mesh, "model", n_microbatches=2)
    rng = np.random.default_rng(4)
    row = rng.standard_normal((1, T, D)).astype(np.float32)
    x = jnp.asarray(np.repeat(row, 8, axis=0))       # identical rows
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    stacked = jax.vmap(
        lambda k: layer.init(k, x[:1], None)["params"])(keys)

    out = np.asarray(runner(layer, stacked, x, None,
                            deterministic=False,
                            dropout_key=jax.random.PRNGKey(7)))
    # identical inputs, so equal keys leave identical microbatch
    # outputs; shard 0 = rows 0-3 (local microbatches 0-1 / 2-3),
    # shard 1 = rows 4-7
    assert not np.allclose(out[0:2], out[2:4])
    assert not np.allclose(out[4:6], out[6:8])
    assert not np.allclose(out[0:2], out[4:6])
    # same key -> same masks (the stream stays deterministic)
    out2 = np.asarray(runner(layer, stacked, x, None,
                             deterministic=False,
                             dropout_key=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(out, out2)


def test_pipeline_divisibility_errors():
    params, x, _ = _mlp_setup()
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_layers(_layer_fn, params, x, _pipe_mesh(4), "model",
                         n_microbatches=3)          # B=16 % 3 != 0
    bad = {"w": params["w"][:6], "b": params["b"][:6]}   # L=6 % 4 != 0
    with pytest.raises(ValueError, match="stacked depth"):
        pipelined_layers(_layer_fn, bad, x, _pipe_mesh(4), "model",
                         n_microbatches=4)
