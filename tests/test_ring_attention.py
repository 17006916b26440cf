"""Sequence-parallel ring attention vs dense softmax attention.

Runs on the conftest 8-device CPU mesh; the sequence axis is sharded
over all 8 devices and the ring result must match a single-device dense
attention exactly (up to float accumulation order)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from parakeet_tpu.parallel import sequence_parallel_self_attention


def dense_attention(q, k, v, kv_mask=None):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("seq",))


def test_ring_matches_dense(mesh):
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 64, 2, 8
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    out = sequence_parallel_self_attention(mesh, "seq", q, k, v)
    ref = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_respects_padding_mask(mesh):
    rng = np.random.default_rng(1)
    b, t, h, d = 1, 32, 2, 4
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    # valid length 21: padded keys span shard boundaries
    kv_mask = jnp.arange(t)[None, :] < 21
    out = sequence_parallel_self_attention(mesh, "seq", q, k, v, kv_mask)
    ref = dense_attention(q, k, v, kv_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # fully-masked ring output must be finite (guarded normalizer)
    none_valid = jnp.zeros((b, t), bool)
    out0 = sequence_parallel_self_attention(mesh, "seq", q, k, v,
                                            none_valid)
    assert np.isfinite(np.asarray(out0)).all()


def test_ring_under_jit_and_grad(mesh):
    """The ring composes with jit + grad (training-path usability)."""
    rng = np.random.default_rng(2)
    b, t, h, d = 1, 16, 1, 4
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))

    def loss_ring(q):
        return jnp.sum(
            sequence_parallel_self_attention(mesh, "seq", q, k, v) ** 2)

    def loss_dense(q):
        return jnp.sum(dense_attention(q, k, v) ** 2)

    g_ring = jax.jit(jax.grad(loss_ring))(q)
    g_dense = jax.grad(loss_dense)(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-4)
