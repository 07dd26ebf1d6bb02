"""VQ op + quantizer assembly tests (SURVEY.md §4 rebuild plan (b),(c))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.ops.vq import (groupLatent, reassignCodebook, vqDequantizeCodes,
                               vqDequantizeSoft, vqDistance, vqEncode)


def test_vq_distance_matches_naive():
    key = jax.random.PRNGKey(0)
    n, h, w, m, d, k = 2, 4, 3, 2, 8, 16
    x = jax.random.normal(key, (n, h, w, m, d))
    cb = jax.random.normal(jax.random.PRNGKey(1), (m, k, d))
    dist = vqDistance(x, cb)
    naive = jnp.sum((x[:, :, :, :, None, :] - cb[None, None, None]) ** 2, -1)
    np.testing.assert_allclose(dist, naive, atol=1e-4)


def test_vq_encode_is_argmin_and_decode_gathers():
    key = jax.random.PRNGKey(2)
    n, h, w, m, d, k = 1, 5, 5, 2, 4, 32
    x = jax.random.normal(key, (n, h, w, m, d))
    cb = jax.random.normal(jax.random.PRNGKey(3), (m, k, d))
    codes = vqEncode(x, cb)
    assert codes.shape == (n, h, w, m)
    naive = jnp.argmin(vqDistance(x, cb), -1)
    np.testing.assert_array_equal(codes, naive)

    deq = vqDequantizeCodes(codes, cb)
    assert deq.shape == (n, h, w, m * d)
    # one-hot soft decode must agree with gather decode
    oneHot = jax.nn.one_hot(codes, k)
    soft = vqDequantizeSoft(oneHot, cb)
    np.testing.assert_allclose(deq, soft, atol=1e-5)


def test_vq_encode_exact_on_codebook_points():
    """Encoding codebook vectors themselves returns their own indices."""
    m, k, d = 1, 8, 4
    cb = jax.random.normal(jax.random.PRNGKey(4), (m, k, d))
    x = cb[0][None, :, None].reshape(1, k, 1, m, d)
    codes = vqEncode(x, cb)
    np.testing.assert_array_equal(np.asarray(codes).ravel(), np.arange(k))


def test_reassign_codebook_replaces_dead_codes():
    m, k, d = 2, 16, 4
    cb = jax.random.normal(jax.random.PRNGKey(5), (m, k, d))
    freq = jnp.ones((m, k)) / k
    # kill codes 3..5 in group 0
    freq = freq.at[0, 3:6].set(0.0)
    newCb, prop = reassignCodebook(jax.random.PRNGKey(6), cb, freq)
    # dead slots changed, alive slots untouched
    changed = np.asarray(jnp.any(newCb != cb, -1))
    assert changed[0, 3:6].all()
    assert not changed[0, :3].any() and not changed[0, 6:].any()
    assert not changed[1].any()
    assert 0 < float(prop) <= 3 / 16 + 1e-6


def test_reassign_codebook_half_limit():
    """With >k/2 dead codes, only k/2 are replaced this round."""
    m, k, d = 1, 16, 4
    cb = jax.random.normal(jax.random.PRNGKey(7), (m, k, d))
    freq = jnp.zeros((m, k)).at[0, 0].set(1.0)  # 15 dead
    newCb, _ = reassignCodebook(jax.random.PRNGKey(8), cb, freq)
    changed = np.asarray(jnp.any(newCb != cb, -1))[0]
    assert changed.sum() == k // 2


def test_vq_encode_chunked_matches_plain():
    from mcquic_tpu.ops.vq import vqEncodeChunked
    key = jax.random.PRNGKey(9)
    n, h, w, m, d, k = 2, 3, 5, 2, 8, 300   # k not multiple of chunk
    x = jax.random.normal(key, (n, h, w, m, d))
    cb = jax.random.normal(jax.random.PRNGKey(10), (m, k, d))
    got = vqEncodeChunked(x, cb, chunk=128)
    want = jnp.argmin(vqDistance(x, cb), -1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_residual_quantizer_rejects_halving_final_level():
    """size lists must end with an equal pair: the smallest level's backward
    is identity (reference quantizer.py:616/641), so a halving final entry
    would break the residual peeling with an opaque broadcast error."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from mcquic_tpu.models.quantizer import ResidualBackwardQuantizer

    q = ResidualBackwardQuantizer(k=8, size=(4, 2))
    with _pytest.raises(ValueError, match="equal pair"):
        q.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
               jnp.zeros((1, 8, 8, 8)), train=False)
