"""Flash-attention Pallas kernel vs the generator's SDPA math
(ops/attention_pallas.py; reference flash-attn was installed but never
enabled, generator_3.py:509-543)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.ops.attention_pallas import flashAttention


def _sdpa(q, k, v, mask=None):
    """The exact math from models/generator.AnyResAttention:119-128."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask[None, None].astype(bool), logits, -1e9)
    probs = jax.nn.softmax(logits, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@pytest.mark.parametrize("tq,tk", [(128, 128), (37, 100), (257, 64), (596, 596)])
def test_full_attention_matches_sdpa(tq, tk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 32
    q = jnp.asarray(rng.normal(0, 1, (b, tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, tk, h, d)), jnp.float32)
    ref = _sdpa(q, k, v)
    out = flashAttention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_masked_attention_matches_sdpa():
    """Block-causal-style mask (the generator's training mask shape)."""
    rng = np.random.default_rng(1)
    b, h, d, t = 2, 2, 64, 96
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    # block-causal over blocks of 16
    blocks = np.arange(t) // 16
    mask = jnp.asarray(blocks[:, None] >= blocks[None, :], jnp.int8)
    ref = _sdpa(q, k, v, mask)
    out = flashAttention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_attention_close():
    rng = np.random.default_rng(2)
    b, h, d, t = 1, 4, 64, 200
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.bfloat16)
    ref = _sdpa(q, k, v).astype(jnp.float32)
    out = flashAttention(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_fully_masked_rows_are_finite():
    """Rows with no visible keys must not NaN (padding rows share this
    property via the zero-padded mask)."""
    rng = np.random.default_rng(3)
    b, h, d, t = 1, 1, 32, 40
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    mask = jnp.zeros((t, t), jnp.int8).at[: t // 2].set(1)
    out = flashAttention(q, k, v, mask=mask)
    assert np.isfinite(np.asarray(out)).all()
