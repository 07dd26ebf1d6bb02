"""Pallas VQ kernel equivalence vs the jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.ops.vq import vqEncode
from mcquic_tpu.ops.vq_pallas import vqEncodeFused, vqEncodeGrouped


@pytest.mark.parametrize("m,T,d,k", [
    (1, 64, 8, 128),     # neon-ish geometry
    (2, 100, 16, 200),   # non-aligned T and k (padding paths)
    (2, 256, 64, 512),   # qp2-ish geometry
])
def test_pallas_matches_jnp(m, T, d, k):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, T, d))
    cb = jax.random.normal(jax.random.PRNGKey(1), (m, k, d))
    got = vqEncodeGrouped(x, cb, blockT=64, blockK=128, interpret=True)
    # reference: [n,h,w,m,d] layout
    xr = x.transpose(1, 0, 2).reshape(1, T, 1, m, d)
    want = vqEncode(xr, cb).reshape(T, m).transpose(1, 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("m,T,d,k", [
    (1, 64, 8, 128),
    (2, 100, 16, 200),   # non-aligned T and k (padding paths)
    (2, 300, 64, 1024),  # qp2-ish geometry, several k tiles
])
def test_resident_kernel_matches_jnp(m, T, d, k):
    from mcquic_tpu.ops.vq_pallas import vqEncodeResident
    x = jax.random.normal(jax.random.PRNGKey(0), (m, T, d))
    cb = jax.random.normal(jax.random.PRNGKey(1), (m, k, d))
    got = vqEncodeResident(x, cb, interpret=True)
    xr = x.transpose(1, 0, 2).reshape(1, T, 1, m, d)
    want = vqEncode(xr, cb).reshape(T, m).transpose(1, 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_wrapper_layout():
    n, h, w, m, d, k = 2, 4, 6, 2, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(2), (n, h, w, m, d))
    cb = jax.random.normal(jax.random.PRNGKey(3), (m, k, d))
    got = vqEncodeFused(x, cb, interpret=True)
    want = vqEncode(x, cb)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
