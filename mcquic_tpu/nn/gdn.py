"""Generalized Divisive Normalization, NHWC.

Parity with reference `mcquic/nn/gdn.py:28-91`:
    y[i] = x[i] * rsqrt(beta[i] + sum_j gamma[j,i] x[j]^2)   (GDN)
    y[i] = x[i] *  sqrt(beta[i] + sum_j gamma[j,i] x[j]^2)   (IGDN)
with grouped mixing and non-negative reparametrized beta/gamma
(NonNegativeParametrizer, `nn/base.py:57-84`).

TPU note: the x^2 mixing is a grouped 1x1 conv — a pure MXU matmul in NHWC —
and XLA fuses the square / rsqrt / multiply around it.
"""
import jax
import jax.numpy as jnp
from flax import linen as nn

from mcquic_tpu.nn.functional import nonNegativeApply, nonNegativeInit


class GenDivNorm(nn.Module):
    groups: int = 1
    biasBound: float = 1e-4
    weightInit: float = 0.1
    inverse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.groups
        cg = c // g

        def betaInit(key, shape, dtype):
            return nonNegativeInit(jnp.ones(shape, dtype))

        def gammaInit(key, shape, dtype):
            # Block-diagonal identity scaled by weightInit: [g, cg(in), cg(out)].
            eye = jnp.eye(cg, dtype=dtype) * self.weightInit
            return nonNegativeInit(jnp.broadcast_to(eye, shape))

        beta = self.param("beta", betaInit, (c,), jnp.float32)
        gamma = self.param("gamma", gammaInit, (g, cg, cg), jnp.float32)

        beta = nonNegativeApply(beta, minimum=self.biasBound)
        gamma = nonNegativeApply(gamma)

        n, h, w, _ = x.shape
        # Grouped 1x1 conv over x^2: [n,h,w,g,cg] x [g,cg,cg] -> [n,h,w,g,cg].
        # The mixing matmul runs in the compute dtype (bf16 on TPU: fp32
        # matmuls have no native MXU path) with fp32 accumulation; the
        # rsqrt/sqrt stays fp32 for range safety.
        xc = x.astype(self.dtype)
        x2 = (xc * xc).reshape(n, h, w, g, cg)
        std = jnp.einsum("nhwgi,gio->nhwgo", x2, gamma.astype(self.dtype),
                         preferred_element_type=jnp.float32).reshape(n, h, w, c)
        std = std.astype(jnp.float32) + beta
        scale = jnp.sqrt(std) if self.inverse else jax.lax.rsqrt(std)
        # multiply in the compute dtype: avoids materializing fp32 copies of
        # the (large) activation tensors on bandwidth-bound chips
        return xc * scale.astype(self.dtype) if self.dtype != jnp.float32 \
            else x * scale


class InvGenDivNorm(GenDivNorm):
    inverse: bool = True
