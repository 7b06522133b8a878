"""Mixed-precision BatchNorm that never materialises f32 activations.

Why not ``nn.BatchNorm(dtype=f32)``: with bf16 compute, flax's BatchNorm
promotes the whole activation tensor to float32 (and per TPU tiling rules a
dtype convert is a retile copy), so every BN in the network writes + reads a
2x-sized f32 copy of its input. Device traces showed exactly these convert
passes dominating the bf16 *training* backward pass (docs/DESIGN.md "hot-path
measurements": bf16 training measured 98 img/s vs f32's 175 at D0/b32), which
forced training to run in f32.

This module keeps the activation tensor in its own dtype end-to-end:

* batch statistics are computed with float32 *accumulation* directly from the
  bf16 tensor (``convert`` fused into the reduce — registers, not HBM);
* the normalisation is algebraically refactored to a per-channel affine
  ``y = x * a + b`` with ``a = scale / sqrt(var + eps)`` and
  ``b = bias - mean * a`` computed in f32 on (C,)-vectors, then applied in
  the activation dtype — one fused elementwise op XLA folds into the
  producing conv's epilogue.

Parameter and collection layout is IDENTICAL to ``flax.linen.BatchNorm``
(params ``scale``/``bias``, batch_stats ``mean``/``var``, all f32), so
checkpoints, ``utils/fold_bn.py`` and ``utils/convert.py`` are unaffected.

Reference parity: the reference's Keras BatchNormalization (momentum 0.99,
eps 1e-3) computes the same math in f32; in f32 mode this module is
numerically equivalent (fast-variance form, as flax defaults) — tested
against ``nn.BatchNorm`` in tests/test_normalization.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class TpuBatchNorm(nn.Module):
    """Drop-in BatchNorm: f32 statistics, activation-dtype data path."""

    use_running_average: bool = True
    momentum: float = 0.99
    epsilon: float = 1e-3
    # Accepted for signature parity with nn.BatchNorm; the output always
    # follows the *input* dtype (the callers' trailing .astype is a no-op).
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        xf = x.astype(jnp.float32)  # fused: converts stay in registers
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=red)
            mean2 = jnp.mean(jnp.square(xf), axis=red)
            # Fast variance (flax default): E[x^2] - E[x]^2, clamped.
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * jax.lax.stop_gradient(mean)
                ra_var.value = m * ra_var.value + (1.0 - m) * jax.lax.stop_gradient(var)

        a = jax.lax.rsqrt(var + self.epsilon) * scale  # (C,) f32
        b = bias - mean * a
        # Affine in f32 registers, output in the activation dtype: one fused
        # elementwise op; no f32 tensor ever reaches HBM.
        return (xf * a + b).astype(x.dtype)
