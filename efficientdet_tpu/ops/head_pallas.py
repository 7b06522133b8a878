"""Pallas TPU kernel: the heads' final pointwise conv, anchor-major.

Why this kernel exists (device traces at D0/b128, see docs/DESIGN.md):

* At batch 128 XLA lays conv outputs out batch-minor (batch fills the 128
  vector lanes). Every NMS front-end needs per-image row access to the head
  outputs, so XLA inserts batch-minor -> batch-major retiles of the biggest
  tensors in the program (~6-9 ms/step).
* Expressing the pointwise as a dot does not help: XLA canonicalises it back
  to a convolution and layout assignment re-picks its own layouts (measured:
  two fresh 2.9/3.3 ms copies).
* A Pallas call has FIXED standard layouts at its boundary. XLA then retiles
  the small depthwise-conv input (~67 MB at D0/b128) instead of the
  ~0.9-1.2 GB head outputs.

The kernel fuses matmul + bias + the per-anchor class max (the NMS anchor
prefilter's reduction) in one pass, so the big logits tensor is written once
and not re-read for the max. Outputs are anchor-planed:

  z    (A, M, out)  — plane ``a`` holds anchor ``a``'s outputs for all
                      M = B*H*W pixel rows (bf16/f32 = input dtype);
  amax (A, M)       — max over ``out`` per row (the class head's per-anchor
                      best-class logit).

Row mapping: pixel row ``m = b*H*W + p``; candidate (b, p, a) lives at
``z[a, m]`` i.e. flat row ``a*M + m`` of ``z.reshape(A*M, out)``.

Parity: ``head_pointwise_reference`` computes the same function in plain
jnp (used on CPU and in tests; exactness asserted in
tests/test_head_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 512


def _head_pw_kernel(
    x_ref, k_ref, b_ref, out_ref, amax_ref, *, num_anchors: int, out_per: int
):
    """One M-tile: out[a] = x @ k[:, a] + bias[a]; amax[a] = rowmax(out[a])."""
    x = x_ref[...]  # (TM, Cin)
    for a in range(num_anchors):
        k = k_ref[:, a * out_per : (a + 1) * out_per]  # (Cin, out)
        acc = jax.lax.dot_general(
            x, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TM, out) f32
        acc = acc + b_ref[0, a * out_per : (a + 1) * out_per][None, :]
        out_ref[a] = acc.astype(out_ref.dtype)
        amax_ref[a] = jnp.max(acc, axis=1).astype(amax_ref.dtype)


def head_pointwise_anchor_major(
    x2d: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    num_anchors: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, int]:
    """(M, Cin) @ (Cin, A*out) + bias -> (z (A, Mp, out), amax (A, Mp), M).

    ``Mp`` is M padded up to a multiple of ROW_TILE; padded rows hold
    bias-only garbage — callers must index only rows < M (``amax`` should be
    sliced to ``[:, :M]``; ``z`` can stay padded since gathers only touch
    real rows).
    """
    m, cin = x2d.shape
    ac = kernel.shape[-1]
    out_per = ac // num_anchors
    pad = (-m) % ROW_TILE
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    mp = m + pad

    z, amax = pl.pallas_call(
        functools.partial(
            _head_pw_kernel, num_anchors=num_anchors, out_per=out_per
        ),
        grid=(mp // ROW_TILE,),
        in_specs=[
            pl.BlockSpec(
                (ROW_TILE, cin), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((cin, ac), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ac), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (num_anchors, ROW_TILE, out_per),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_anchors, ROW_TILE),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_anchors, mp, out_per), x2d.dtype),
            jax.ShapeDtypeStruct((num_anchors, mp), x2d.dtype),
        ],
        interpret=interpret,
    )(
        x2d,
        kernel.astype(x2d.dtype),
        bias.reshape(1, ac).astype(jnp.float32),
    )
    return z, amax, m


def head_pointwise_reference(
    x2d: jax.Array, kernel: jax.Array, bias: jax.Array, num_anchors: int
) -> Tuple[jax.Array, jax.Array, int]:
    """Plain-jnp twin of :func:`head_pointwise_anchor_major` (CPU path)."""
    m, cin = x2d.shape
    ac = kernel.shape[-1]
    out_per = ac // num_anchors
    k = kernel.astype(x2d.dtype)
    acc = jax.lax.dot_general(
        x2d, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias.astype(jnp.float32)
    z = (
        acc.reshape(m, num_anchors, out_per)
        .transpose(1, 0, 2)
        .astype(x2d.dtype)
    )
    amax = jnp.max(z, axis=-1)
    return z, amax, m
