"""Pallas TPU kernel: fused inference MBConv block (stride 1). EXPERIMENTAL.

**Status: correct but NOT wired into the model.** Measured on v5e at D0
shapes (batch 128): 54 ms vs XLA's 8.7 ms for stage1 — the early blocks'
narrow channel counts (16-32) occupy a quarter of the 128-lane VPU in NHWC,
and XLA's conv emitters use internal packed layouts this kernel does not.
Kept as a worked negative result (SURVEY.md SS7 hard part #5 predicted it:
"benchmark first, write kernels only for demonstrated gaps") and as the
starting point if a channel-packed layout variant is attempted.

An MBConv at inference (BN folded) is

    y = proj(se_scale(swish(dw(expand(x)))) ) [+ x]

XLA materialises every intermediate to HBM: for a 128x128x24 block with
expand 6 that is ~25 MB/image of traffic where the fused form needs ~1.6 MB
(read x once, write y once) — measured 8.5-8.6 ms/step at D0 batch 128 per
early block, ~8x above bandwidth speed-of-light.

This kernel keeps the whole (padded) image in VMEM (early D0 blocks are
0.8-4.3 MB) and loops over row tiles internally:

* pass 1: expand (MXU) -> depthwise as k*k shifted multiply-accumulates
  (VPU) -> bias+swish, accumulating the spatial sum for the SE pool. The
  post-swish tensor is NOT stored (it would not fit at 256x256x32 alongside
  the pipelined in/out blocks);
* the SE scale vector is computed from the mean (two tiny matmuls);
* pass 2: recompute expand+dw+swish per tile (VPU/MXU time is cheap next to
  the HBM it saves), multiply by the SE scale, project (MXU), add bias and
  the skip connection, write the output tile.

Stride-2 blocks keep the XLA path (their expanded halo tiles at 256px do
not fit this whole-image scheme); they are 1 of 4+ blocks per stage.

The caller pre-pads x spatially by the conv halo (cheap XLA pad) so every
in-kernel slice is static. Weights arrive pre-folded (utils/fold_bn.py
layout): dw kernel reshaped to (k*k, C).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,       # (1, H+2p, W+2p, Cin) VMEM
    wexp_ref,    # (Cin, Cexp) or (1, 1) dummy when expand_ratio == 1
    bexp_ref,    # (1, Cexp) or dummy
    wdw_ref,     # (k*k, Cexp)
    bdw_ref,     # (1, Cexp)
    wser_ref,    # (Cexp, Cr)
    bser_ref,    # (1, Cr)
    wsee_ref,    # (Cr, Cexp)
    bsee_ref,    # (1, Cexp)
    wproj_ref,   # (Cexp, Cout)
    bproj_ref,   # (1, Cout)
    out_ref,     # (1, H, W, Cout) VMEM
    acc_ref,     # (1, Cexp) f32 scratch
    *,
    H: int,
    W: int,
    cin: int,
    cexp: int,
    cout: int,
    ksize: int,
    tile_h: int,
    has_expand: bool,
    has_skip: bool,
):
    pad = (ksize - 1) // 2
    wp = W + 2 * pad
    n_tiles = H // tile_h

    def dw_post(t):
        """Post-swish depthwise output for out-rows [t*tile_h, +tile_h)."""
        rows = x_ref[0, pl.ds(t * tile_h, tile_h + 2 * pad), :, :]
        if has_expand:
            flat = rows.reshape((tile_h + 2 * pad) * wp, cin)
            e = jax.lax.dot_general(
                flat, wexp_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bexp_ref[0, :]
            e = jax.nn.swish(e).astype(x_ref.dtype)
            e = e.reshape(tile_h + 2 * pad, wp, cexp)
        else:
            e = rows
        acc = jnp.zeros((tile_h, W, cexp), jnp.float32)
        for dy in range(ksize):
            for dx in range(ksize):
                tap = e[dy : dy + tile_h, dx : dx + W, :]
                acc = acc + tap.astype(jnp.float32) * wdw_ref[
                    dy * ksize + dx, :
                ].astype(jnp.float32)
        return jax.nn.swish(acc + bdw_ref[0, :].astype(jnp.float32))

    # pass 1: spatial sum of the post-swish dw output (SE pool numerator)
    acc_ref[0, :] = jnp.zeros((cexp,), jnp.float32)

    def p1(t, _):
        acc_ref[0, :] += jnp.sum(dw_post(t), axis=(0, 1))
        return 0

    jax.lax.fori_loop(0, n_tiles, p1, 0, unroll=False)

    # SE scale: sigmoid(W_e @ swish(W_r @ mean + b_r) + b_e)
    mean = (acc_ref[0, :] / float(H * W)).reshape(1, cexp)
    r = jax.lax.dot_general(
        mean, wser_ref[:, :].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bser_ref[0, :].astype(jnp.float32)
    r = jax.nn.swish(r)
    s = jax.lax.dot_general(
        r, wsee_ref[:, :].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bsee_ref[0, :].astype(jnp.float32)
    scale = jax.nn.sigmoid(s)[0]  # (Cexp,)

    # pass 2: recompute, scale, project, (skip), emit
    def p2(t, _):
        post = dw_post(t) * scale  # (tile_h, W, Cexp) f32
        flat = post.reshape(tile_h * W, cexp).astype(x_ref.dtype)
        y = jax.lax.dot_general(
            flat, wproj_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[0, :].astype(jnp.float32)
        y = y.reshape(tile_h, W, cout)
        if has_skip:
            xin = x_ref[
                0, pl.ds(t * tile_h + pad, tile_h), pl.ds(pad, W), :
            ]
            y = y + xin.astype(jnp.float32)
        out_ref[0, pl.ds(t * tile_h, tile_h), :, :] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, p2, 0, unroll=False)


def fused_mbconv_s1(
    x: jax.Array,
    params: dict,
    ksize: int,
    has_skip: bool,
    tile_h: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused stride-1 inference MBConv.

    Args:
      x: (B, H, W, Cin).
      params: folded param dict of models.efficientnet.MBConvBlock with
        fuse_bn=True — keys: optional ``expand_conv{kernel,bias}``,
        ``depthwise_conv{kernel (k,k,1,Cexp), bias}``,
        ``se/{reduce,expand}{kernel (1,1,i,o), bias}``,
        ``project_conv{kernel (1,1,Cexp,Cout), bias}``.
    Returns (B, H, W, Cout).
    """
    b, h, w, cin = x.shape
    has_expand = "expand_conv" in params
    dw_k = params["depthwise_conv"]["kernel"]  # (k, k, 1, Cexp)
    cexp = dw_k.shape[-1]
    proj_k = params["project_conv"]["kernel"]
    cout = proj_k.shape[-1]
    cr = params["se"]["reduce"]["kernel"].shape[-1]
    pad = (ksize - 1) // 2
    dt = x.dtype

    if tile_h is None:
        tile_h = 32 if h >= 64 else h
    assert h % tile_h == 0, (h, tile_h)

    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    def w2(a, shape):
        return jnp.asarray(a, dt).reshape(shape)

    if has_expand:
        wexp = w2(params["expand_conv"]["kernel"], (cin, cexp))
        bexp = w2(params["expand_conv"]["bias"], (1, cexp))
    else:  # dummies keep the input arity static
        wexp = jnp.zeros((1, 1), dt)
        bexp = jnp.zeros((1, 1), dt)
    args = (
        xp,
        wexp,
        bexp,
        w2(dw_k, (ksize * ksize, cexp)),
        w2(params["depthwise_conv"]["bias"], (1, cexp)),
        w2(params["se"]["reduce"]["kernel"], (cexp, cr)),
        w2(params["se"]["reduce"]["bias"], (1, cr)),
        w2(params["se"]["expand"]["kernel"], (cr, cexp)),
        w2(params["se"]["expand"]["bias"], (1, cexp)),
        w2(proj_k, (cexp, cout)),
        w2(params["project_conv"]["bias"], (1, cout)),
    )

    kernel = functools.partial(
        _kernel,
        H=h, W=w, cin=cin, cexp=cexp, cout=cout, ksize=ksize,
        tile_h=tile_h, has_expand=has_expand, has_skip=has_skip,
    )
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h + 2 * pad, w + 2 * pad, cin),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *[full(a) for a in args[1:]],
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), dt),
        scratch_shapes=[pltpu.VMEM((1, cexp), jnp.float32)],
        # The whole-image blocks exceed the compiler's default 16 MB scoped
        # VMEM budget; v5e has 128 MB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
