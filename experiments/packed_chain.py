"""End-to-end A/B for the packed-layout early backbone (stages 1-3).

experiments/packed_mbconv_pallas.py measured the per-block story on v5e:
the fused Pallas kernel on the lane-dense (B, C, H*W) layout beats XLA
NHWC 3.43x resident on d0s1, 1.26x on d0s2b1, and LOSES 0.53x on the k5
stage-3 block — but a per-block pack/unpack relayout eats every win
(XLA's (B,C,N)->NHWC transpose runs ~20x off bandwidth). This experiment
measures the real integration shape, where relayouts happen only at
REGION BOUNDARIES:

  * pack ONCE after the stem (measured 1.2-2.5 ms),
  * run a ROUTE of blocks: 'pallas' (fused kernel), 'xla2' (same packed
    math left to XLA — handles stride-2, where 4D strided-slice taps need
    no wrap masks), or 'nhwc' (the model's flax block),
  * the LAST packed xla2 block fuses the unpack away by emitting its
    project matmul as "eo,ben->bno" — (B, N, C) IS flattened NHWC, so
    region exit costs zero extra HBM traffic.

Truth is the model's own flax MBConvBlock(fuse_bn=True) chain; parity is
asserted per route, then each route is timed. Measured: docs/DESIGN.md 6i.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/packed_chain.py
       [--chains d0,d4] [--steps 20] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from experiments.packed_mbconv_pallas import (
    _taps,
    pack_x,
    packed_mbconv,
    unpack_x,
)
from experiments.packed_mbconv_pallas import BlockShape as PallasShape


class ChainBlock(NamedTuple):
    name: str
    cin: int
    cexp: int
    cout: int
    ksize: int
    stride: int
    se_reduced: int

    @property
    def has_expand(self):
        return self.cexp != self.cin

    @property
    def has_skip(self):
        return self.stride == 1 and self.cin == self.cout


class ChainSpec(NamedTuple):
    name: str
    batch: int
    hw: int  # stem-output side
    cin: int
    blocks: tuple
    routes: tuple  # routes to measure, each len(blocks) of nhwc|pallas|xla2


# B0 stages 1-3 (configs.BACKBONE_BLOCK_TABLES b0, width 1.0), b128 @512.
D0_CHAIN = ChainSpec(
    "d0", 128, 256, 32,
    (
        ChainBlock("s1b0", 32, 32, 16, 3, 1, 8),
        ChainBlock("s2b0", 16, 96, 24, 3, 2, 4),
        ChainBlock("s2b1", 24, 144, 24, 3, 1, 4),
        ChainBlock("s3b0", 24, 144, 40, 5, 2, 6),
        ChainBlock("s3b1", 40, 240, 40, 5, 1, 6),
    ),
    (
        # narrow: only the 3.43x s1 win, exit fused at s2b0
        ("pallas", "xla2", "nhwc", "nhwc", "nhwc"),
        # medium: s1 + s2b1 wins, exit fused at s3b0
        ("pallas", "xla2", "pallas", "xla2", "nhwc"),
        # wide: everything packed, exit unpack after pallas s3b1
        ("pallas", "xla2", "pallas", "xla2", "pallas"),
    ),
)

# B4 (width 1.4, depth 1.8): stem 48; s1: 48->24 x2 e1k3; s2: 24->32 x4
# e6k3; s3: 32->56 x4 e6k5. b16 @1024. The 512^2 and Ce>=192 @256^2 blocks
# exceed the monolithic kernel's VMEM -> xla2 there.
D4_CHAIN = ChainSpec(
    "d4", 16, 512, 48,
    (
        ChainBlock("s1b0", 48, 48, 24, 3, 1, 12),
        ChainBlock("s1b1", 24, 24, 24, 3, 1, 6),
        ChainBlock("s2b0", 24, 144, 32, 3, 2, 6),
        ChainBlock("s2b1", 32, 192, 32, 3, 1, 8),
        ChainBlock("s2b2", 32, 192, 32, 3, 1, 8),
        ChainBlock("s2b3", 32, 192, 32, 3, 1, 8),
        ChainBlock("s3b0", 32, 192, 56, 5, 2, 8),
        ChainBlock("s3b1", 56, 336, 56, 5, 1, 14),
        ChainBlock("s3b2", 56, 336, 56, 5, 1, 14),
        ChainBlock("s3b3", 56, 336, 56, 5, 1, 14),
    ),
    (
        # stage-1 only (the 512^2 tile-pad hotspot), exit fused at s2b0
        ("xla2", "xla2", "xla2", "nhwc", "nhwc", "nhwc", "nhwc", "nhwc",
         "nhwc", "nhwc"),
        # stages 1-2 packed (pallas where VMEM fits), exit fused at s3b0
        ("xla2", "xla2", "xla2", "xla2", "xla2", "xla2", "xla2", "nhwc",
         "nhwc", "nhwc"),
    ),
)

# CPU/interpret parity spec: every code path (pallas stride-1 w/ and w/o
# expand+skip, xla2 stride-2 + fused-nhwc exit, k5, mid-chain nhwc) at toy
# sizes.
TINY_CHAIN = ChainSpec(
    "tiny", 2, 16, 8,
    (
        ChainBlock("s1b0", 8, 8, 4, 3, 1, 2),
        ChainBlock("s2b0", 4, 24, 8, 3, 2, 1),
        ChainBlock("s2b1", 8, 48, 8, 3, 1, 2),
        ChainBlock("s3b0", 8, 48, 8, 5, 2, 2),
        ChainBlock("s3b1", 8, 48, 8, 5, 1, 2),
    ),
    (
        ("pallas", "xla2", "nhwc", "xla2", "pallas"),
        ("pallas", "xla2", "pallas", "xla2", "nhwc"),
        ("xla2", "xla2", "xla2", "xla2", "xla2"),
    ),
)

CHAINS = {"d0": D0_CHAIN, "d4": D4_CHAIN, "tiny": TINY_CHAIN}


# ------------------------------------------------------------- flax truth


def build_flax_blocks(spec: ChainSpec, dtype):
    from efficientdet_tpu.configs import BlockConfig
    from efficientdet_tpu.models.efficientnet import MBConvBlock

    blocks = []
    for blk in spec.blocks:
        cfg = BlockConfig(
            kernel_size=blk.ksize,
            num_repeat=1,
            input_filters=blk.cin,
            output_filters=blk.cout,
            expand_ratio=blk.cexp // blk.cin if blk.has_expand else 1,
            strides=blk.stride,
            se_ratio=blk.se_reduced / blk.cin,
        )
        blocks.append(
            MBConvBlock(
                config=cfg, input_filters=blk.cin, output_filters=blk.cout,
                strides=blk.stride, survival_prob=1.0, dtype=dtype,
                fuse_bn=True,
            )
        )
    return blocks


def flax_chain(spec: ChainSpec, dtype=jnp.bfloat16):
    """The real model blocks (fuse_bn) chained; returns (params, fwd, mods)."""
    blocks = build_flax_blocks(spec, dtype)
    rng = np.random.RandomState(1)
    params = []
    hw = spec.hw
    for blk, mod in zip(spec.blocks, blocks):
        x0 = jnp.zeros((1, hw, hw, blk.cin), dtype)
        p = mod.init(jax.random.PRNGKey(0), x0)["params"]
        p = jax.tree.map(
            lambda a: jnp.asarray(rng.normal(scale=0.1, size=a.shape),
                                  a.dtype),
            p,
        )
        params.append(p)
        hw //= blk.stride

    def fwd(params, x):
        for mod, p in zip(blocks, params):
            x = mod.apply({"params": p}, x)
        return x

    return params, jax.jit(fwd), blocks


# --------------------------------------------- packed params (chain form)


def chain_pack_params(params, spec: ChainSpec, dtype=jnp.bfloat16):
    out = []
    for blk, p in zip(spec.blocks, params):
        k = blk.ksize

        def a(x):
            return jnp.asarray(x, dtype)

        if blk.has_expand:
            wexp = a(p["expand_conv"]["kernel"]).reshape(blk.cin, blk.cexp)
            bexp = a(p["expand_conv"]["bias"]).reshape(blk.cexp, 1)
        else:
            wexp = jnp.zeros((1, 1), dtype)
            bexp = jnp.zeros((1, 1), dtype)
        wdw = a(p["depthwise_conv"]["kernel"]).reshape(k * k, blk.cexp).T
        bdw = a(p["depthwise_conv"]["bias"]).reshape(blk.cexp, 1)
        wser = a(p["se"]["reduce"]["kernel"]).reshape(blk.cexp,
                                                      blk.se_reduced)
        bser = a(p["se"]["reduce"]["bias"]).reshape(blk.se_reduced, 1)
        wsee = a(p["se"]["expand"]["kernel"]).reshape(blk.se_reduced,
                                                      blk.cexp)
        bsee = a(p["se"]["expand"]["bias"]).reshape(blk.cexp, 1)
        wproj = a(p["project_conv"]["kernel"]).reshape(blk.cexp, blk.cout)
        bproj = a(p["project_conv"]["bias"]).reshape(blk.cout, 1)
        out.append((wexp, bexp, wdw, bdw, wser, bser, wsee, bsee,
                    wproj, bproj))
    return out


# ------------------------------- packed math in plain XLA, stride 1 and 2
#
# 4D (B, C, H, W) tap slicing: real 2D zero padding absorbs the edges, so
# no lane-wrap masks are needed (they are a flattened-lane/VMEM-kernel
# constraint, not an XLA one); stride-2 is a strided slice per tap.


def xla_packed_block(xp, packed, blk: ChainBlock, W: int,
                     out_nhwc: bool = False):
    (wexp, bexp, wdw, bdw, wser, bser, wsee, bsee, wproj, bproj) = packed
    b, cin, n = xp.shape
    assert n == W * W
    p = (blk.ksize - 1) // 2
    s = blk.stride
    Wo = W // s
    f32 = jnp.float32

    if blk.has_expand:
        e = jnp.einsum("ie,bin->ben", wexp, xp, preferred_element_type=f32)
        e = jax.nn.swish(e + bexp.astype(f32)).astype(xp.dtype)
    else:
        e = xp
    e4 = e.reshape(b, blk.cexp, W, W)
    epad = jnp.pad(e4, ((0, 0), (0, 0), (p, p), (p, p)))
    # TF-style SAME: pad_left = (max((Wo-1)*s + k - W, 0)) // 2, which for
    # stride 2 on even W is p-1 (asymmetric) — the tap window of output yo
    # starts at s*yo - pad_left, i.e. shifted by (p - pad_left) inside our
    # symmetric p-padded buffer.
    pad_left = max((Wo - 1) * s + blk.ksize - W, 0) // 2
    shift = p - pad_left
    acc = jnp.zeros((b, blk.cexp, Wo, Wo), f32)
    for t, (dy, dx) in enumerate(_taps(blk.ksize)):
        v = jax.lax.slice(
            epad,
            (0, 0, p + dy + shift, p + dx + shift),
            (b, blk.cexp, p + dy + shift + (Wo - 1) * s + 1,
             p + dx + shift + (Wo - 1) * s + 1),
            (1, 1, s, s),
        ).astype(f32)
        acc = acc + v * wdw[:, t].astype(f32).reshape(1, blk.cexp, 1, 1)
    dwo = jax.nn.swish(acc + bdw.astype(f32).reshape(1, blk.cexp, 1, 1))
    dwo = dwo.reshape(b, blk.cexp, Wo * Wo)
    pool = jnp.mean(dwo, axis=2, keepdims=True)
    r = jax.nn.swish(
        jnp.einsum("er,ben->brn", wser.astype(f32), pool) + bser.astype(f32)
    )
    scale = jax.nn.sigmoid(
        jnp.einsum("re,brn->ben", wsee.astype(f32), r) + bsee.astype(f32)
    )
    sdw = (dwo * scale).astype(xp.dtype)
    if out_nhwc:
        # Region exit: (B, N, C) IS flattened NHWC — the unpack rides the
        # project matmul's output for free. Skip-add would need xp
        # transposed, so fused exit is only for skip-free blocks.
        assert not blk.has_skip
        y = jnp.einsum("eo,ben->bno", wproj, sdw,
                       preferred_element_type=f32)
        y = y + bproj.astype(f32).reshape(1, 1, blk.cout)
        return y.astype(xp.dtype).reshape(b, Wo, Wo, blk.cout)
    y = jnp.einsum("eo,ben->bon", wproj, sdw, preferred_element_type=f32)
    y = y + bproj.astype(f32)
    if blk.has_skip:
        y = y + xp.astype(f32)
    return y.astype(xp.dtype)


# ----------------------------------------------------------- routed chain


def routed_chain(x_nhwc, params, packed_list, spec: ChainSpec, route,
                 flax_blocks, interpret=False):
    """Apply the block sequence per ``route``, inserting relayouts only at
    region boundaries; an xla2 block followed by nhwc exits fused."""
    W = spec.hw
    x = x_nhwc
    layout = "nhwc"
    for i, (blk, mode, p, packed, mod) in enumerate(
        zip(spec.blocks, route, params, packed_list, flax_blocks)
    ):
        nxt = route[i + 1] if i + 1 < len(route) else "nhwc"
        if mode == "nhwc":
            if layout == "packed":
                x = unpack_x(x, W)
                layout = "nhwc"
            x = mod.apply({"params": p}, x)
        else:
            if layout == "nhwc":
                x = pack_x(x)
                layout = "packed"
            if mode == "pallas":
                shape = PallasShape(
                    blk.name, x.shape[0], W, blk.cin, blk.cexp, blk.cout,
                    blk.ksize, blk.se_reduced,
                )
                x = packed_mbconv(x, packed, shape, interpret=interpret)
            elif mode == "xla2":
                fuse_exit = nxt == "nhwc" and not blk.has_skip
                x = xla_packed_block(x, packed, blk, W, out_nhwc=fuse_exit)
                if fuse_exit:
                    layout = "nhwc"
            else:
                raise ValueError(mode)
        W //= blk.stride
    if layout == "packed":
        x = unpack_x(x, W)
    return x


# ------------------------------------------------------------------ harness


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][..., -1])


def timed(fn, args, steps):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / steps * 1e3, out


def run_chain(spec: ChainSpec, steps: int, interpret: bool):
    dtype = jnp.float32 if interpret else jnp.bfloat16
    params, flax_fwd, flax_blocks = flax_chain(spec, dtype)
    packed_list = chain_pack_params(params, spec, dtype)

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.normal(size=(spec.batch, spec.hw, spec.hw, spec.cin)), dtype
    )
    want = flax_fwd(params, x)
    mag = float(jnp.max(jnp.abs(want.astype(jnp.float32))))

    ms_ref = None
    if not interpret:
        ms_ref, _ = timed(flax_fwd, (params, x), steps)
        print(json.dumps({"chain": spec.name, "route": "nhwc-baseline",
                          "ms": round(ms_ref, 3)}), flush=True)

    for route in spec.routes:
        fn = functools.partial(
            routed_chain, spec=spec, route=route, flax_blocks=flax_blocks,
            interpret=interpret,
        )
        jfn = fn if interpret else jax.jit(fn)
        got = jfn(x, params, packed_list)
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - want.astype(jnp.float32))))
        tol = 1e-3 if dtype == jnp.float32 else 0.08
        assert err <= tol * max(mag, 1.0), (spec.name, route, err, mag)
        if interpret:
            print(json.dumps({"chain": spec.name, "route": list(route),
                              "parity": "ok", "max_err": round(err, 5)}),
                  flush=True)
            continue
        ms, _ = timed(jfn, (x, params, packed_list), steps)
        print(
            json.dumps(
                {
                    "chain": spec.name,
                    "batch": spec.batch,
                    "route": list(route),
                    "ms": round(ms, 3),
                    "xla_nhwc_ms": round(ms_ref, 3),
                    "speedup": round(ms_ref / ms, 3),
                    "max_err": round(err, 4),
                }
            ),
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", default="d0,d4")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    for name in args.chains.split(","):
        run_chain(CHAINS[name], args.steps, args.interpret)


if __name__ == "__main__":
    main()
