"""End-to-end A/B for the packed-layout early backbone (stages 1-3).

experiments/packed_mbconv_pallas.py measures the per-block story; this
file measures the real integration shape, where relayouts happen only at
region boundaries. Round-4 v2 findings folded in:

  * the honest baseline is the WHOLE flax stage-1..3 chain in ONE jit
    (19.5 ms for D0 b128 on v5e) — per-block jits pay boundary layouts
    and overstate the win;
  * stride-2 packed blocks via strided slices are catastrophic in XLA
    (~25x slow). The fix is the HYBRID block: its 1x1 expand matmul reads
    the packed layout and emits NHWC ("ie,bin->bne" — the transpose rides
    the MXU op for free), the stride-2 depthwise runs as a native NHWC
    XLA conv, and the project matmul emits packed again ("bhwe,eo->bohw")
    — so inter-block HBM arrays stay lane-dense with ZERO explicit
    relayout ops anywhere in the region;
  * stride-1 blocks use the v1 fused Pallas kernel (the mask-free
    row-padded rp variant measured SLOWER than v1 on-chip — 13.7 vs 9.5 ms
    at d0s2b1 — so the chain stays on the plain (B, C, H*W) layout).

Routes mix three modes per block: 'pallas' (fused kernel), 'hybrid'
(packed-I/O, NHWC-internal XLA; stride-2 capable), 'nhwc' (the model's
flax block). Layout transitions ride the hybrid matmuls; pack_x/unpack_x
are inserted only where a pallas/nhwc block abuts the other layout.

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
    routes: tuple  # routes to measure, each len(blocks) of nhwc|pallas|hybrid


# B0 stages 1-3 (configs.BACKBONE_BLOCK_TABLES b0, width 1.0), b128 @512.
# NOTE (advisor r4): s2b1/s3b1 carry the stage-first-block SE width (4/6)
# where the real repeat blocks (input==output filters) have 6/10 — parity
# is unaffected (truth block built from the same se_ratio); shapes kept as
# measured. See the matching note in packed_mbconv_pallas.BLOCKS.
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
        # narrow: only the s1 kernel win, exit NHWC riding s2b0's project
        ("pallas", "hybrid", "nhwc", "nhwc", "nhwc"),
        # medium: + s2b1 kernel, exit riding s3b0's project
        ("pallas", "hybrid", "pallas", "hybrid", "nhwc"),
        # wide: everything packed, explicit unpack after pallas s3b1
        ("pallas", "hybrid", "pallas", "hybrid", "pallas"),
    ),
)

# B4 (width 1.4, depth 1.8): stem 48; s1: 48->24 x2 e1k3; s2: 24->32 x4
# e6k3; s3: 32->56 x4 e6k5. b16 @1024. The 512^2 s1 blocks exceed the
# monolithic kernel's VMEM and are e1 (no matmul to ride) -> keep nhwc.
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
        # stage-2 kernels only: enter riding s2b0's expand, exit at s3b0
        ("nhwc", "nhwc", "hybrid", "pallas", "pallas", "pallas", "hybrid",
         "nhwc", "nhwc", "nhwc"),
        # + stage-3 kernels, explicit unpack after s3b3
        ("nhwc", "nhwc", "hybrid", "pallas", "pallas", "pallas", "hybrid",
         "pallas", "pallas", "pallas"),
    ),
)

# CPU/interpret parity spec: every code path (pallas stride-1 w/ and w/o
# expand+skip, hybrid stride-2 rp->rp / nhwc->rp / rp->nhwc, k5,
# mid-chain nhwc) at toy sizes.
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
        ("pallas", "hybrid", "nhwc", "hybrid", "pallas"),
        ("pallas", "hybrid", "pallas", "hybrid", "nhwc"),
        ("nhwc", "hybrid", "pallas", "hybrid", "pallas"),
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


# ----------------------------- hybrid block: packed I/O, NHWC-internal XLA
#
# The 1x1 matmuls at both ends of an MBConv absorb the layout transposes
# for free (einsum output order), so the block's interior — including the
# stride-2 depthwise, which XLA lowers well ONLY in NHWC — runs native
# while its HBM neighbours stay lane-dense.


def hybrid_block(x, packed, blk: ChainBlock, W: int,
                 in_layout: str, out_layout: str):
    (wexp, bexp, wdw, bdw, wser, bser, wsee, bsee, wproj, bproj) = packed
    assert blk.has_expand, "hybrid entry/exit rides the expand/project"
    assert not blk.has_skip or (in_layout == out_layout == "nhwc")
    f32 = jnp.float32
    b = x.shape[0]
    Wo = W // blk.stride

    if in_layout == "packed":
        e = jnp.einsum("ie,bin->bne", wexp, x, preferred_element_type=f32)
        e = jax.nn.swish(e + bexp.astype(f32).reshape(1, 1, blk.cexp))
        e = e.astype(x.dtype).reshape(b, W, W, blk.cexp)
    else:
        e = jnp.einsum("bhwi,ie->bhwe", x, wexp, preferred_element_type=f32)
        e = jax.nn.swish(e + bexp.astype(f32).reshape(1, 1, 1, blk.cexp))
        e = e.astype(x.dtype)

    dw_kernel = wdw.T.reshape(blk.ksize, blk.ksize, 1, blk.cexp)
    dw = jax.lax.conv_general_dilated(
        e, dw_kernel,
        window_strides=(blk.stride, blk.stride),
        padding="SAME",
        feature_group_count=blk.cexp,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32,
    )
    dw = jax.nn.swish(dw + bdw.astype(f32).reshape(1, 1, 1, blk.cexp))

    pool = jnp.mean(dw, axis=(1, 2))  # (B, Ce) f32
    r = jax.nn.swish(pool @ wser.astype(f32) + bser.astype(f32)[:, 0])
    scale = jax.nn.sigmoid(r @ wsee.astype(f32) + bsee.astype(f32)[:, 0])
    sdw = (dw * scale[:, None, None, :]).astype(x.dtype)

    if out_layout == "packed":
        y = jnp.einsum("bhwe,eo->bohw", sdw, wproj,
                       preferred_element_type=f32)
        y = y + bproj.astype(f32).reshape(1, blk.cout, 1, 1)
        return y.astype(x.dtype).reshape(b, blk.cout, Wo * Wo)
    y = jnp.einsum("bhwe,eo->bhwo", sdw, wproj, preferred_element_type=f32)
    y = y + bproj.astype(f32).reshape(1, 1, 1, blk.cout)
    if blk.has_skip:
        y = y + x.astype(f32)
    return y.astype(x.dtype)


# ----------------------------------------------------------- routed chain


def routed_chain(x_nhwc, params, packed_list, spec: ChainSpec, route,
                 flax_blocks, interpret=False):
    """Apply the block sequence per ``route``; layout transitions ride the
    hybrid matmuls, with explicit pack_rp/unpack_rp only at pallas/nhwc
    junctions."""
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
        elif mode == "pallas":
            if layout == "nhwc":
                x = pack_x(x)
                layout = "packed"
            shape = PallasShape(
                blk.name, x.shape[0], W, blk.cin, blk.cexp, blk.cout,
                blk.ksize, blk.se_reduced,
            )
            x = packed_mbconv(x, packed, shape, interpret=interpret)
        elif mode == "hybrid":
            out_layout = "nhwc" if nxt == "nhwc" else "packed"
            x = hybrid_block(x, packed, blk, W, layout, out_layout)
            layout = out_layout
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


def run_chain(spec: ChainSpec, steps: int, interpret: bool,
              trace_dir: str | None = None):
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
        if trace_dir:
            with jax.profiler.trace(trace_dir):
                for _ in range(5):
                    out = flax_fwd(params, x)
                fence(out)
            print(f"baseline trace -> {trace_dir}", flush=True)

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
    ap.add_argument("--trace", default=None,
                    help="dir to write a baseline profiler trace into")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    for name in args.chains.split(","):
        run_chain(CHAINS[name], args.steps, args.interpret, args.trace)


if __name__ == "__main__":
    main()
