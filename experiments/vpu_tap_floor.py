"""Measure the VPU pure-FMA floor for the D0 stage-1..3 depthwise tap
loops, turning DESIGN 6i's estimated single-kernel ceiling into a number
(VERDICT r4 next #5 option b).

Context: 6i closed the packed-layout lever with one path unmeasured — ONE
Pallas kernel spanning backbone stages 1–3 so no intermediate ever touches
HBM. Its best case is bounded below by the VPU time of the depthwise tap
arithmetic itself (every implementation, XLA or Pallas, must execute
K*K multiply-adds per output element on the 8x128 VPU; the MXU cannot run
depthwise convs). This script measures that bound directly:

  * ``fma floor``: a Pallas kernel whose inner loop is NOTHING BUT the tap
    FMAs — a VMEM-resident block, ``taps * repeats`` multiply-adds per
    element, grid over blocks. ``repeats`` makes HBM traffic negligible
    (arithmetic intensity ~taps*repeats FLOP/byte), so the measured rate
    IS the VPU FMA ceiling at kernel-realistic block shapes. Swept over
    dtype (f32/bf16 — bf16 VPU ops pack 2x) and the number of independent
    accumulator CHAINS (1 = the strict serial accumulation a naive tap
    loop produces; 4 = a tree-reassociated accumulation any real kernel
    could use — hides FMA latency). The FLOOR uses the best combination;
    measured values are recorded in docs/DESIGN.md 6i addendum.
  * ``swish floor``: same harness with the MBConv activation body
    (x * sigmoid(x)) — the other mandatory VPU work in the fused chain.

From the measured rates it recomputes the floor of the hypothetical
stages-1..3 single kernel at the D0 record batch (b128 @512):

  floor = taps_FMAs / R_fma + act_elems / R_swish + HBM(chain in+out)
          + MXU time of the expand/project 1x1 matmuls (measured as
          jitted bf16 batched matmuls at the same shapes, scalar-reduced
          and dependency-chained so XLA can neither cache nor hoist them)

and reports the implied ceiling vs the measured 19.1 ms XLA chain
(docs/DESIGN.md 6i) and vs D0's 54.5 ms whole-model batch. The floor
model is OPTIMISTIC for the hypothetical kernel (it prices SE scaling,
skip-adds, halo exchange, and VPU<->MXU serialisation at zero), so the
implied max saving is an upper bound.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/vpu_tap_floor.py
       [--repeats 512] [--steps 10] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# D0 @512, per-image: the five depthwise ops of backbone stages 1..3
# (K, C_expanded, input side, output side, has_expand). Stride-2 taps are
# counted at OUTPUT positions (that is all the arithmetic any
# implementation must do); expand-swish sites live at INPUT resolution.
D0_STAGE123_DW = [
    ("s1   k3 c32",  3, 32, 256, 256, False),
    ("s2b0 k3 c96",  3, 96, 256, 128, True),
    ("s2b1 k3 c144", 3, 144, 128, 128, True),
    ("s3b0 k5 c144", 5, 144, 128, 64, True),
    ("s3b1 k5 c240", 5, 240, 64, 64, True),
]

# expand/project 1x1 convs of the same region: (M=spatial, K=cin, N=cout)
# per image at D0 @512. Stage-1 has no expand (MBConv1).
D0_STAGE123_MM = [
    ("s1 proj", 256 * 256, 32, 16),
    ("s2b0 exp", 256 * 256, 16, 96),
    ("s2b0 proj", 128 * 128, 96, 24),
    ("s2b1 exp", 128 * 128, 24, 144),
    ("s2b1 proj", 128 * 128, 144, 24),
    ("s3b0 exp", 128 * 128, 24, 144),
    ("s3b0 proj", 64 * 64, 144, 40),
    ("s3b1 exp", 64 * 64, 40, 240),
    ("s3b1 proj", 64 * 64, 240, 40),
]

BATCH = 128  # the D0 record inference batch


def _floor_kernel(x_ref, o_ref, *, taps: int, repeats: int, op: str,
                  chains: int):
    """repeats passes of the per-element VPU body over a VMEM block.

    ``chains`` independent accumulators model a tree-reassociated tap
    accumulation (legal in any real kernel: (t0+t1)+(t2+t3)+...); chains=1
    is the strict serial chain a naive loop produces.
    """
    x = x_ref[...]
    zero = jnp.zeros_like(x)

    if op == "fma":
        def body(_, accs):
            accs = list(accs)
            for t in range(taps):
                # one FMA per element per tap; distinct multipliers so the
                # unrolled loop cannot be factored into acc*w^k + x*sum
                accs[t % chains] = (
                    accs[t % chains] * jnp.asarray(1.0 + 1e-3 * (t + 1),
                                                   x.dtype) + x
                )
            return tuple(accs)
    else:  # swish: one sigmoid + one multiply per element per pass
        def body(_, accs):
            return tuple(x * jax.nn.sigmoid(a) for a in accs)

    out = jax.lax.fori_loop(
        0, repeats, body, tuple(zero for _ in range(chains))
    )
    acc = out[0]
    for a in out[1:]:
        acc = acc + a
    o_ref[...] = acc


def measure_rate(op: str, taps: int, repeats: int, steps: int,
                 dtype=jnp.float32, chains: int = 1,
                 interpret: bool = False):
    """Returns measured Gop/s for the per-element body (FMAs/s or swish/s).

    Timing discipline for the relay backend (README perf notes): dispatch
    all ``steps`` calls asynchronously, then fence ONCE by fetching a
    scalar — per-call fences would measure the relay round-trip, not the
    VPU. ``repeats`` makes each kernel tens of ms of pure VPU work so the
    single amortised dispatch overhead is noise.
    """
    # block sized to fit VMEM (~16 MB scoped): x + out + `chains`
    # accumulators must all be resident, so rows shrink with chains
    rows = max(512 // (chains if dtype == jnp.float32 else
                       max(chains // 2, 1)), 64)
    block = (rows, 1024) if not interpret else (8, 128)
    nblocks = (8 * (512 // rows)) if not interpret else 1
    x = jnp.ones((block[0] * nblocks, block[1]), dtype)

    kern = functools.partial(_floor_kernel, taps=taps, repeats=repeats,
                             op=op, chains=chains)
    fn = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(block, lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x))

    float(fn(x)[0, 0])  # warm-up: compile + one run, scalar fetch = fence
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(steps)]
    _ = float(outs[-1][0, 0])  # fence
    dt = (time.perf_counter() - t0) / steps
    # ops per element per repeat: `taps` FMAs (spread over the chains) for
    # fma; one swish PER CHAIN for swish (each chain is its own element)
    elems = x.size * repeats * (taps if op == "fma" else chains)
    return elems / dt / 1e9, dt * 1e3


def measure_mxu_ms(steps: int):
    """Jitted bf16 batched-matmul time for the chain's 1x1 convs (b128).

    Each step reduces every matmul output to one f32 scalar inside the jit
    (keeping full (B, 65536, 96)-sized outputs for ``steps`` async steps
    exhausts HBM), and the scalar feeds the next step's weight scaling —
    the data dependency serialises the steps and stops XLA caching or
    hoisting the loop-invariant matmuls. One fence at the end amortises
    the relay round-trip.
    """
    mats = []
    for _, m, k, n in D0_STAGE123_MM:
        a = jnp.ones((BATCH, m, k), jnp.bfloat16)
        b = jnp.ones((k, n), jnp.bfloat16)
        mats.append((a, b))

    @jax.jit
    def run(mats, acc):
        scale = (1.0 + acc * 1e-30).astype(jnp.bfloat16)
        s = jnp.float32(0)
        for a, b in mats:
            s = s + jnp.sum(
                jnp.einsum("bmk,kn->bmn", a, b * scale,
                           preferred_element_type=jnp.float32)
            )
        return s * 1e-30

    acc = float(run(mats, jnp.float32(0)))  # compile + fence
    t0 = time.perf_counter()
    acc = jnp.float32(acc)
    for _ in range(steps):
        acc = run(mats, acc)
    _ = float(acc)  # fence
    return (time.perf_counter() - t0) / steps * 1e3


def ceiling_from_rates(r_fma_gops: float, r_swish_gops: float,
                       t_mxu_ms: float) -> dict:
    """Recompute the stages-1..3 single-kernel floor from measured rates."""
    tap_fmas = sum(BATCH * k * k * c * so * so
                   for _, k, c, si, so, _e in D0_STAGE123_DW)
    # swish sites: after each expand (at INPUT resolution) and after each
    # depthwise (at output resolution), both across C_expanded
    act_elems = sum(
        BATCH * c * ((si * si if has_expand else 0) + so * so)
        for _, k, c, si, so, has_expand in D0_STAGE123_DW
    )
    t_taps = tap_fmas / (r_fma_gops * 1e9) * 1e3
    t_acts = act_elems / (r_swish_gops * 1e9) * 1e3
    # chain HBM in/out: stem output read + stage-3 output write, bf16
    hbm_bytes = BATCH * (256 * 256 * 32 + 64 * 64 * 40) * 2
    t_hbm = hbm_bytes / 819e9 * 1e3  # v5e ~819 GB/s
    floor = t_taps + t_acts + t_mxu_ms + t_hbm
    chain_ms = 19.1   # measured XLA stage-1..3 chain (DESIGN 6i)
    d0_ms = 54.5      # measured whole-model D0 b128 batch (DESIGN 6i)
    return {
        "bench": "vpu_floor", "event": "ceiling",
        "tap_gfmas": round(tap_fmas / 1e9, 2),
        "act_gelems": round(act_elems / 1e9, 2),
        "t_taps_ms": round(t_taps, 2),
        "t_acts_ms": round(t_acts, 2),
        "t_mxu_ms": round(t_mxu_ms, 2),
        "t_hbm_ms": round(t_hbm, 2),
        "floor_ms": round(floor, 2),
        "xla_chain_ms": chain_ms,
        "max_saving_ms": round(chain_ms - floor, 2),
        "max_saving_pct_of_d0": round((chain_ms - floor) / d0_ms * 100, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=512,
                   help="per-element body passes per kernel call — sized "
                   "so one call is tens of ms of VPU work (relay dispatch "
                   "overhead then amortises out)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--skip-mxu", action="store_true")
    args = p.parse_args(argv)

    # --- measured VPU rates: dtype x accumulator-chain sweep ----------
    best_fma = 0.0
    for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for chains in (1, 4):
            r, ms = measure_rate("fma", taps=9, repeats=args.repeats,
                                 steps=args.steps, dtype=dtype,
                                 chains=chains, interpret=args.interpret)
            best_fma = max(best_fma, r)
            print(json.dumps({
                "bench": "vpu_floor", "op": "fma", "dtype": dname,
                "chains": chains, "rate_gfma_s": round(r, 1),
                "kernel_ms": round(ms, 3),
            }), flush=True)
    # swish: f32 only — Mosaic's bf16 logistic lowering is broken on this
    # jax (vector.broadcast f32 -> bf16 verification error)
    best_swish, ms = measure_rate("swish", taps=1, repeats=args.repeats,
                                  steps=args.steps, dtype=jnp.float32,
                                  chains=1, interpret=args.interpret)
    print(json.dumps({
        "bench": "vpu_floor", "op": "swish", "dtype": "f32",
        "rate_gswish_s": round(best_swish, 1), "kernel_ms": round(ms, 3),
    }), flush=True)

    # --- workload arithmetic (per D0 b128 batch) ----------------------
    t_mxu = 0.0 if args.skip_mxu else measure_mxu_ms(args.steps)
    print(json.dumps(ceiling_from_rates(best_fma, best_swish, t_mxu)),
          flush=True)


if __name__ == "__main__":
    main()
