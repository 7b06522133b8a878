"""Microbench: channel-packing formulations for the early EfficientNet stages.

Motivation (D4 train-step trace, docs/DESIGN.md §6d): at D4/1024px/b16 the
backbone's stage1/stage2 eat 42% of the 567 ms train step while running at
~160-430 GB/s with 1-6 TFLOP/s — their channel counts (24-48) fill only
3/8..3/16 of the 128 vector lanes, so most of the HBM traffic is tile
padding. This script times, on the real chip, alternative formulations of
the stage1 MBConv block (dw 3x3 s1 on 48ch @ 512^2, SE, project 1x1 48->24,
BNs) that keep the minor dimension >= 128:

  ref      — the block as the model runs it today (NHWC, C minor)
  s2d_g    — 2x2 space-to-depth; depthwise as feature_group_count=C grouped
             conv (4in->4out per group, exact kernel rearrangement);
             pointwise as feature_group_count=4 grouped conv
  s2d_tap  — 2x2 space-to-depth; depthwise as 9 shifted multiply-adds
             (fuses, but re-reads the input per tap); pointwise grouped

All variants are mathematically exact rearrangements (asserted on CPU by
tests; here we assert allclose on-device before timing). fwd+bwd is timed
(value_and_grad wrt the weights) since training is the target.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/stage1_packing_bench.py
       [--batch 16] [--size 512] [--cin 48] [--cout 24] [--steps 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- reference


def dw_conv(x, k):
    """Depthwise 3x3 stride 1, NHWC; k: (3, 3, C)."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        k[:, :, None, :],  # (3,3,1,C) HWIO with feature_group_count=C
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def pw_conv(x, w):
    """Pointwise 1x1, NHWC; w: (Cin, Cout)."""
    return jax.lax.conv_general_dilated(
        x,
        w[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def block_ref(x, dwk, pw):
    h = dw_conv(x, dwk)
    h = jax.nn.swish(h)
    return pw_conv(h, pw)


# ------------------------------------------------------------ packed layout
# Channel-MINOR packing: (B,H,W,C) -> (B,H/2,W/2,C*4), packed index
# = c*4 + (p*2+q) with (p,q) the position inside the 2x2 cell — so the four
# sub-pixels of one channel are contiguous, which is what a grouped conv
# (one group per ORIGINAL channel) needs for the depthwise stencil.


def s2d_cm(x):
    """Channel-minor packing: packed index = c*4 + (p*2+q)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B,H/2,W/2,C,p,q)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def d2s_cm(x, c):
    b, hh, ww, pc = x.shape
    x = x.reshape(b, hh, ww, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B,H/2,p,W/2,q,C)
    return x.reshape(b, hh * 2, ww * 2, c)


def dw_packed_g(xp_cm, dwk):
    """Depthwise 3x3 on channel-minor packed layout as grouped conv.

    xp_cm: (B, H/2, W/2, C*4); groups = C, each 4 -> 4 with a 3x3 packed
    kernel whose taps realise the original 3x3 stencil exactly.
    """
    c = dwk.shape[-1]
    kj = jnp.zeros((3, 3, 4, 4 * c), dwk.dtype)
    for p in range(2):
        for q in range(2):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ry, pp = divmod(p + dy, 2)
                    rx, qq = divmod(q + dx, 2)
                    if not (-1 <= ry <= 1 and -1 <= rx <= 1):
                        continue
                    # out channel index: ch*4 + p*2+q for every ch
                    idx = jnp.arange(c) * 4 + (p * 2 + q)
                    kj = kj.at[ry + 1, rx + 1, pp * 2 + qq, idx].set(
                        dwk[dy + 1, dx + 1, :]
                    )
    return jax.lax.conv_general_dilated(
        xp_cm,
        kj,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def pw_packed_cm(xp_cm, w, c):
    """1x1 conv on channel-minor packed layout via einsum over (C)."""
    b, hh, ww, _ = xp_cm.shape
    x5 = xp_cm.reshape(b, hh, ww, c, 4)
    out = jnp.einsum("bhwcp,co->bhwop", x5, w)
    cout = w.shape[1]
    return out.reshape(b, hh, ww, cout * 4)


def block_s2d(x, dwk, pw):
    c = x.shape[-1]
    xp = s2d_cm(x)
    h = dw_packed_g(xp, dwk)
    h = jax.nn.swish(h)
    o = pw_packed_cm(h, pw, c)
    return d2s_cm(o, pw.shape[1])


def dw_tap(xp_cm, dwk):
    """Depthwise as 9 shifted multiply-adds on the packed layout."""
    c = dwk.shape[-1]
    b, hh, ww, _ = xp_cm.shape
    x5 = xp_cm.reshape(b, hh, ww, c, 2, 2)
    # zero-pad one packed cell on each spatial side (= 2 original pixels,
    # covers the 1-pixel SAME halo), then take static slices per cell shift
    xpad = jnp.pad(x5, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    outs = []
    for p in range(2):
        for q in range(2):
            acc = 0.0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ry, pp = divmod(p + dy, 2)
                    rx, qq = divmod(q + dx, 2)
                    src = xpad[
                        :, 1 + ry : 1 + ry + hh, 1 + rx : 1 + rx + ww, :,
                        pp, qq,
                    ]
                    acc = acc + src * dwk[dy + 1, dx + 1]
            outs.append(acc)
    out = jnp.stack(outs, axis=-1)  # (B,hh,ww,C,4) with pos = p*2+q
    return out.reshape(b, hh, ww, c * 4)


def block_tap(x, dwk, pw):
    c = x.shape[-1]
    xp = s2d_cm(x)
    h = dw_tap(xp, dwk)
    h = jax.nn.swish(h)
    o = pw_packed_cm(h, pw, c)
    return d2s_cm(o, pw.shape[1])


def block_nchw(x, dwk, pw):
    """The block with convs in NCHW: minor dim = W (512) fills the 128
    lanes completely, vs C (48) at 37%. Transposes at the block boundary
    are included in the timing (worst case; in the real model the layout
    would persist across stages 1-2 and amortise them)."""
    c = x.shape[-1]
    xn = x.transpose(0, 3, 1, 2)  # NCHW
    h = jax.lax.conv_general_dilated(
        xn,
        dwk[:, :, None, :].transpose(3, 2, 0, 1),  # OIHW (C,1,3,3)
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    h = jax.nn.swish(h)
    o = jax.lax.conv_general_dilated(
        h,
        pw.T[:, :, None, None],  # OIHW (Cout,Cin,1,1)
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return o.transpose(0, 2, 3, 1)


# ------------------------------------------------------------------- timing


def time_fwd_bwd(name, block, x, dwk, pw, steps, ref_out=None):
    def loss(params, x):
        o = block(x, params["dwk"], params["pw"])
        return jnp.sum(o * o), o

    g = jax.jit(jax.value_and_grad(loss, has_aux=True))
    params = {"dwk": dwk, "pw": pw}
    (val, out), grads = g(params, x)
    if ref_out is not None:
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(ref_out, np.float32),
            rtol=3e-2, atol=3e-2,
        )
    float(val)  # fence
    t0 = time.perf_counter()
    for _ in range(steps):
        (val, out), grads = g(params, x)
    float(val)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--cin", type=int, default=48)
    ap.add_argument("--cout", type=int, default=24)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--nchw-only", action="store_true")
    args = ap.parse_args()

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randn(args.batch, args.size, args.size, args.cin) * 0.1, dt
    )
    dwk = jnp.asarray(rng.randn(3, 3, args.cin) * 0.1, dt)
    pw = jnp.asarray(rng.randn(args.cin, args.cout) * 0.1, dt)

    print(f"backend={jax.default_backend()} x={x.shape} {args.dtype}")
    ref = time_fwd_bwd("ref_nhwc", block_ref, x, dwk, pw, args.steps)
    if not args.nchw_only:
        time_fwd_bwd("s2d_grouped", block_s2d, x, dwk, pw, args.steps, ref)
        time_fwd_bwd("s2d_taps", block_tap, x, dwk, pw, args.steps, ref)
    time_fwd_bwd("nchw", block_nchw, x, dwk, pw, args.steps, ref)


if __name__ == "__main__":
    main()
