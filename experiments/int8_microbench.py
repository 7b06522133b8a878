"""Does int8 buy anything on v5e for EfficientDet-shaped ops?

Motivation (docs/DESIGN.md 6g): D4/D7 inference BiFPN+heads are measured
bandwidth-bound (563-726 GB/s, up to 89% of nominal HBM) in bf16. int8
halves the bytes per activation/weight, so IF XLA lowers int8 convs to the
MXU well on this backend, a post-training-quantized inference path could
beat the bf16 wall. This microbench answers the lowering question before
any PTQ machinery is built:

  1. dot_general: int8xint8->int32 vs bf16xbf16->f32 at MXU-saturating size
  2. 3x3 conv at a BiFPN-like shape (B,128,128,224): int8 vs bf16
  3. depthwise 3x3 at the same shape (VPU-bound): int8 vs bf16

Timing methodology: the axon relay pipelines independent async dispatches,
so host-side per-call timing overlaps executions and reports impossible
throughput (first attempt measured "1442 TFLOP/s bf16" -- 7x the chip's
~197 peak). Instead the iteration loop runs INSIDE one jitted program as a
lax.fori_loop whose carry consumes each iteration's output (a sum() folded
back into the input), forcing serialization on-device. Per-iter time is
the two-point slope (t(N2)-t(N1))/(N2-N1), cancelling dispatch + loop
setup + the carry-update cost is shared by both dtypes being compared.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/int8_microbench.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp


def _timed(fn, n_lo=64, n_hi=256, reps=3):
    """Two-point slope per-iteration time of fn(n) (a jitted fori_loop).

    Iteration counts are large enough that the slope is tens of ms —
    well above the relay's ~0.5 ms dispatch/timing noise. Best-of-reps
    on each point rejects outliers.
    """
    jax.block_until_ready(fn(n_lo))  # compile both
    jax.block_until_ready(fn(n_hi))

    def best(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(n_hi) - best(n_lo)) / (n_hi - n_lo)


def loop_bench(op, x0, *consts):
    """Per-iteration seconds of op(x, *consts) chained through a fori_loop.

    op must return an array; its sum is folded back into x (cast to x's
    dtype) so iteration i+1 depends on iteration i's full output.
    """

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, x):
        def body(_, carry):
            out = op(carry, *consts)
            # Consume the whole output; keep carry dtype/shape unchanged.
            bump = out.sum()
            if jnp.issubdtype(x0.dtype, jnp.integer):
                bump = (bump % 3).astype(x0.dtype)
            else:
                bump = (bump * 1e-30).astype(x0.dtype)
            return carry + bump

        return jax.lax.fori_loop(0, n, body, x)

    return _timed(lambda n: run(n, x0))


def main():
    key = jax.random.PRNGKey(0)
    results = {"device": str(jax.devices()[0])}

    # --- 1. Big matmul: MXU peak question ------------------------------
    M = N = K = 4096
    a8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    abf = jax.random.normal(key, (M, K), jnp.bfloat16)
    bbf = jax.random.normal(key, (K, N), jnp.bfloat16)

    t_bf = loop_bench(
        lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
        abf, bbf,
    )
    flops = 2 * M * N * K
    results["matmul_4096_bf16_ms"] = t_bf * 1e3
    results["matmul_4096_bf16_tflops"] = flops / t_bf / 1e12
    try:
        t_i8 = loop_bench(
            lambda x, y: jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ),
            a8, b8,
        )
        results["matmul_4096_int8_ms"] = t_i8 * 1e3
        results["matmul_4096_int8_tops"] = flops / t_i8 / 1e12
        results["matmul_int8_speedup"] = t_bf / t_i8
    except Exception as e:
        results["matmul_int8_error"] = repr(e)[:200]

    # --- 2. BiFPN-like 3x3 conv (B,128,128,224) -------------------------
    B, H, W, C = 8, 128, 128, 224
    x8 = jax.random.randint(key, (B, H, W, C), -127, 127, jnp.int8)
    k8 = jax.random.randint(key, (3, 3, C, C), -127, 127, jnp.int8)
    xbf = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    kbf = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, k, acc):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=acc)

    t_bf = loop_bench(lambda x, k: conv(x, k, jnp.float32), xbf, kbf)
    results["conv3x3_c224_bf16_ms"] = t_bf * 1e3
    try:
        t_i8 = loop_bench(lambda x, k: conv(x, k, jnp.int32), x8, k8)
        results["conv3x3_c224_int8_ms"] = t_i8 * 1e3
        results["conv3x3_int8_speedup"] = t_bf / t_i8
    except Exception as e:  # int8 conv may not lower on this backend
        results["conv3x3_int8_error"] = repr(e)[:200]

    # --- 3. depthwise 3x3 (VPU question) --------------------------------
    kd8 = jax.random.randint(key, (3, 3, 1, C), -127, 127, jnp.int8)
    kdbf = jax.random.normal(key, (3, 3, 1, C), jnp.bfloat16)
    dnd = jax.lax.conv_dimension_numbers((B, H, W, C), (3, 3, 1, C),
                                         ("NHWC", "HWIO", "NHWC"))

    def dwconv(x, k, acc):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dnd,
            feature_group_count=C, preferred_element_type=acc)

    t_bf = loop_bench(lambda x, k: dwconv(x, k, jnp.float32), xbf, kdbf)
    results["dwconv3x3_bf16_ms"] = t_bf * 1e3
    try:
        t_i8 = loop_bench(lambda x, k: dwconv(x, k, jnp.int32), x8, kd8)
        results["dwconv3x3_int8_ms"] = t_i8 * 1e3
        results["dwconv3x3_int8_speedup"] = t_bf / t_i8
    except Exception as e:
        results["dwconv3x3_int8_error"] = repr(e)[:200]

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
