"""Roofline decomposition of a jax.profiler TPU trace.

Turns the perfetto ``vm.trace.json.gz`` that ``bench.py --trace DIR`` /
``tools/bench_train.py --trace DIR`` write into the per-stage roofline
table VERDICT r2 next #3 asks for: device time, achieved HBM bandwidth and
MXU FLOP/s per pipeline stage (backbone / BiFPN / heads / postprocess),
each against the v5e ceilings, with a bandwidth/compute/latency verdict.

Usage:
  python tools/analyze_trace.py /tmp/d4trace            # newest trace under dir
  python tools/analyze_trace.py path/to/vm.trace.json.gz --top 25

Works offline on any saved trace — no jax import, no TPU needed. Numbers
come from the profiler's per-op ``device_duration_ps`` / ``bytes_accessed``
/ ``model_flops`` annotations; stage attribution uses the JAX name stack
(``tf_op``) where present and falls back to fusion/HLO names.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

V5E_HBM_GBPS = 819.0      # v5e HBM bandwidth ceiling (~0.82 TB/s)
V5E_BF16_TFLOPS = 197.0   # v5e bf16 MXU peak per chip

STAGE_PATTERNS = [
    ("preprocess", r"preprocess|normalize_images|letterbox|augment"),
    ("backbone", r"backbone|efficientnet|mbconv|stem"),
    ("bifpn", r"bifpn|fpn_|/fpn|resample|fuse"),
    ("heads", r"class_net|box_net|head_pallas|/heads|head_point"),
    ("postprocess", r"nms|suppress|top_k|approx_max_k|sort|decode_boxes"
                    r"|clip_boxes|filter_detect"),
    ("optimizer", r"adam|optax|apply_updates|opt_state|lr_scale"),
    ("loss", r"focal|smooth_l1|huber|matching|anchor_targets|one_hot"),
]


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]


def classify(name: str, tf_op: str, source: str) -> str:
    hay = f"{tf_op} {source} {name}".lower()
    for stage, pat in STAGE_PATTERNS:
        if re.search(pat, hay):
            return stage
    return "other"


def load_ops(path: str):
    with gzip.open(path, "rt") as f:
        ev = json.load(f)["traceEvents"]
    tidname = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tidname[(e["pid"], e["tid"])] = e["args"]["name"]
    ops, steps = [], []
    for e in ev:
        if e.get("ph") != "X":
            continue
        tname = tidname.get((e["pid"], e["tid"]))
        if tname == "XLA Ops":
            ops.append(e)
        elif tname == "Steps":
            steps.append(e)
    return ops, steps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace", help="trace dir or *.trace.json.gz file")
    p.add_argument("--top", type=int, default=15,
                   help="show the N most expensive individual ops")
    p.add_argument("--json", action="store_true",
                   help="emit one machine-readable JSON line at the end")
    args = p.parse_args(argv)

    path = find_trace(args.trace)
    ops, steps = load_ops(path)
    n_steps = max(len(steps), 1)

    by_stage = collections.defaultdict(lambda: [0.0, 0, 0])  # s, bytes, flops
    by_cat = collections.defaultdict(float)
    per_op = collections.defaultdict(lambda: [0.0, 0, 0, ""])
    total_s = 0.0
    for e in ops:
        a = e.get("args", {})
        dur_s = int(a.get("device_duration_ps", 0)) * 1e-12
        byt = int(a.get("bytes_accessed", 0))
        flops = int(a.get("model_flops", 0) or 0)
        stage = classify(e["name"], a.get("tf_op", ""), a.get("source", ""))
        by_stage[stage][0] += dur_s
        by_stage[stage][1] += byt
        by_stage[stage][2] += flops
        by_cat[a.get("hlo_category", "?")] += dur_s
        key = re.sub(r"\.\d+$", "", e["name"])  # merge op instances
        per_op[key][0] += dur_s
        per_op[key][1] += byt
        per_op[key][2] += flops
        per_op[key][3] = a.get("tf_op", "")[:90]
        total_s += dur_s

    step_ms = (sum(s["dur"] for s in steps) / n_steps / 1e3) if steps else None
    print(f"trace: {path}")
    print(f"steps: {len(steps)}"
          + (f", mean step {step_ms:.1f} ms" if step_ms else "")
          + f" | XLA-op device time {total_s * 1e3 / n_steps:.1f} ms/step")

    def verdict(gbps, tflops):
        if gbps > 0.6 * V5E_HBM_GBPS:
            return "BANDWIDTH-bound"
        if tflops > 0.5 * V5E_BF16_TFLOPS:
            return "COMPUTE-bound"
        if gbps > 0.3 * V5E_HBM_GBPS:
            return "bandwidth-leaning"
        return "latency/overhead"

    print("\n== per stage (all steps aggregated) ==")
    print(f"{'stage':<12} {'ms/step':>9} {'share':>6} {'GB/s':>7} "
          f"{'%HBM':>6} {'TFLOP/s':>8} {'%peak':>6}  verdict")
    rows = {}
    for stage, (dur, byt, flops) in sorted(
        by_stage.items(), key=lambda kv: -kv[1][0]
    ):
        gbps = byt / dur / 1e9 if dur else 0.0
        tflops = flops / dur / 1e12 if dur else 0.0
        rows[stage] = {
            "ms_per_step": round(dur * 1e3 / n_steps, 2),
            "share": round(dur / total_s, 4) if total_s else 0,
            "gbps": round(gbps, 1),
            "pct_hbm": round(100 * gbps / V5E_HBM_GBPS, 1),
            "tflops": round(tflops, 2),
            "pct_peak": round(100 * tflops / V5E_BF16_TFLOPS, 1),
            "verdict": verdict(gbps, tflops),
        }
        r = rows[stage]
        print(f"{stage:<12} {r['ms_per_step']:>9} {r['share']*100:>5.1f}% "
              f"{r['gbps']:>7} {r['pct_hbm']:>5.1f}% {r['tflops']:>8} "
              f"{r['pct_peak']:>5.1f}%  {r['verdict']}")

    print("\n== by HLO category ==")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        share = 100 * dur / total_s if total_s else 0.0
        print(f"{cat:<28} {dur * 1e3 / n_steps:>8.2f} ms/step "
              f"({share:>4.1f}%)")

    print(f"\n== top {args.top} ops (instances merged) ==")
    for name, (dur, byt, flops, tf_op) in sorted(
        per_op.items(), key=lambda kv: -kv[1][0]
    )[: args.top]:
        gbps = byt / dur / 1e9 if dur else 0.0
        tflops = flops / dur / 1e12 if dur else 0.0
        print(f"{dur * 1e3 / n_steps:>8.3f} ms  {gbps:>6.0f} GB/s "
              f"{tflops:>6.1f} TF/s  {name[:44]:<44} {tf_op[:60]}")

    if args.json:
        print(json.dumps({
            "event": "trace_roofline",
            "trace": path,
            "n_steps": len(steps),
            "step_ms": round(step_ms, 2) if step_ms else None,
            "xla_ms_per_step": round(total_s * 1e3 / n_steps, 2),
            "stages": rows,
        }))


if __name__ == "__main__":
    main()
