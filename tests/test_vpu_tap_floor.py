"""Smoke tests for experiments/vpu_tap_floor.py (fast tier).

The floor microbench turns DESIGN 6i's estimated single-kernel ceiling
into a measured number (VERDICT r4 next #5). These tests pin (a) the
Pallas floor kernel runs in interpret mode and produces finite output at
a plausible rate, and (b) the ceiling arithmetic composes the measured
rates into the recorded JSON shape.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "vpu_tap_floor", os.path.join(REPO, "experiments", "vpu_tap_floor.py")
)
vpu_tap_floor = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(vpu_tap_floor)


@pytest.mark.parametrize("op", ["fma", "swish"])
def test_floor_kernel_interpret_smoke(op):
    rate, ms = vpu_tap_floor.measure_rate(
        op, taps=3, repeats=2, steps=1, interpret=True
    )
    assert rate > 0 and ms > 0


def test_ceiling_arithmetic_composes():
    out = vpu_tap_floor.ceiling_from_rates(
        r_fma_gops=1000.0, r_swish_gops=1000.0, t_mxu_ms=1.0
    )
    # the five stage-1..3 depthwise ops at D0 b128: 11.98 G tap FMAs
    assert out["tap_gfmas"] == pytest.approx(11.98, abs=0.01)
    assert out["floor_ms"] == pytest.approx(
        out["t_taps_ms"] + out["t_acts_ms"] + out["t_mxu_ms"]
        + out["t_hbm_ms"], abs=0.05,
    )
    assert out["max_saving_ms"] == pytest.approx(
        out["xla_chain_ms"] - out["floor_ms"], abs=0.05
    )
    # HBM floor: 579 MB chain in+out at 819 GB/s ~= 0.7 ms
    assert 0.5 < out["t_hbm_ms"] < 1.0
