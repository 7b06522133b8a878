"""Smoke tests for tools/bench_train.py --pipeline modes (fast tier).

Pins the three round-5 input-feeding paths end-to-end in tiny CPU mode:
the host pipeline (batch_iterator + prefetch + shard_batch), data echoing
(--echo), and the device-resident cache (--device-cache), each emitting a
well-formed one-line JSON metric (DESIGN.md §6k).
"""

import importlib.util
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "bench_train", os.path.join(REPO, "tools", "bench_train.py")
)
bench_train = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_train)

TINY = ["--phi", "tiny", "--batch", "8", "--steps", "2", "--warmup", "1",
        "--max-gt", "10"]


def _json_lines(out: str):
    return [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]


def test_pipeline_mode(capsys):
    bench_train.main(TINY + ["--pipeline"])
    (line,) = _json_lines(capsys.readouterr().out)
    assert line["metric"] == "dtiny_128px_train_pipeline_throughput"
    assert line["value"] > 0
    assert line["unit"] == "img/s/chip"
    assert line["echo"] == 1 and line["device_cache"] == 0


def test_pipeline_echo_with_device_augment(capsys):
    bench_train.main(TINY + ["--pipeline", "--echo", "2",
                             "--device-augment"])
    (line,) = _json_lines(capsys.readouterr().out)
    assert line["echo"] == 2 and line["device_augment"] is True
    assert line["value"] > 0


def test_device_cache_mode(capsys):
    bench_train.main(TINY + ["--pipeline", "--device-cache", "32"])
    note, line = _json_lines(capsys.readouterr().out)
    assert note["images"] == 32
    assert note["pool_mb"] > 0
    assert line["metric"] == "dtiny_128px_train_devcache_throughput"
    assert line["value"] > 0
