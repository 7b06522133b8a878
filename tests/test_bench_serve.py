"""Smoke tests for tools/bench_serve.py (fast tier).

VERDICT r4 weak #1 / next #1: the serving benchmark landed untested and
unreferenced. These tests pin (a) the tool runs end-to-end in tiny CPU
mode and emits well-formed JSON lines, and (b) the load loop's failure
accounting — all-shed levels report zeros instead of crashing in
np.percentile, and request timeouts are counted rather than silently
killing client threads (advisor r4).
"""

import importlib.util
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "bench_serve", os.path.join(REPO, "tools", "bench_serve.py")
)
bench_serve = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_serve)


def _json_lines(out: str):
    return [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]


def test_tiny_inproc_end_to_end(capsys):
    bench_serve.main([
        "--phi", "tiny", "--duration", "0.5", "--concurrency", "1,2",
        "--batch-size", "4", "--max-delay-ms", "1",
    ])
    lines = _json_lines(capsys.readouterr().out)
    assert lines[0]["event"] == "ready"
    assert lines[0]["mode"] == "inproc"
    levels = lines[1:]
    assert [l["concurrency"] for l in levels] == [1, 2]
    for l in levels:
        assert l["n"] >= 1
        assert l["img_s"] > 0
        assert l["p50_ms"] <= l["p95_ms"] <= l["p99_ms"]
        assert l["overloaded"] == 0 and l["timeouts"] == 0


def test_run_level_counts_overload_and_survives_all_shed():
    from efficientdet_tpu.serve import PredictorOverloaded

    def always_shed():
        raise PredictorOverloaded("full")

    lat, overloaded, timeouts, conn_errors, _ = bench_serve.run_level(
        always_shed, concurrency=2, duration_s=0.1
    )
    assert lat == [] and overloaded > 0 and timeouts == 0
    assert conn_errors == 0


def test_run_level_counts_timeouts_instead_of_killing_clients():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) % 2 == 0:
            raise TimeoutError("deadline")

    lat, overloaded, timeouts, conn_errors, _ = bench_serve.run_level(
        flaky, concurrency=1, duration_s=0.05
    )
    # the client thread survived its first timeout and kept issuing
    # requests: successes and timeouts both accumulate
    assert timeouts >= 1 and len(lat) >= 1 and overloaded == 0
    assert conn_errors == 0


def test_run_level_counts_connection_errors_instead_of_killing_clients():
    """--http transport errors (ECONNRESET out of a burst-overrun listen
    backlog) must be counted, not kill the client thread: 31 dead threads
    once skewed an on-chip c=64 level with no indication (DESIGN 6j)."""
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) % 2 == 0:
            raise ConnectionResetError(104, "Connection reset by peer")

    lat, overloaded, timeouts, conn_errors, _ = bench_serve.run_level(
        flaky, concurrency=1, duration_s=0.05
    )
    assert conn_errors >= 1 and len(lat) >= 1
    assert overloaded == 0 and timeouts == 0


def test_all_shed_level_reports_zeros(capsys, monkeypatch):
    """main() must not crash in np.percentile when a level records no
    successful request (advisor r4: empty-array percentile): it reports an
    n=0 line with the shed count and moves on."""
    from efficientdet_tpu.serve import PredictorOverloaded

    class ShedAfterWarmup:
        batch_size = 4
        size = 16
        _buckets = [1, 2, 4]
        calls = 0

        def warmup(self):
            pass

        def predict_sync(self, img, timeout=None):
            self.calls += 1
            if self.calls > 1:  # let the measured-path warm-up through
                raise PredictorOverloaded("always full")

        def close(self):
            pass

    monkeypatch.setattr(
        bench_serve, "build_predictor", lambda a: ShedAfterWarmup()
    )
    bench_serve.main(["--duration", "0.1", "--concurrency", "2"])
    levels = [l for l in _json_lines(capsys.readouterr().out) if "n" in l]
    assert levels == [{
        "bench": "serve", "concurrency": 2, "img_s": 0.0, "n": 0,
        "overloaded": levels[0]["overloaded"], "timeouts": 0,
        "conn_errors": 0,
    }]
    assert levels[0]["overloaded"] > 0
