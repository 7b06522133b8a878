"""Pin the outage-proofing contract of the driver hooks (fast tier).

VERDICT r2's top item: the driver evidence channel must survive an axon
relay outage. The load-bearing properties are environmental, not numerical
— the dryrun parent must bootstrap a CPU child WITHOUT consulting any
backend, and the bench watchdog must kill a hung probe and fail fast with
a structured line. These tests pin that wiring with a mocked subprocess
layer so a refactor can't quietly reintroduce a backend probe into the
parent path (the regression that produced two rc=124 round artifacts).
"""

import json
import os
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.abspath(REPO))

import __graft_entry__ as graft  # noqa: E402
import bench  # noqa: E402


class FakeProc:
    def __init__(self, returncode=0, hang=False):
        self.returncode_after_wait = returncode
        self.hang = hang
        self.killed = False
        self.returncode = None
        self.pid = 2 ** 30  # bogus; tests stub os.killpg (see _patch_pg)

    def wait(self, timeout=None):
        self.returncode = -9 if self.killed else self.returncode_after_wait
        return self.returncode

    def poll(self):
        if self.killed:
            self.returncode = -9
        elif not self.hang:
            self.returncode = self.returncode_after_wait
        return self.returncode

    def send_signal(self, sig):
        self.killed = True

    def kill(self):
        self.killed = True


class TestDryrunBootstrap:
    def test_parent_spawns_cpu_child_without_backend_probe(self, monkeypatch):
        calls = []

        def fake_popen(argv, env=None, **kw):
            calls.append((argv, env))
            return FakeProc(returncode=0)

        monkeypatch.delenv(graft._CHILD_MARKER, raising=False)
        monkeypatch.setattr(graft.subprocess, "Popen", fake_popen)
        graft.dryrun_multichip(8)

        assert len(calls) == 1
        argv, env = calls[0]
        # child target and device count
        assert argv[0] == sys.executable
        assert argv[1].endswith("__graft_entry__.py")
        assert argv[2:] == ["multichip", "8"]
        # the whole point: child is pinned to virtual CPU devices and the
        # parent decided to bootstrap from env alone (no jax.devices call —
        # enforced structurally below)
        assert env[graft._CHILD_MARKER] == "1"
        assert env["JAX_PLATFORMS"] == "cpu"
        assert "xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
        assert env["JAX_COMPILATION_CACHE_DIR"]  # persistent compile cache
        # VERDICT r4 next #3: XLA C++ ERROR walls (cpu_aot_loader machine-
        # feature complaints) must not crowd the driver's bounded tail.
        assert env["TF_CPP_MIN_LOG_LEVEL"] == "3"

    def test_cache_dir_is_host_fingerprinted(self):
        """Cache entries are CPU-feature-specific (SIGILL risk cross-host):
        the directory must be keyed by the host fingerprint so a different
        machine starts cold instead of loading foreign AOT executables."""
        fp = graft._host_fingerprint()
        assert fp and len(fp) == 12 and fp == graft._host_fingerprint()
        assert graft._COMPILE_CACHE == os.path.join(
            graft._COMPILE_CACHE_ROOT, fp
        )

    def test_log_level_forced_over_jax_inherited_value(self, monkeypatch):
        """jax sets TF_CPP_MIN_LOG_LEVEL=1 in os.environ at import time, so
        an inherited value must be OVERRIDDEN (setdefault let the r4 walls
        through); the dedicated GRAFT_DRYRUN_TF_LOG var is the operator
        escape hatch."""
        calls = []
        monkeypatch.delenv(graft._CHILD_MARKER, raising=False)
        monkeypatch.setenv("TF_CPP_MIN_LOG_LEVEL", "1")  # what jax leaves
        monkeypatch.setattr(
            graft.subprocess, "Popen",
            lambda argv, env=None, **kw: calls.append(env)
            or FakeProc(returncode=0),
        )
        graft.dryrun_multichip(8)
        assert calls[0]["TF_CPP_MIN_LOG_LEVEL"] == "3"
        monkeypatch.setenv("GRAFT_DRYRUN_TF_LOG", "0")
        graft.dryrun_multichip(8)
        assert calls[1]["TF_CPP_MIN_LOG_LEVEL"] == "0"

    def test_parent_path_has_no_jax_reference(self):
        """Structural guard: the parent branch must never touch jax.

        The round-2 regression was a single ``len(jax.devices())`` used
        only to decide whether to bootstrap — during a relay outage that
        call hung for hours. Source-level check: no ``jax`` token in
        ``dryrun_multichip`` (the child work lives in the impl functions).
        """
        import ast
        import inspect
        import textwrap

        tree = ast.parse(textwrap.dedent(
            inspect.getsource(graft.dryrun_multichip)
        ))
        fn = tree.body[0]
        fn.body = fn.body[1:]  # drop the docstring; code only
        code = ast.unparse(fn)
        assert "import jax" not in code
        assert "jax.devices" not in code and "jax.config" not in code

    def test_child_failure_raises(self, monkeypatch):
        monkeypatch.delenv(graft._CHILD_MARKER, raising=False)
        monkeypatch.setattr(
            graft.subprocess, "Popen",
            lambda argv, env=None, **kw: FakeProc(returncode=7),
        )
        with pytest.raises(RuntimeError, match="rc=7"):
            graft.dryrun_multichip(8)


class FakeClock:
    def __init__(self, start=1000.0):
        self.t = start

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


class TestBudgetGate:
    """Pin the dryrun's budget arithmetic (VERDICT r3 next #6: nothing
    pinned the skip math, so the r03 overrun was only caught by the
    driver). The load-bearing properties: phases are skipped — not run —
    when the remaining budget can't cover their estimated cost, skips are
    recorded for the summary line, and the parent's wait is derived from
    the same budget the child gates against."""

    def test_allow_within_budget(self):
        clock = FakeClock()
        gate = graft._BudgetGate(520.0, clock=clock, margin=20.0)
        assert gate.allow("predict_equality", 240.0)
        assert gate.skipped == []

    def test_skip_when_phase_cannot_fit(self, capsys):
        clock = FakeClock()
        gate = graft._BudgetGate(520.0, clock=clock, margin=20.0)
        clock.advance(300.0)  # 220 s left < 240 + 20
        assert not gate.allow("predict_equality", 240.0)
        assert gate.skipped == ["predict_equality"]
        out = capsys.readouterr().out
        assert "predict_equality SKIPPED" in out

    def test_margin_is_respected_at_the_boundary(self):
        clock = FakeClock()
        gate = graft._BudgetGate(100.0, clock=clock, margin=20.0)
        assert gate.allow("a", 80.0)       # 100 >= 80 + 20
        assert not gate.allow("b", 80.01)  # just over

    def test_every_gated_phase_has_a_cost_estimate(self):
        for name in ("predict_equality", "device_augment", "multiprocess"):
            assert graft._PHASE_EST_S[name] > 0

    def test_default_budget_fits_the_driver_window(self):
        # MULTICHIP_r03.json: the driver killed the dryrun at 660 s. The
        # child budget plus the parent's wait slack must stay under it.
        assert graft._DEFAULT_BUDGET_S + 80.0 <= 660.0

    def test_parent_wait_derives_from_budget_env(self, monkeypatch):
        waits = []

        class WaitRecordingProc(FakeProc):
            def wait(self, timeout=None):
                waits.append(timeout)
                return super().wait(timeout)

        monkeypatch.delenv(graft._CHILD_MARKER, raising=False)
        monkeypatch.setenv("GRAFT_DRYRUN_BUDGET_S", "300")
        monkeypatch.setattr(
            graft.subprocess, "Popen",
            lambda argv, env=None, **kw: WaitRecordingProc(returncode=0),
        )
        graft.dryrun_multichip(8)
        assert waits == [300.0 + 80.0]


class TestMultiprocessFailOpen:
    """The multiprocess phase must NOT fail the dryrun (VERDICT r3 next
    #3): in-process phases are the correctness gate; the 2-process
    topology is flaky under 1-core contention."""

    def _gate(self):
        return graft._BudgetGate(520.0, clock=FakeClock(), margin=20.0)

    def test_worker_failure_prints_structured_line_and_returns(
        self, monkeypatch, capsys
    ):
        monkeypatch.setattr(
            graft.subprocess, "Popen",
            lambda argv, env=None, **kw: FakeProc(returncode=7),
        )
        graft._multiprocess_phase(8, self._gate(), lambda m: None)  # no raise
        lines = [
            json.loads(ln)
            for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")
        ]
        assert lines[-1] == {
            "phase": "multiprocess", "ok": False, "rc": 7,
            "reason": "worker failure (fail-open; in-process phases passed)",
        }

    def test_timeout_kills_group_and_returns(self, monkeypatch, capsys):
        import subprocess as sp

        class HangingProc(FakeProc):
            def wait(self, timeout=None):
                if not self.killed:
                    raise sp.TimeoutExpired(cmd="mp", timeout=timeout)
                self.returncode = -9
                return self.returncode

        proc = HangingProc(hang=True)
        monkeypatch.setattr(
            graft.subprocess, "Popen", lambda argv, env=None, **kw: proc
        )
        monkeypatch.setattr(graft.os, "killpg", lambda pid, sig: proc.kill())
        graft._multiprocess_phase(8, self._gate(), lambda m: None)  # no raise
        assert proc.killed
        out = capsys.readouterr().out
        assert '"phase": "multiprocess", "ok": false' in out

    def test_quick_failure_retries_on_fresh_port(self, monkeypatch, capsys):
        """VERDICT r4 next #7: a coordinator-port collision fails the
        workers within seconds; one retry on a fresh port must absorb it."""
        ports = []

        def fake_popen(argv, env=None, **kw):
            ports.append(int(argv[argv.index("--port") + 1]))
            # first attempt: quick failure (FakeProc.wait returns instantly);
            # second attempt: success
            return FakeProc(returncode=1 if len(ports) == 1 else 0)

        monkeypatch.setattr(graft.subprocess, "Popen", fake_popen)
        msgs = []
        graft._multiprocess_phase(8, self._gate(), msgs.append)
        assert len(ports) == 2, "quick failure must be retried exactly once"
        assert ports[0] != ports[1], "retry must pick a fresh port"
        assert any("ok" in m for m in msgs)  # second attempt succeeded
        # no fail-open JSON line: the retry absorbed the collision
        assert '"ok": false' not in capsys.readouterr().out

    def test_slow_failure_is_not_retried(self, monkeypatch, capsys):
        """Barrier-timeout-style failures burn minutes; retrying them would
        double-spend the budget. Only quick failures get the retry."""
        spawns = []

        def fake_popen(argv, env=None, **kw):
            spawns.append(argv)
            return FakeProc(returncode=1)

        monkeypatch.setattr(graft.subprocess, "Popen", fake_popen)
        monkeypatch.setattr(graft, "_MP_QUICK_FAIL_S", -1.0)  # nothing is quick
        graft._multiprocess_phase(8, self._gate(), lambda m: None)
        assert len(spawns) == 1
        assert '"ok": false, "rc": 1' in capsys.readouterr().out

    def test_persistent_quick_failure_fails_open(self, monkeypatch, capsys):
        monkeypatch.setattr(
            graft.subprocess, "Popen",
            lambda argv, env=None, **kw: FakeProc(returncode=9),
        )
        graft._multiprocess_phase(8, self._gate(), lambda m: None)  # no raise
        out = capsys.readouterr().out
        assert '"ok": false, "rc": 9' in out  # still fail-open, post-retry

    def test_phase_timeout_tracks_remaining_budget(self, monkeypatch):
        envs = []

        def fake_popen(argv, env=None, **kw):
            envs.append(env)
            return FakeProc(returncode=0)

        monkeypatch.setattr(graft.subprocess, "Popen", fake_popen)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/somewhere")
        clock = FakeClock()
        gate = graft._BudgetGate(520.0, clock=clock, margin=20.0)
        clock.advance(200.0)  # 320 s remaining
        graft._multiprocess_phase(8, gate, lambda m: None)
        assert float(envs[0]["GRAFT_MP_TIMEOUT_S"]) == 300.0  # 320 - margin
        # Cache-deserialized CPU executables hang cross-process collectives
        # (measured round 4) — the cache var must never reach the workers.
        assert "JAX_COMPILATION_CACHE_DIR" not in envs[0]


class TestBenchWatchdog:
    def _patch_speed(self, monkeypatch):
        monkeypatch.setattr(bench, "_PROBE_WINDOW_S", 1)
        monkeypatch.setattr(bench, "_RETRY_SLEEP_S", 0)
        self._patch_pg(monkeypatch)

    def _patch_pg(self, monkeypatch):
        """FakeProc pids aren't real process groups: route the watchdog's
        os.killpg to ProcessLookupError (its proc.kill() fallback records
        the kill) and keep its signal-forwarding registration from touching
        the pytest process's real handlers."""
        import os as _os
        import signal as _signal

        def fake_killpg(pgid, sig):
            raise ProcessLookupError

        monkeypatch.setattr(_os, "killpg", fake_killpg)
        monkeypatch.setattr(_signal, "signal", lambda *a, **k: None)

    def test_probe_success_exits_with_child_rc(self, monkeypatch, tmp_path):
        self._patch_speed(monkeypatch)
        monkeypatch.delenv(bench._CHILD_ENV, raising=False)

        def fake_popen(argv, env=None, **kw):
            # child touches the sentinel immediately = backend healthy
            with open(env[bench._SENTINEL_ENV], "w") as f:
                f.write("tpu")
            assert env[bench._CHILD_ENV] == "1"
            return FakeProc(returncode=0, hang=True)  # still running at probe

        monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
        import subprocess as sp

        monkeypatch.setattr(sp, "Popen", fake_popen)
        with pytest.raises(SystemExit) as e:
            bench._watchdog_parent()
        assert e.value.code in (0, -9)  # child rc passthrough

    def test_hung_probe_is_killed_and_fails_structured(
        self, monkeypatch, capsys
    ):
        self._patch_speed(monkeypatch)
        monkeypatch.delenv(bench._CHILD_ENV, raising=False)
        spawned = []

        def fake_popen(argv, env=None, **kw):
            p = FakeProc(hang=True)  # never touches the sentinel
            spawned.append(p)
            return p

        monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
        import subprocess as sp

        monkeypatch.setattr(sp, "Popen", fake_popen)
        with pytest.raises(SystemExit) as e:
            bench._watchdog_parent()
        assert e.value.code == 3  # structured fast-fail, not a timeout kill
        assert len(spawned) == bench._MAX_ATTEMPTS
        assert all(p.killed for p in spawned)
        lines = [
            json.loads(ln)
            for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")
        ]
        assert lines[-1]["event"] == "backend_unavailable"
        retries = [l for l in lines if l["event"] == "backend_unavailable_retry"]
        assert len(retries) == bench._MAX_ATTEMPTS
