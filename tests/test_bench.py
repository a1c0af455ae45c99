"""Host-side tests for bench.py's tunnel-babysitting supervisor.

The axon TPU tunnel's backend init can raise transient UNAVAILABLE errors or
hang outright for hours; the driver runs bench.py unattended at round end, so
bench.py wraps the real bench in a supervisor that retries un-warmed child
failures and kills init-hung children. These tests exercise the supervisor's
state machine with stub child scripts (no jax, no TPU).
"""

import importlib.util
import os
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_supervisor_retries_unwarmed_failures_then_succeeds(tmp_path, monkeypatch):
    bench = _load_bench()
    state = tmp_path / "attempts"
    stub = tmp_path / "child.py"
    # Fails (without warming) twice — simulating UNAVAILABLE backend init —
    # then warms up and succeeds.
    stub.write_text(
        "import os, sys\n"
        f"state = {str(state)!r}\n"
        "n = int(open(state).read()) if os.path.exists(state) else 0\n"
        "open(state, 'w').write(str(n + 1))\n"
        "if n < 2:\n"
        "    sys.exit(1)\n"
        "open(os.environ['OI_BENCH_WARM_MARKER'], 'w').close()\n"
        "sys.exit(0)\n"
    )
    monkeypatch.setattr(sys, "argv", [str(stub)])
    monkeypatch.setenv("OI_BENCH_RETRY_PAUSE_S", "0.1")
    monkeypatch.setenv("OI_BENCH_DEADLINE_S", "600")
    # Stub children exit in seconds; disable the fast-fail classifier so
    # these count as tunnel weather (like a real 25-min UNAVAILABLE init).
    monkeypatch.setenv("OI_BENCH_FAST_FAIL_S", "0")
    assert bench.supervise() == 0
    assert state.read_text() == "3"


def test_supervisor_does_not_retry_after_warmup(tmp_path, monkeypatch):
    bench = _load_bench()
    state = tmp_path / "attempts"
    stub = tmp_path / "child.py"
    # Warms up, then fails: a post-warm-up failure is a real bug (and the
    # child may have had TPU work in flight) — must NOT be retried.
    stub.write_text(
        "import os, sys\n"
        f"state = {str(state)!r}\n"
        "n = int(open(state).read()) if os.path.exists(state) else 0\n"
        "open(state, 'w').write(str(n + 1))\n"
        "open(os.environ['OI_BENCH_WARM_MARKER'], 'w').close()\n"
        "sys.exit(7)\n"
    )
    monkeypatch.setattr(sys, "argv", [str(stub)])
    monkeypatch.setenv("OI_BENCH_RETRY_PAUSE_S", "0.1")
    monkeypatch.setenv("OI_BENCH_DEADLINE_S", "600")
    assert bench.supervise() == 7
    assert state.read_text() == "1"


def test_supervisor_kills_init_hung_child(tmp_path, monkeypatch):
    bench = _load_bench()
    state = tmp_path / "attempts"
    stub = tmp_path / "child.py"
    # First attempt hangs before backend init completes (no .init marker:
    # safe to kill); second attempt succeeds. The init timeout must exceed
    # bare python startup (~6 s here: the axon site preloads jax into every
    # interpreter), or the child is killed before it can record its attempt.
    stub.write_text(
        "import os, sys, time\n"
        f"state = {str(state)!r}\n"
        "n = int(open(state).read()) if os.path.exists(state) else 0\n"
        "open(state, 'w').write(str(n + 1))\n"
        "if n == 0:\n"
        "    time.sleep(600)\n"
        "open(os.environ['OI_BENCH_WARM_MARKER'], 'w').close()\n"
        "sys.exit(0)\n"
    )
    monkeypatch.setattr(sys, "argv", [str(stub)])
    monkeypatch.setenv("OI_BENCH_RETRY_PAUSE_S", "0.1")
    monkeypatch.setenv("OI_BENCH_INIT_TIMEOUT_S", "30")
    monkeypatch.setenv("OI_BENCH_DEADLINE_S", "600")
    assert bench.supervise() == 0
    assert state.read_text() == "2"


def test_supervisor_bails_on_deterministic_fast_failures(tmp_path, monkeypatch):
    bench = _load_bench()
    state = tmp_path / "attempts"
    stub = tmp_path / "child.py"
    # Exits nonzero in seconds without touching the backend (no .init
    # marker) — an ImportError-style deterministic bug. Must surface after
    # two attempts instead of retrying for the whole deadline.
    stub.write_text(
        "import os, sys\n"
        f"state = {str(state)!r}\n"
        "n = int(open(state).read()) if os.path.exists(state) else 0\n"
        "open(state, 'w').write(str(n + 1))\n"
        "sys.exit(3)\n"
    )
    monkeypatch.setattr(sys, "argv", [str(stub)])
    monkeypatch.setenv("OI_BENCH_RETRY_PAUSE_S", "0.1")
    monkeypatch.setenv("OI_BENCH_DEADLINE_S", "600")
    assert bench.supervise() == 3
    assert state.read_text() == "2"


def test_supervisor_hard_stops_inited_hung_child(tmp_path, monkeypatch):
    bench = _load_bench()
    stub = tmp_path / "child.py"
    # Touches the device (.init marker) then hangs — e.g. the tunnel hanging
    # mid-run for hours. The supervisor must not wait forever: past
    # deadline + hard grace it kills the child anyway and fails the run.
    stub.write_text(
        "import os, sys, time\n"
        "open(os.environ['OI_BENCH_WARM_MARKER'] + '.init', 'w').close()\n"
        "time.sleep(600)\n"
        "sys.exit(0)\n"
    )
    monkeypatch.setattr(sys, "argv", [str(stub)])
    monkeypatch.setenv("OI_BENCH_DEADLINE_S", "1")
    monkeypatch.setenv("OI_BENCH_HARD_GRACE_S", "15")
    monkeypatch.setenv("OI_BENCH_INIT_TIMEOUT_S", "600")
    assert bench.supervise() == 1
