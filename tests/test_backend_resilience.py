"""Regression tests for the round-3 driver failures: a REGISTERED but
UNAVAILABLE TPU backend (dead tunnel) must never hang `dryrun_multichip`
(MULTICHIP_r03 rc=124) or crash `bench.py` without a diagnostic JSON line
(BENCH_r03 rc=1).

The failure mode is simulated faithfully: a fake `sitecustomize.py` on the
child's PYTHONPATH patches `jax._src.xla_bridge.backends` to BLOCK unless
the platform config was pinned to cpu — exactly how the env's axon plugin
behaves when the tunnel is down (init hangs; JAX_PLATFORMS env alone is
ignored). The old code path (`jax.device_count()` in the parent,
__graft_entry__ round 3 line 49) hangs under this fixture; the bounded
subprocess probe must not.
"""

import json
import os
import subprocess
import sys
import time
import types

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402
import bench  # noqa: E402

HANG_SITECUSTOMIZE = """\
import time

import jax
from jax._src import xla_bridge as _xb

_orig_backends = _xb.backends


def _backends(*a, **k):
    if (jax.config.jax_platforms or "") == "cpu":
        return _orig_backends(*a, **k)
    time.sleep(600)  # dead-tunnel axon init: blocks forever


_xb.backends = _backends
"""


@pytest.fixture
def hang_env(tmp_path, monkeypatch):
    """Environment where any non-cpu backend init blocks for 600 s."""
    (tmp_path / "sitecustomize.py").write_text(HANG_SITECUSTOMIZE)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setenv("PYTHONPATH", f"{tmp_path}{os.pathsep}{repo}")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)  # driver world: unpinned
    return tmp_path


def test_probe_times_out_on_hanging_backend(hang_env):
    t0 = time.perf_counter()
    assert graft._probe_real_devices(timeout_s=5.0) is None
    assert time.perf_counter() - t0 < 30.0


def test_probe_reports_failing_backend(tmp_path, monkeypatch):
    """Backend that RAISES at init ('TPU backend setup/compile error',
    BENCH_r03) → probe returns None instead of propagating."""
    (tmp_path / "sitecustomize.py").write_text(
        "import jax\nfrom jax._src import xla_bridge as _xb\n"
        "def _boom(*a, **k):\n"
        "    if (jax.config.jax_platforms or '') == 'cpu':\n"
        "        raise SystemExit(7)\n"
        "    raise RuntimeError('Unable to initialize backend axon: UNAVAILABLE')\n"
        "_xb.backends = _boom\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setenv("PYTHONPATH", f"{tmp_path}{os.pathsep}{repo}")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert graft._probe_real_devices(timeout_s=60.0) is None


def test_probe_counts_virtual_cpu_devices():
    """Under the suite env (JAX_PLATFORMS=cpu + 8 forced host devices) the
    probe must report 8 — keeping the in-process dryrun path reachable."""
    assert graft._probe_real_devices(timeout_s=120.0) == 8


def test_dryrun_diverts_to_cpu_when_probe_fails(monkeypatch):
    """dryrun_multichip must take the virtual-CPU re-exec path — never an
    in-process backend init — when the probe reports no usable backend."""
    monkeypatch.setattr(graft, "_probe_real_devices", lambda *a, **k: None)
    captured = {}

    def fake_popen(cmd, **kw):
        captured["cmd"] = cmd
        captured["env"] = kw.get("env", {})
        kw["stdout"].write("dryrun_multichip OK (fake)\n")
        return types.SimpleNamespace(wait=lambda timeout=None: 0, pid=0)

    monkeypatch.setattr(graft.subprocess, "Popen", fake_popen)
    graft.dryrun_multichip(8)
    code = captured["cmd"][-1]
    assert "jax.config.update('jax_platforms', 'cpu')" in code
    assert "_dryrun_multichip_impl(8)" in code
    assert "--xla_force_host_platform_device_count=8" in captured["env"]["XLA_FLAGS"]


def test_probe_bounded_despite_stdio_inheriting_grandchild(monkeypatch):
    """A half-up tunnel makes the axon init spawn relay helpers that inherit
    the probe child's stdio and outlive it. With PIPE stdio + subprocess.run
    the probe then blocked FOREVER in communicate() after the timeout kill
    (pipe never reaches EOF) — the round-4 'bounded probe that was not
    bounded'. The temp-file + killpg probe must return at the timeout and
    take the grandchild down with the group."""
    monkeypatch.setattr(
        graft, "_PROBE_CODE",
        "import subprocess, sys, time\n"
        "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(600)'])\n"
        "time.sleep(600)\n",
    )
    t0 = time.perf_counter()
    assert graft._probe_real_devices(timeout_s=3.0) is None
    assert time.perf_counter() - t0 < 30.0


@pytest.mark.slow
def test_dryrun_end_to_end_with_hanging_backend(hang_env, monkeypatch):
    """The driver's EXACT invocation under a dead tunnel: a fresh interpreter
    (axon-like hang registered, no platform pin) calling dryrun_multichip(8)
    must complete green via the virtual-CPU path."""
    monkeypatch.setenv("CEREBRA_PROBE_TIMEOUT_S", "8")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # driver does not force a device count
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_DONE')"],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout
    assert "dryrun_multichip OK" in proc.stdout
    assert "DRYRUN_DONE" in proc.stdout


@pytest.mark.slow  # probe timeout + full-scale CPU entry compile + dryrun
def test_main_falls_back_to_cpu_under_pinned_dead_backend(hang_env, monkeypatch):
    """`python __graft_entry__.py` in the REAL driver world: the env pins
    JAX_PLATFORMS=axon (kernel_env), the backend is dead. Honoring the pin
    alone hangs the entry() jit in-process (round-4 regression, observed
    9m+); the probe-then-CPU-fallback must complete green."""
    monkeypatch.setenv("CEREBRA_PROBE_TIMEOUT_S", "8")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"  # the driver env's pin
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py"],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout
    assert "entry OK" in proc.stdout
    assert "dryrun_multichip OK" in proc.stdout


def test_bench_wait_for_backend_raises_after_bounded_retries(hang_env):
    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="unavailable"):
        bench.wait_for_backend(attempts=2, probe_timeout_s=3.0, backoff_s=0.2)
    assert time.perf_counter() - t0 < 60.0


def test_bench_main_emits_diagnostic_json_on_backend_failure(monkeypatch, capsys):
    """bench.main under a dead backend: ONE machine-readable JSON line on
    stdout (value null + error message), exit code 3 — never a bare
    traceback (BENCH_r03 regression)."""
    monkeypatch.setattr(
        bench, "measure_torch_baseline",
        lambda: {"windows_per_s": 1.0, "windows_per_s_b1024": 1.0},
    )

    def dead_backend(*a, **k):
        raise RuntimeError("JAX backend failed to initialize: tunnel unavailable")

    monkeypatch.setattr(bench, "wait_for_backend", dead_backend)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 3
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert payload["value"] is None and payload["vs_baseline"] is None
    assert "tunnel unavailable" in payload["error"]
    assert payload["metric"] == "eeg_windows_per_sec_per_chip_filter_lstm_fwd_bwd"


def test_bench_failure_line_reemits_last_green(monkeypatch, capsys, tmp_path):
    """VERDICT r4 #7: a dead-tunnel bench run must carry the best-known
    verified number with provenance in the same JSON line, not just null."""
    ledger = tmp_path / "lastgreen.json"
    ledger.write_text(json.dumps({
        "value": 135369.3, "unit": "windows/s", "vs_baseline": 7259.02,
        "timestamp_utc": "2026-08-17T08:04:21Z", "git_sha": "12462e7",
        "recorded_by": "BENCH_r02.json (driver)",
    }))
    monkeypatch.setattr(bench, "LASTGREEN_PATH", str(ledger))
    monkeypatch.setattr(
        bench, "measure_torch_baseline",
        lambda: {"windows_per_s": 1.0, "windows_per_s_b1024": 1.0},
    )

    def dead_backend(*a, **k):
        raise RuntimeError("tunnel unavailable")

    monkeypatch.setattr(bench, "wait_for_backend", dead_backend)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 3
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert payload["value"] is None
    assert payload["last_green"]["value"] == 135369.3
    assert payload["last_green"]["git_sha"] == "12462e7"
    assert payload["last_green"]["timestamp_utc"].endswith("Z")


def test_measure_jax_bounded_kills_hung_child(monkeypatch, tmp_path):
    """ADVICE r4: the SIGALRM watchdog cannot fire while a dead tunnel blocks
    in a C call — the bound must live OUT of process. A child that hangs (and
    spawns a stdio-inheriting grandchild, the relay-helper failure mode) must
    be killed at the timeout with the whole process group."""
    fake = tmp_path / "fake_bench.py"
    fake.write_text(
        "import subprocess, sys, time\n"
        "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(600)'])\n"
        "time.sleep(600)\n"
    )
    monkeypatch.setattr(bench, "__file__", str(fake))
    t0 = time.perf_counter()
    with pytest.raises(TimeoutError, match="watchdog"):
        bench.measure_jax_bounded(timeout_s=3.0)
    assert time.perf_counter() - t0 < 30.0


def test_measure_jax_bounded_parses_child_result(monkeypatch, tmp_path):
    fake = tmp_path / "fake_bench.py"
    fake.write_text("print('CHILD_RESULT={\"wps\": 123.5}')\n")
    monkeypatch.setattr(bench, "__file__", str(fake))
    assert bench.measure_jax_bounded(timeout_s=60.0) == 123.5


def test_bench_green_run_writes_last_green_ledger(monkeypatch, capsys, tmp_path):
    """A green bench must refresh the ledger the failure path re-emits."""
    ledger = tmp_path / "lastgreen.json"
    monkeypatch.setattr(bench, "LASTGREEN_PATH", str(ledger))
    monkeypatch.setattr(
        bench, "measure_torch_baseline",
        lambda: {"windows_per_s": 10.0, "windows_per_s_b1024": 20.0},
    )
    monkeypatch.setattr(bench, "wait_for_backend", lambda: None)
    monkeypatch.setattr(bench, "measure_jax_bounded", lambda timeout_s: 170000.0)
    bench.main()
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["value"] == 170000.0
    assert payload["vs_baseline"] == 8500.0
    rec = json.loads(ledger.read_text())
    assert rec["value"] == 170000.0 and rec["git_sha"]


@pytest.mark.slow
def test_cpu_env_cli_runs_under_dead_tunnel(hang_env, monkeypatch):
    """JAX_PLATFORMS=cpu must select CPU for EVERY CLI even though the site
    plugin overwrote the jax_platforms config at interpreter start — CLIs
    without an explicit init_distributed() pin used to initialize the
    remote backend on their first jnp call and hang when the tunnel is down
    (cerebra/__init__._honor_cpu_platform_env regression)."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "cerebra.cli.discover_channels", "--synthetic",
         "--max_channels", "1", "--synthetic_classes", "2",
         "--synthetic_per_class", "4", "--synthetic_channels", "4",
         "--synthetic_samples", "16", "--log_dir", "/tmp/cerebra_test_ch"],
        env=dict(os.environ), cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert "greedy sweep over" in proc.stdout
