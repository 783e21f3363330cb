"""Stall-resilient supervisor (igmc_tpu/cli/resilient.py): stall
detection kills the exact child process group and resumes from the
latest checkpoint; clean exits end the loop; restart budget enforced."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from igmc_tpu.cli.resilient import latest_checkpoint_epoch, supervise

MONTI_AVAILABLE = os.path.isdir("/root/reference/raw_data/flixster") or \
    os.path.isdir("raw_data/flixster")


def test_latest_checkpoint_epoch(tmp_path):
    assert latest_checkpoint_epoch(str(tmp_path)) is None
    for e in (5, 10, 15):
        (tmp_path / f"model_checkpoint{e}.ckpt").write_bytes(b"x")
    (tmp_path / "optimizer_checkpoint15.ckpt").write_bytes(b"x")
    (tmp_path / "model_checkpointX.ckpt").write_bytes(b"x")  # ignored
    assert latest_checkpoint_epoch(str(tmp_path)) == 15


def _toy_child(tmp_path):
    """A child that STALLS on the first run (after writing a checkpoint)
    and exits 0 once launched with --continue-from."""
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent("""
        import os, sys, time
        res = sys.argv[1]
        resumed = "--continue-from" in sys.argv
        print("child start", sys.argv, flush=True)
        if not resumed:
            open(os.path.join(res, "model_checkpoint3.ckpt"), "wb").close()
            print("checkpoint 3 saved; now wedging", flush=True)
            time.sleep(600)  # wedge: no further output
        else:
            assert sys.argv[sys.argv.index("--continue-from") + 1] == "3"
            print("resumed fine", flush=True)
    """))
    return script


def test_supervise_kills_stall_and_resumes(tmp_path):
    script = _toy_child(tmp_path)
    res = tmp_path / "res"
    res.mkdir()
    calls = []

    def build_cmd(resume):
        calls.append(resume)
        cmd = [sys.executable, str(script), str(res)]
        if resume is not None:
            cmd += ["--continue-from", str(resume)]
        return cmd

    rc, history = supervise(build_cmd, str(res), str(tmp_path / "sup.log"),
                            stall_timeout=3.0, max_restarts=2, poll=0.3,
                            term_grace=5.0)
    assert rc == 0
    assert calls == [None, 3]
    assert len(history) == 1 and history[0][0].startswith("stalled")
    assert history[0][1] == 3
    log = (tmp_path / "sup.log").read_text()
    assert "wedging" in log and "resumed fine" in log


def test_supervise_restart_budget(tmp_path):
    script = tmp_path / "crash.py"
    script.write_text("import sys; print('boom', flush=True); sys.exit(7)")
    res = tmp_path / "res"
    res.mkdir()
    rc, history = supervise(
        lambda resume: [sys.executable, str(script)],
        str(res), str(tmp_path / "sup.log"),
        stall_timeout=30.0, max_restarts=2, poll=0.2)
    assert rc == 7
    assert len(history) == 3  # initial failure + 2 restarts, all recorded


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
def test_resilient_cli_end_to_end(tmp_path, monkeypatch):
    """The real wrapper supervises an actual (clean) flixster debug run
    through a subprocess and exits 0 with a written log."""
    monkeypatch.chdir(tmp_path)
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": "/root/repo"}
    out = subprocess.run(
        [sys.executable, "-m", "igmc_tpu.cli.resilient",
         "--stall-timeout", "600", "--",
         "--data-name", "flixster", "--testing", "--debug",
         "--epochs", "1", "--max-train-num", "80", "--max-test-num", "40"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    res = tmp_path / "results" / "flixster_testmode"
    log = (res / "log.txt").read_text().strip().splitlines()
    assert len(log) == 1
    assert np.isfinite(float(log[-1].split(" ")[-1]))
    assert (res / "supervisor.log").exists()


def test_supervise_first_launch_ignores_stale_checkpoints(tmp_path):
    """Checkpoints left by a PREVIOUS run must not turn a fresh run into
    a silent no-op resume: only post-failure relaunches scan the dir."""
    res = tmp_path / "res"
    res.mkdir()
    (res / "model_checkpoint80.ckpt").write_bytes(b"stale")
    script = tmp_path / "ok.py"
    script.write_text("print('fresh run', flush=True)")
    calls = []

    def build_cmd(resume):
        calls.append(resume)
        return [sys.executable, str(script)]

    rc, history = supervise(build_cmd, str(res), str(tmp_path / "sup.log"),
                            stall_timeout=30.0, max_restarts=1, poll=0.2)
    assert rc == 0 and calls == [None] and history == []


def test_supervise_exit_code_never_negative(tmp_path):
    """A signal-killed child's raw negative returncode must not leak as
    the supervisor's exit status."""
    script = tmp_path / "sigkill.py"
    script.write_text(
        "import os, signal; os.kill(os.getpid(), signal.SIGKILL)")
    res = tmp_path / "res"
    res.mkdir()
    rc, history = supervise(
        lambda resume: [sys.executable, str(script)],
        str(res), str(tmp_path / "sup.log"),
        stall_timeout=30.0, max_restarts=1, poll=0.2)
    assert rc == 1 and len(history) == 2
