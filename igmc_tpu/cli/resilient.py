"""Stall-resilient training supervisor: run the CLI, auto-resume on hangs.

The reference has no failure recovery beyond manual `--continue-from N`
(/root/reference/Main.py:102-103). On real fleets — and acutely on this
repo's tunneled TPU — training can wedge without crashing: the round-5
ml_1m flagship run hit BOTH observed modes (a tunnel-client deadlock with
every thread futex-waiting, and a "TPU worker process crashed" that
surfaced only minutes later), each costing a manual kill + resume
(results_archive/ml1m_full_static_r05/README.md). This wrapper automates
exactly that operator loop:

    python -m igmc_tpu.cli.resilient [--stall-timeout S] [--max-restarts N]
        -- <ordinary igmc_tpu.cli.main arguments>

  * the child runs in its OWN process group (start_new_session), so a
    stall is cleaned up by killing that exact pgid — never by pattern;
  * liveness = mtime of the child's combined stdout/stderr stream
    (tqdm/progress output covers extraction, compile gaps and training;
    the default 900 s timeout comfortably exceeds remote-compile pauses);
  * on a stall or a nonzero exit, the child is relaunched with
    `--continue-from <latest model_checkpoint*.ckpt epoch>` (from
    scratch when none was saved yet);
  * a child that exits 0 ends the loop; more than --max-restarts
    interventions aborts with the full history.

Checkpoint cadence bounds the recomputed work (--save-interval), and
resume replays the identical shuffle order (train/loop.py), so the
supervised run's log is the same run with duplicated epoch ranges —
exactly like the archived manual recovery.
"""

from __future__ import annotations

import argparse
import os
import re
import signal
import subprocess
import sys
import time


def latest_checkpoint_epoch(res_dir: str):
    """Largest E among model_checkpoint<E>.ckpt files, or None."""
    best = None
    if os.path.isdir(res_dir):
        for name in os.listdir(res_dir):
            m = re.fullmatch(r"model_checkpoint(\d+)\.ckpt", name)
            if m:
                e = int(m.group(1))
                best = e if best is None else max(best, e)
    return best


def child_results_dir(child_args):
    """Resolve the results dir the SAME way cli.main does (parse its own
    parser, apply its naming rule) so the supervisor watches the right
    checkpoints without duplicating naming logic by hand."""
    from ..utils.logging import ResultsDir
    from .main import build_parser

    args = build_parser().parse_args(child_args)
    return ResultsDir("results", args.data_name, args.save_appendix,
                      args.testing).path


def supervise(build_cmd, res_dir: str, log_path: str,
              stall_timeout: float = 900.0, max_restarts: int = 5,
              poll: float = 5.0, term_grace: float = 20.0,
              sleep_fn=time.sleep, initial_resume=None):
    """Run build_cmd(resume_epoch) children until one exits 0.

    Returns (exit_code, history) where history is a list of
    (reason, resume_epoch) per intervention. `build_cmd` maps the resume
    epoch (None = fresh) to an argv list. The FIRST launch uses
    `initial_resume` exactly as given (the caller's own --continue-from,
    or None for a fresh start) — checkpoints left in the results dir by
    a PREVIOUS run must not silently turn a requested fresh run into a
    no-op resume; only post-failure relaunches scan the directory.
    """
    history = []
    restarts = 0
    resume = initial_resume
    while True:
        cmd = build_cmd(resume)
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        with open(log_path, "ab", buffering=0) as log_f:
            log_f.write(f"\n=== supervisor: launching (resume={resume}) "
                        f"===\n".encode())
            child = subprocess.Popen(cmd, stdout=log_f,
                                     stderr=subprocess.STDOUT,
                                     start_new_session=True)
            stalled = False
            while True:
                rc = child.poll()
                if rc is not None:
                    break
                age = time.time() - os.stat(log_path).st_mtime
                if age > stall_timeout:
                    stalled = True
                    # kill the child's OWN process group (exact pgid of a
                    # process we spawned; never a pattern match). The
                    # child may die on its own in this window — treat a
                    # vanished group as already exited.
                    try:
                        pgid = os.getpgid(child.pid)
                        os.killpg(pgid, signal.SIGTERM)
                        try:
                            child.wait(timeout=term_grace)
                        except subprocess.TimeoutExpired:
                            os.killpg(pgid, signal.SIGKILL)
                            child.wait()
                    except ProcessLookupError:
                        child.wait()
                    rc = child.returncode
                    break
                sleep_fn(poll)
        if not stalled and rc == 0:
            return 0, history
        reason = (f"stalled (no output {stall_timeout:.0f}s)" if stalled
                  else f"exit {rc}")
        restarts += 1
        resume = latest_checkpoint_epoch(res_dir)
        history.append((reason, resume))
        print(f"supervisor: child {reason}; "
              f"restart {restarts}/{max_restarts} from "
              f"{'scratch' if resume is None else f'epoch {resume}'}",
              flush=True)
        if restarts > max_restarts:
            print(f"supervisor: giving up after {max_restarts} restarts; "
                  f"history: {history}", flush=True)
            # deliberate positive exit status (a signal-killed child's raw
            # rc is negative, which SystemExit would garble)
            return rc if rc and rc > 0 else 1, history


def main(argv=None):
    p = argparse.ArgumentParser(
        description="stall-resilient wrapper around igmc_tpu.cli.main "
                    "(args after -- pass through)")
    p.add_argument("--stall-timeout", type=float, default=900.0,
                   help="seconds without child output before the run is "
                        "declared wedged and resumed from the last "
                        "checkpoint (default 900; first-epoch compiles "
                        "through a remote service can pause ~7 min)")
    p.add_argument("--max-restarts", type=int, default=5)
    p.add_argument("--log", default="",
                   help="supervisor log file (default "
                        "<results-dir>/supervisor.log)")
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        own, child_args = argv[:split], argv[split + 1:]
    else:
        own, child_args = [], argv
    args = p.parse_args(own)
    if not child_args:
        p.error("no child arguments; usage: ... -- --data-name flixster ...")

    res_dir = child_results_dir(child_args)
    log_path = args.log or os.path.join(res_dir, "supervisor.log")

    # the supervisor owns resumption AFTER a failure; the caller's own
    # --continue-from (if any) applies to the first launch only
    base = list(child_args)
    initial_resume = None
    if "--continue-from" in base:
        i = base.index("--continue-from")
        initial_resume = int(base[i + 1])
        del base[i:i + 2]

    def build_cmd(resume):
        cmd = [sys.executable, "-m", "igmc_tpu.cli.main"] + base
        if resume is not None:
            cmd += ["--continue-from", str(resume)]
        return cmd

    rc, history = supervise(build_cmd, res_dir, log_path,
                            stall_timeout=args.stall_timeout,
                            max_restarts=args.max_restarts,
                            initial_resume=initial_resume)
    if history:
        print(f"supervisor: {len(history)} intervention(s): {history}",
              flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
