"""Results-dir management and the reference-compatible log format.

Parity (/root/reference/Main.py:31-45, :183-210):
  * results/<data_name><save_appendix>_<testmode|valmode>/
  * log.txt — one line per epoch: "Epoch {}, train loss {:.4f}, test rmse {:.6f}"
    (summarize_fdy.py parses the last line's final token — a de-facto API).
  * cmd_input.txt — the exact command line, appended.
  * checkpoints every `save_interval` epochs.
"""

from __future__ import annotations

import os
import sys

from ..train.checkpoints import checkpoint_path, save_checkpoint


class ResultsDir:
    def __init__(self, base: str, data_name: str, save_appendix: str,
                 testing: bool):
        mode = "testmode" if testing else "valmode"
        self.path = os.path.join(base, f"{data_name}{save_appendix}_{mode}")
        os.makedirs(self.path, exist_ok=True)

    def record_cmd(self) -> None:
        cmd = "python " + " ".join(sys.argv) + "\n"
        with open(os.path.join(self.path, "cmd_input.txt"), "a") as f:
            f.write(cmd)
        print("Command line input: " + cmd + " is saved.")

    def snapshot_source(self) -> None:
        """Record code provenance in the results dir.

        The reference copies its four source files into the results dir
        (/root/reference/Main.py:200-205); with a real package the
        equivalent is the git revision + a content manifest of igmc_tpu/."""
        import hashlib
        import subprocess

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        lines = []
        try:
            rev = subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=pkg_root,
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
            if rev:
                lines.append(f"git_revision {rev}")
        except Exception:
            pass
        for dirpath, _, files in sorted(os.walk(pkg_root)):
            for fn in sorted(files):
                if not fn.endswith((".py", ".cpp")):
                    continue
                p = os.path.join(dirpath, fn)
                with open(p, "rb") as f:
                    h = hashlib.sha256(f.read()).hexdigest()[:16]
                lines.append(f"{h} {os.path.relpath(p, pkg_root)}")
        with open(os.path.join(self.path, "source_snapshot.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    def log_line(self, text: str) -> None:
        with open(os.path.join(self.path, "log.txt"), "a") as f:
            f.write(text + "\n")


def make_logger(res_dir: ResultsDir, save_interval: int):
    """Per-epoch callback: append to log.txt, checkpoint every k epochs."""

    def logger(info, state):
        epoch, train_loss, test_rmse = (
            info["epoch"], info["train_loss"], info["test_rmse"],
        )
        res_dir.log_line(
            "Epoch {}, train loss {:.4f}, test rmse {:.6f}".format(
                epoch, train_loss, test_rmse
            )
        )
        if isinstance(epoch, int) and epoch % save_interval == 0 and state is not None:
            print("Saving model states...")
            save_checkpoint(
                checkpoint_path(res_dir.path, "model", epoch), state.params
            )
            save_checkpoint(
                checkpoint_path(res_dir.path, "optimizer", epoch), state.opt_state
            )

    return logger
