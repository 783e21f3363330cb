"""Checkpointing: params + optimizer state, every k epochs, msgpack on disk.

Parity with the reference cadence and layout
(/root/reference/Main.py:31-45, train_eval.py:56-64): files
`model_checkpoint<E>.ckpt` / `optimizer_checkpoint<E>.ckpt` in the results
dir, saved every `save_interval` epochs; `--continue-from E` reloads both.
Checkpoints double as the ensemble source and the transfer source.

Format: flax.serialization msgpack of the param/opt-state pytree. Loading
requires a template pytree with the right structure (standard JAX practice),
which train/loop.py and the CLI provide from a freshly-initialized model.
"""

from __future__ import annotations

import os


def checkpoint_path(res_dir: str, kind: str, epoch) -> str:
    return os.path.join(res_dir, f"{kind}_checkpoint{epoch}.ckpt")


def resolve_checkpoint(res_dir: str, kind: str, epoch) -> str:
    """Path of the checkpoint for (kind, epoch), accepting BOTH formats:
    this framework's `.ckpt` (msgpack) and the reference's `.pth`
    (torch state_dict, /root/reference/Main.py:43) — so `--transfer` /
    `--ensemble` work directly against a reference results directory.
    Prefers `.ckpt`; returns the (nonexistent) `.ckpt` path if neither
    exists, so callers' missing-file handling is unchanged."""
    native = checkpoint_path(res_dir, kind, epoch)
    if os.path.exists(native):
        return native
    pth = os.path.join(res_dir, f"{kind}_checkpoint{epoch}.pth")
    if os.path.exists(pth):
        return pth
    return native


def save_checkpoint(path: str, pytree) -> None:
    """Atomic write (tmp + rename): a kill mid-save — e.g. the resilient
    supervisor's stall killpg (cli/resilient.py) or a host OOM — must
    never leave a truncated file at the checkpoint path, because resume
    and ensembling both pick checkpoints BY NAME."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(pytree))
    os.replace(tmp, path)


def load_checkpoint(path: str, template):
    """Load a checkpoint into a pytree shaped like `template`. Dispatches
    on extension: `.pth` files are reference torch state_dicts (converted
    via train/torch_interop.py); anything else is native msgpack."""
    if path.endswith(".pth"):
        from .torch_interop import load_reference_checkpoint

        return load_reference_checkpoint(path, template)
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
