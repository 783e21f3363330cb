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


def save_checkpoint(path: str, pytree) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(pytree))


def load_checkpoint(path: str, template):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
