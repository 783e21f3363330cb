"""Reference (.pth) checkpoint interoperability.

The reference trains in PyTorch and saves ``model.state_dict()`` as
``model_checkpoint<E>.pth`` (/root/reference/Main.py:43); its transfer and
ensemble workflows re-load those files (/root/reference/Main.py:424,469,
train_eval.py:217). This module converts between that format and this
framework's parameter pytrees, in both directions, so

  * a model trained by the reference (e.g. the paper's ML-100K source
    model) can be evaluated / transferred / ensembled HERE, and
  * a model trained here can be exported for the reference's tooling.

Tensor layout notes (PyG 1.4.2 / torch conventions, judged against
/root/reference/models.py:170-190):

  * RGCNConv parameters ``basis`` [num_bases, in, out], ``att`` [R,
    num_bases], ``root`` [in, out], ``bias`` [out] — identical layouts to
    ``rgcn_init`` here, copied verbatim.
  * GCNConv ``weight`` [in, out], ``bias`` [out] — identical to
    ``gcn_init``, copied verbatim.
  * ``torch.nn.Linear`` stores ``weight`` as [out, in]; this framework
    stores [in, out] (matmul-friendly) — transposed on the way through.
  * ``torch.nn.Conv1d`` stores ``weight`` as [out_ch, in_ch, k] — identical
    to ``_conv1d_init``, copied verbatim.

Optimizer state is deliberately NOT converted: the reference's own
cross-model workflows (transfer, ensemble, visualization) load model
state only and build a fresh optimizer; resuming a foreign optimizer
mid-run is not a supported reference behavior either.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

# Our pytree key -> reference state_dict module prefix. Conv lists are
# handled structurally ("convs.{i}.<param>").
_MODULE_NAMES = {
    "lin1": "lin1",
    "lin2": "lin2",
    "conv1d_1": "conv1d_params1",
    "conv1d_2": "conv1d_params2",
}

# Param names whose torch layout is transposed relative to ours.
_LINEAR_KEYS = ("lin1", "lin2")


def state_dict_from_params(params) -> "OrderedDict[str, object]":
    """Our params pytree -> a reference-compatible ``state_dict``.

    Returns an OrderedDict of torch CPU tensors in the reference's
    registration order (convs.*, lin1, lin2[, conv1d_params*]), loadable
    by ``model.load_state_dict`` on the reference's IGMC/GNN/DGCNN[_RS]
    classes of matching configuration.
    """
    import torch

    sd = OrderedDict()
    for i, conv in enumerate(params["convs"]):
        for k, v in conv.items():
            sd[f"convs.{i}.{k}"] = torch.from_numpy(
                np.array(v, dtype=np.float32))
    for ours, theirs in _MODULE_NAMES.items():
        if ours not in params:
            continue
        w = np.array(params[ours]["weight"], dtype=np.float32)
        if ours in _LINEAR_KEYS:
            w = w.T  # [in, out] -> torch Linear's [out, in]
        sd[f"{theirs}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        sd[f"{theirs}.bias"] = torch.from_numpy(
            np.array(params[ours]["bias"], dtype=np.float32))
    return sd


def params_from_state_dict(state_dict, template):
    """A reference ``state_dict`` -> params pytree shaped like ``template``.

    ``template`` is a freshly-initialized params pytree of the SAME model
    configuration (arity, latent dims, side features) — standard JAX
    checkpoint-loading practice, and how shape mismatches are caught.
    Raises KeyError/ValueError with the offending entry named.
    """
    import jax.numpy as jnp

    def fetch(name, like):
        if name not in state_dict:
            raise KeyError(
                f"reference checkpoint is missing '{name}' — is it from a "
                f"different model class or configuration?")
        arr = np.asarray(state_dict[name].detach().cpu().numpy()
                         if hasattr(state_dict[name], "detach")
                         else state_dict[name], dtype=np.float32)
        return arr, tuple(np.shape(like))

    out = {"convs": []}
    for i, conv in enumerate(template["convs"]):
        new_conv = {}
        for k, v in conv.items():
            arr, want = fetch(f"convs.{i}.{k}", v)
            if arr.shape != want:
                raise ValueError(
                    f"convs.{i}.{k}: checkpoint shape {arr.shape} != "
                    f"model shape {want}")
            new_conv[k] = jnp.asarray(arr)
        out["convs"].append(new_conv)
    for ours, theirs in _MODULE_NAMES.items():
        if ours not in template:
            continue
        w, want_w = fetch(f"{theirs}.weight", template[ours]["weight"])
        if ours in _LINEAR_KEYS:
            w = w.T  # torch Linear's [out, in] -> our [in, out]
        if w.shape != want_w:
            raise ValueError(
                f"{theirs}.weight: checkpoint shape {w.shape} (after "
                f"layout fix) != model shape {want_w}")
        b, want_b = fetch(f"{theirs}.bias", template[ours]["bias"])
        if b.shape != want_b:
            raise ValueError(
                f"{theirs}.bias: checkpoint shape {b.shape} != "
                f"model shape {want_b}")
        out[ours] = {"weight": jnp.asarray(np.ascontiguousarray(w)),
                     "bias": jnp.asarray(b)}
    extra = set(state_dict) - _expected_keys(template)
    if extra:
        raise ValueError(
            f"reference checkpoint has unexpected entries {sorted(extra)} — "
            f"wrong model class for this template?")
    return out


def _expected_keys(template):
    keys = set()
    for i, conv in enumerate(template["convs"]):
        keys |= {f"convs.{i}.{k}" for k in conv}
    for ours, theirs in _MODULE_NAMES.items():
        if ours in template:
            keys |= {f"{theirs}.weight", f"{theirs}.bias"}
    return keys


def load_reference_checkpoint(path: str, template):
    """Load a reference ``model_checkpoint*.pth`` into a params pytree."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(path, map_location="cpu")
    if not isinstance(sd, dict):
        raise ValueError(f"{path} does not contain a state_dict")
    return params_from_state_dict(sd, template)


def save_reference_checkpoint(path: str, params) -> None:
    """Export a params pytree as a reference-loadable ``.pth``."""
    import os

    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(state_dict_from_params(params), path)
