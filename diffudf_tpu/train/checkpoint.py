"""Checkpointing: portable .npz model artifacts + full-state resume.

The reference saves bare ``state_dict`` .pth files per epoch / best / final
(``train.py:244-275,398-401``) and cannot resume mid-run (no optimizer
state).  Here:

  * model artifacts are flat ``.npz`` files (`layer{i}_w`, `layer{i}_b`) with
    a JSON sidecar of the architecture spec — loadable with plain numpy,
    no framework required;
  * ``save_train_state`` additionally persists optimizer state + epoch so a
    run can resume exactly (a capability the reference lacks).
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import flatten_util

from ..fields.siren import SirenSpec


def save_params(path: str, params, spec: SirenSpec | None = None):
    flat = {}
    for i, layer in enumerate(params):
        flat[f"layer{i}_w"] = np.asarray(layer["w"])
        flat[f"layer{i}_b"] = np.asarray(layer["b"])
    np.savez(path, **flat)
    if spec is not None:
        with open(_spec_path(path), "w") as fh:
            json.dump(dataclasses.asdict(spec), fh)


def _spec_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".spec.json"


def load_params(path: str):
    data = np.load(path)
    n_layers = max(int(k[5 : k.index("_")]) for k in data.files) + 1
    return [
        {"w": jnp.asarray(data[f"layer{i}_w"]), "b": jnp.asarray(data[f"layer{i}_b"])}
        for i in range(n_layers)
    ]


def load_spec(path: str) -> SirenSpec:
    with open(_spec_path(path)) as fh:
        d = json.load(fh)
    d["hidden"] = tuple(d["hidden"])
    return SirenSpec(**d)


def save_train_state(path: str, params, opt_state, epoch: int, key):
    """Full resumable state as one .npz (flattened pytree + treedef-free:
    the caller re-creates structure from (spec, optimizer) and unflattens)."""
    flat_params, _ = flatten_util.ravel_pytree(params)
    flat_opt, _ = flatten_util.ravel_pytree(opt_state)
    np.savez(
        path,
        params=np.asarray(flat_params),
        opt_state=np.asarray(flat_opt),
        epoch=np.asarray(epoch),
        key=np.asarray(key),
    )


def load_train_state(path: str, params_template, opt_state_template):
    data = np.load(path)
    _, unravel_p = flatten_util.ravel_pytree(params_template)
    _, unravel_o = flatten_util.ravel_pytree(opt_state_template)
    params = unravel_p(jnp.asarray(data["params"]))
    opt_state = unravel_o(jnp.asarray(data["opt_state"]))
    return params, opt_state, int(data["epoch"]), jnp.asarray(data["key"])


def check_params_match_spec(params, spec: SirenSpec):
    """Raise a clear error when a checkpoint doesn't match the configured
    architecture (otherwise it surfaces as an opaque matmul shape error)."""
    dims = spec.layer_dims
    got = [int(p["w"].shape[0]) for p in params] + [int(params[-1]["w"].shape[1])]
    want = list(dims)
    if got != want or len(params) != len(dims) - 1:
        raise ValueError(
            f"checkpoint layer dims {got} do not match configured architecture "
            f"{want}; check hidden_layer_nodes in the config"
        )


def create_output_paths(checkpoint_path: str, experiment_name: str, overwrite: bool = False):
    """Mirror of reference ``src/util.py:10-22``: refuse to clobber unless asked."""
    full_path = os.path.join(".", checkpoint_path, experiment_name)
    if os.path.exists(full_path):
        if overwrite:
            import shutil

            shutil.rmtree(full_path)
        else:
            import logging

            logging.warning("Output path exists. Not overwriting.")
            return full_path
    os.makedirs(os.path.join(full_path, "models"), exist_ok=True)
    os.makedirs(os.path.join(full_path, "reconstructions"), exist_ok=True)
    return full_path
