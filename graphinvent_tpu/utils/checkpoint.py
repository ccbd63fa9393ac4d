"""Checkpointing: model params + optimizer state + schedule step together.

The reference stores only ``state_dict`` and silently re-initialises Adam +
OneCycle on restart (Workflow.py:208-237, a known gap noted in SURVEY.md
§5).  Here the full training state pytree is serialised with
flax.serialization msgpack; file naming keeps the reference's
``model_restart_{epoch}`` convention so job dirs look familiar.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from graphinvent_tpu.train.optim import AdamState


def save_checkpoint(path: str, params: Any, opt_state: Optional[AdamState],
                    epoch: int) -> None:
    payload = {
        "params": jax.device_get(params),
        "opt": None if opt_state is None else {
            "step": jax.device_get(opt_state.step),
            "mu": jax.device_get(opt_state.mu),
            "nu": jax.device_get(opt_state.nu),
        },
        "epoch": epoch,
    }
    data = serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Any, Optional[AdamState], int]:
    with open(path, "rb") as fh:
        payload = serialization.msgpack_restore(fh.read())
    params = payload["params"]
    opt = payload.get("opt")
    opt_state = None
    if opt is not None:
        opt_state = AdamState(step=opt["step"], mu=opt["mu"], nu=opt["nu"])
    return params, opt_state, int(payload.get("epoch", 0))


def load_params_any(cfg, path: str):
    """Loads model params from a native ``.ckpt`` or a reference PyTorch
    ``.pth``/``.pt`` checkpoint (reference Workflow.py:493-500)."""
    if path.endswith((".pth", ".pt")):
        from graphinvent_tpu.utils.torch_import import load_torch_checkpoint
        return load_torch_checkpoint(cfg, path)
    return load_checkpoint(path)[0]


def checkpoint_path(job_dir: str, epoch: int,
                    allow_torch: bool = False) -> str:
    """Path of the epoch's checkpoint; with ``allow_torch``, falls back to
    the reference's ``model_restart_{epoch}.pth`` when no native file
    exists (so jobs can run straight out of a reference job dir)."""
    native = os.path.join(job_dir, f"model_restart_{epoch}.ckpt")
    if allow_torch and not os.path.exists(native):
        torch_path = os.path.join(job_dir, f"model_restart_{epoch}.pth")
        if os.path.exists(torch_path):
            return torch_path
    return native


def latest_checkpoint(job_dir: str) -> Optional[Tuple[str, int]]:
    """Newest checkpoint in the dir -- native ``.ckpt`` preferred over a
    reference ``.pth`` of the same epoch."""
    best: Optional[Tuple[str, int]] = None
    if not os.path.isdir(job_dir):
        return None
    for name in os.listdir(job_dir):
        m = re.match(r"model_restart_(\d+)\.(ckpt|pth)$", name)
        if m:
            epoch = int(m.group(1))
            is_native = m.group(2) == "ckpt"
            if best is None or epoch > best[1] or (
                    epoch == best[1] and is_native):
                best = (os.path.join(job_dir, name), epoch)
    return best
