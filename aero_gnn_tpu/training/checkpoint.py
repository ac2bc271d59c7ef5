"""Checkpoint / resume via Orbax (absent in the reference, which only saves
final weights — /root/reference/train.py:258-271; here we add periodic
params+opt_state+epoch checkpoints with restart-on-failure resume, and the
final-artifact save path used by the inference CLI)."""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"ckpt_{step:08d}.pkl")


def save(ckpt_dir: str, params, opt_state, epoch: int,
         history: Dict[str, Any]) -> str:
    """Save params + optimizer state + epoch. Uses a plain pytree->numpy
    pickle (host-local, single-process); orbax is used for the async
    multi-host path in parallel training (see parallel/)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, opt_state),
        "epoch": epoch,
        "history": history,
    }
    path = _ckpt_path(ckpt_dir, epoch)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash
    return path


def restore_latest(ckpt_dir: str, params_like, opt_state_like
                   ) -> Optional[Tuple[Any, Any, int, Dict]]:
    """Restore the newest checkpoint, re-treeing onto the given structures."""
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(p for p in os.listdir(ckpt_dir)
                   if p.startswith("ckpt_") and p.endswith(".pkl"))
    if not ckpts:
        return None
    with open(os.path.join(ckpt_dir, ckpts[-1]), "rb") as f:
        payload = pickle.load(f)
    params = jax.tree.map(lambda _, v: jax.numpy.asarray(v),
                          params_like, payload["params"])
    opt_state = jax.tree.map(
        lambda _, v: (jax.numpy.asarray(v) if hasattr(v, "shape") else v),
        opt_state_like, payload["opt_state"])
    return params, opt_state, payload["epoch"], payload["history"]


# ---------------------------------------------------------------------------
# Orbax backend (async, multi-host-safe) — optional; the pickle path above
# is the default for single-process runs.
# ---------------------------------------------------------------------------

def make_orbax_manager(ckpt_dir: str, *, max_to_keep: int = 3,
                       async_save: bool = True):
    """CheckpointManager for params+opt_state+history pytrees."""
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, enable_async_checkpointing=async_save)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_orbax(manager, params, opt_state, epoch: int,
               history: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    manager.save(epoch, args=ocp.args.Composite(
        state=ocp.args.StandardSave({"params": params,
                                     "opt_state": opt_state}),
        history=ocp.args.JsonSave(history)))


def restore_orbax(manager, params_like, opt_state_like):
    """Restore the newest orbax step; None when the directory is empty."""
    import orbax.checkpoint as ocp

    step = manager.latest_step()
    if step is None:
        return None
    restored = manager.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore({"params": params_like,
                                        "opt_state": opt_state_like}),
        history=ocp.args.JsonRestore()))
    return (restored["state"]["params"], restored["state"]["opt_state"],
            step, dict(restored["history"]))


def save_params(path: str, params) -> None:
    """Final model weights artifact (model_weights equivalent)."""
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)


def load_params(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_norm_stats(path: str, stats: Dict[str, np.ndarray]) -> None:
    np.savez(path, **stats)


def load_norm_stats(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
