"""Checkpoint I/O in the reference's saves/{G|D}-{epoch} layout.

Replaces torch.save state dicts (reference util.py:16-42) with flax
msgpack serialization. The D checkpoint additionally carries the privacy
accountant state and the (possibly adapted) clipping/scaling vectors, fixing
the reference's resume-epsilon undercount (SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_pure(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_g(path: str, epoch: int, state, loss: float = 0.0) -> None:
    payload = {
        "epoch": epoch,
        "model_state_dict": serialization.to_state_dict(_to_pure(state.g_params)),
        "batch_stats": serialization.to_state_dict(_to_pure(state.g_batch_stats)),
        "optimizer_state_dict": serialization.to_state_dict(_to_pure(state.g_opt_state)),
        "loss": loss,
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def save_d(path: str, epoch: int, state, accountant_state: Optional[dict] = None,
           loss: float = 0.0) -> None:
    payload = {
        "epoch": epoch,
        "model_state_dict": serialization.to_state_dict(_to_pure(state.d_params)),
        "optimizer_state_dict": serialization.to_state_dict(_to_pure(state.d_opt_state)),
        "clipping": serialization.to_state_dict(_to_pure(state.clipping)),
        "scaling_vec": serialization.to_state_dict(_to_pure(state.scaling_vec)),
        "accountant": accountant_state or {},
        "loss": loss,
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def _load(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_g(path: str, state):
    """Returns (new_state, epoch)."""
    p = _load(path)
    return state.replace(
        g_params=serialization.from_state_dict(state.g_params, p["model_state_dict"]),
        g_batch_stats=serialization.from_state_dict(state.g_batch_stats,
                                                    p.get("batch_stats", {})),
        g_opt_state=serialization.from_state_dict(state.g_opt_state,
                                                  p["optimizer_state_dict"]),
    ), int(p["epoch"])


def load_d(path: str, state):
    """Returns (new_state, epoch, accountant_state_dict)."""
    p = _load(path)
    state = state.replace(
        d_params=serialization.from_state_dict(state.d_params, p["model_state_dict"]),
        d_opt_state=serialization.from_state_dict(state.d_opt_state,
                                                  p["optimizer_state_dict"]),
        clipping=serialization.from_state_dict(state.clipping, p.get("clipping")),
        scaling_vec=serialization.from_state_dict(state.scaling_vec,
                                                  p.get("scaling_vec")),
    )
    return state, int(p["epoch"]), p.get("accountant") or None


def save_pair(output_dir: str, epoch_label: int, epoch: int, state,
              accountant_state: Optional[dict] = None) -> None:
    saves = os.path.join(output_dir, "saves")
    os.makedirs(saves, exist_ok=True)
    save_d(os.path.join(saves, f"D-{epoch_label}"), epoch, state, accountant_state)
    save_g(os.path.join(saves, f"G-{epoch_label}"), epoch, state)
