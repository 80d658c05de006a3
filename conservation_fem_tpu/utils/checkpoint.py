"""Checkpoint / resume for time-stepping runs.

The reference has no true checkpointing (SURVEY.md section 5) — the closest
is its per-step XDMF series plus a demonstrated mesh re-read
(ref Code/KPP/KPP_conv.py:30-33). This module adds real resume support:
the solver carry (u_n, u_old, u_old_old), time and step index are saved
either as a plain .npz or via orbax (for sharded arrays).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class Checkpoint(NamedTuple):
    step: int
    t: float
    arrays: dict          # name -> np.ndarray


def save_checkpoint(path: str, step: int, t: float, **arrays):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __step=step, __t=t,
             **{k: np.asarray(v) for k, v in arrays.items()})
    return path


def load_checkpoint(path: str) -> Checkpoint:
    with np.load(path) as f:
        arrays = {k: f[k] for k in f.files if not k.startswith("__")}
        return Checkpoint(int(f["__step"]), float(f["__t"]), arrays)


def save_orbax(path: str, state):
    """Orbax checkpoint of an arbitrary pytree (sharded-array safe)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    return path


def load_orbax(path: str, like):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)


def orbax_metadata(path: str):
    """Pytree of array metadata (shape/dtype) for a stored checkpoint —
    lets a restorer build the `like` tree (with new-mesh shardings) without
    knowing the saving configuration."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.metadata(os.path.abspath(path))
