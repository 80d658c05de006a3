"""Runtime failure detection: blow-up and NaN guards, CFL clamp.

Parity targets (SURVEY.md section 5):
  * the C++ divergence guard ``if (linf > 1e3) error(...)``
    (ref Burger_CPP/main.cpp:463-464) — here a jit-safe flag carried
    through lax.scan plus a host-side raise;
  * ``assert converged`` after Newton solves (ref KPP_NodeRV.py:163) —
    NewtonResult.converged is already surfaced in model metrics;
  * the final-step CFL clamp (ref GFEM_pol.py:199-200).
"""

from __future__ import annotations

import jax.numpy as jnp


class BlowupError(RuntimeError):
    pass


def blown_up(u, linf_max=1e3):
    """jit-safe blow-up predicate (ref Burger_CPP/main.cpp:463-464)."""
    linf = jnp.abs(u).max()
    return (~jnp.isfinite(linf)) | (linf > linf_max)


def check_state(u, linf_max=1e3, what="solution"):
    """Host-side guard: raise if the field has blown up or gone NaN."""
    import numpy as np

    arr = np.asarray(u)
    if not np.isfinite(arr).all():
        raise BlowupError(f"{what} contains NaN/Inf")
    linf = np.abs(arr).max()
    if linf > linf_max:
        raise BlowupError(f"{what} blew up: Linf = {linf:.3e} > {linf_max:g}")
    return float(linf)


def clamp_final_dt(t, dt, T):
    """dt' = min(dt, T - t): end exactly at T (ref GFEM_pol.py:199-200)."""
    return jnp.minimum(dt, T - t)
