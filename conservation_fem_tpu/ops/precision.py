"""Exact-f32 einsum for geometry/quadrature contractions.

FEM assembly contractions have tiny contraction dims (space dim d=2,
local basis a/b <= 10, quadrature q <= 12) — far below the MXU tile
size — but XLA still lowers them to MXU dot_generals whose DEFAULT
precision rounds f32 operands to bf16 per pass. That injects a
SYSTEMATIC ~4e-3 relative perturbation into the assembled operators,
not noise: measured round 4 on-chip, the 569-step RV-node advection
trajectory (bench_advection) landed L2rel 1.63e-2 from the f64 anchor
IDENTICALLY on the gather and blocked backends — both share the
per-step ``assemble_eps_stiffness`` einsums — vs 3.5e-3 on exact-f32
CPU, and IC-perturbation probes showed the trajectory is not chaotic,
so the gap was pure operator bias. ``Precision.HIGHEST`` keeps these
contractions exact f32 at negligible cost (they are VPU/bandwidth
bound either way at these shapes).

The blocked-window backend (ops/blocked.py and its sharded twins) is
deliberately NOT routed through this helper: its one-hot gather/scatter
contractions choose bf16 vs f32 per-plan (``plan_precision`` /
``precise`` — RESULTS.md "Blocked-backend precision modes").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def einsum_exact(*args, **kwargs):
    return jnp.einsum(*args, precision=jax.lax.Precision.HIGHEST, **kwargs)
