"""Blocked-window backend for linear advection vs the gather path.

Full-run identity (to summation-order roundoff, f64) for every variant
with a window form; rv_cell raises (order-dependent last-cell-wins
scatter, documented guard)."""

import numpy as np
import pytest

from conservation_fem_tpu.models import linear_advection as la
from conservation_fem_tpu.ops.mesh import rcm_permutation


@pytest.mark.parametrize(
    "stab", ["gfem", "rv_node", "rv_node_simple", "si", "rk4"])
def test_blocked_advection_matches_gather(stab):
    cfg = dict(mesh_size=8, T=0.05, stabilization=stab, dtype="float64")
    pg = la.build(la.AdvectionConfig(**cfg))
    pb = la.build(la.AdvectionConfig(**cfg, ell_matvec_backend="blocked"))
    ug = np.asarray(la.solve(pg).u)
    ub = np.asarray(la.solve(pb).u)
    inv = np.argsort(rcm_permutation(pg.host_mesh))
    d = np.abs(ub - ug[inv]).max()
    assert d < 1e-11, (stab, d)


def test_blocked_advection_rv_cell_guard():
    with pytest.raises(NotImplementedError):
        la.build(la.AdvectionConfig(stabilization="rv_cell",
                                    ell_matvec_backend="blocked"))
