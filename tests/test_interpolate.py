"""Cross-mesh interpolation tests + the completed KPP fine-reference
comparison (ref KPP_conv.py:30-33 stub)."""

import numpy as np
import pytest

from conservation_fem_tpu.ops.mesh import disk_mesh, rectangle_mesh
from conservation_fem_tpu.utils.interpolate import (
    cross_mesh_l2,
    interpolate_p1,
    locate_cells,
)


def test_interpolation_exact_for_linear_fields():
    """P1 interpolation reproduces linear functions exactly across meshes."""
    fine = rectangle_mesh((0, 0), (1, 1), nx=17)
    coarse = rectangle_mesh((0, 0), (1, 1), nx=5)
    u_fine = 2 * fine.points[:, 0] - 3 * fine.points[:, 1] + 0.7
    vals = interpolate_p1(fine, u_fine, coarse.points)
    expect = 2 * coarse.points[:, 0] - 3 * coarse.points[:, 1] + 0.7
    np.testing.assert_allclose(vals, expect, atol=1e-12)


def test_locate_cells_barycentric():
    mesh = disk_mesh(1 / 4)
    rng = np.random.default_rng(0)
    r = 0.9 * np.sqrt(rng.uniform(size=50))
    th = rng.uniform(0, 2 * np.pi, size=50)
    pts = np.stack([r * np.cos(th), r * np.sin(th)], axis=1)
    cells, bary = locate_cells(mesh, pts)
    # reconstruction: bary-weighted vertex coords == query point
    rec = (mesh.points[mesh.cells[cells]] * bary[..., None]).sum(axis=1)
    np.testing.assert_allclose(rec, pts, atol=1e-9)


def test_kpp_fine_reference_comparison():
    """Coarse KPP runs converge toward a finer-run reference field —
    the study KPP_conv.py set out to do."""
    from conservation_fem_tpu.models import kpp

    fine_cfg = kpp.KPPConfig(mesh_size=16, T=0.1)
    p_fine = kpp.build(fine_cfg)
    u_fine = np.asarray(p_fine.solve().u)

    errs = []
    for ms in (4, 8):
        p = kpp.build(kpp.KPPConfig(mesh_size=ms, T=0.1))
        u = np.asarray(p.solve().u)
        errs.append(cross_mesh_l2(p_fine.host_mesh, u_fine, p.host_mesh, u))
    assert errs[1] < errs[0], errs
