"""DG0/DG1 carriers + L2 projections (ref KPP_NodeRV_plot.py:46-47,
130-150; Code/Utils/helpers.py:25-36)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conservation_fem_tpu.ops import dg, helpers
from conservation_fem_tpu.ops.mesh import rectangle_mesh, disk_mesh


@pytest.fixture(scope="module")
def mesh():
    return rectangle_mesh((-2, -2), (2, 2), nx=12).device_arrays(jnp.float64)


def test_dg1_projection_exact_on_cg(mesh):
    """The L2 projection is the identity on fields already in CG P1."""
    u = jnp.asarray(np.asarray(mesh.points) @ np.array([0.7, -1.3]) + 0.25)
    d = dg.dg1_from_cg(mesh, u)
    back = dg.project_to_cg(mesh, d)
    assert np.abs(np.asarray(back - u)).max() < 1e-11


def test_dg1_nodal_h_matches_dg0(mesh):
    """Cellwise-constant DG1 == DG0 carrier: the reference's DG1 h-field
    projection (KPP_NodeRV_plot.py:130-150) reproduces get_nodal_h
    (helpers.py:25-36) exactly."""
    h1 = dg.nodal_h_dg1(mesh)
    h0 = helpers.get_nodal_h(mesh)
    assert np.abs(np.asarray(h1 - h0)).max() < 1e-12
    # and it is a real projection, not the nodal average (differs on
    # irregular patches)
    avg = dg.dg1_average_to_cg(mesh, dg.cell_h_dg1(mesh))
    assert np.isfinite(np.asarray(avg)).all()


def test_projection_conserves_mass(mesh):
    """(proj(d), 1) == (d, 1): L2 projection preserves the integral."""
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.random((mesh.cells.shape[0], 3)))
    u = dg.project_to_cg(mesh, d)
    from conservation_fem_tpu.ops import assembly
    from conservation_fem_tpu.ops.spmv import ell_matvec
    Mell = assembly.assemble_mass(mesh)
    int_u = float(jnp.ones_like(u) @ ell_matvec(mesh, Mell, u))
    mloc = (np.eye(3) + 1.0) / 12.0
    int_d = float(jnp.sum(mesh.area[:, None] * (d @ jnp.asarray(mloc))))
    assert abs(int_u - int_d) < 1e-12 * max(1.0, abs(int_d))


def test_dg_interpolants(mesh):
    fn = lambda p: jnp.sin(p[..., 0]) * p[..., 1]
    d0 = dg.dg0_interpolate(mesh, fn)
    d1 = dg.dg1_interpolate(mesh, fn)
    assert d0.shape == (mesh.cells.shape[0],)
    assert d1.shape == (mesh.cells.shape[0], 3)
    # DG1 interpolant at vertices == CG interpolant gathered to cells
    u = fn(mesh.points)
    assert np.abs(np.asarray(d1 - dg.dg1_from_cg(mesh, u))).max() < 1e-14


def test_plot_dg_field(tmp_path):
    from conservation_fem_tpu.utils.plotting import plot_dg_field

    host = disk_mesh(1 / 4)
    m = host.device_arrays(jnp.float64)
    d1 = dg.dg1_interpolate(m, lambda p: jnp.sign(p[..., 0]))
    path = plot_dg_field(host, d1, "dg1", "dg1", str(tmp_path))
    d0 = dg.dg0_interpolate(m, lambda p: jnp.sign(p[..., 0]))
    path0 = plot_dg_field(host, d0, "dg0", "dg0", str(tmp_path))
    import os
    assert os.path.exists(path) and os.path.exists(path0)
