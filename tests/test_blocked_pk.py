"""Blocked-window Pk backend identity vs the gather/segment_sum path.

Primitives (ops/blocked_pk.py) against ops/assembly_pk.py on the same
RCM-permuted space, and the full P2 model (BlockedPkHyperbolicProblem)
against PkHyperbolicProblem over a whole SI Burgers run — identical to
summation-order roundoff (f64)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.models import burgers
from conservation_fem_tpu.ops import assembly_pk as apk
from conservation_fem_tpu.ops import blocked
from conservation_fem_tpu.ops import blocked_pk as bpk
from conservation_fem_tpu.ops.mesh import rectangle_mesh
from conservation_fem_tpu.ops.spaces import (build_space, permute_dofs,
                                             rcm_dof_permutation)
from conservation_fem_tpu.ops.spmv import ell_matvec


@pytest.fixture(scope="module", params=[2, 3])
def space_plan(request):
    mesh = rectangle_mesh((0, 0), (1, 1), nx=6)
    sp0 = build_space(mesh, request.param)
    sph = permute_dofs(sp0, rcm_dof_permutation(sp0))
    sp = sph.device_arrays(jnp.float64)
    plan = bpk.make_blocked_pk_plan(sph, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(sph.ndof))
    return sp, plan, x


def test_pk_mass_and_stiffness_windows(space_plan):
    sp, plan, x = space_plan
    Mb = blocked.assemble_matrix_components(
        plan, bpk.pk_mass_locals(plan, jnp.float64))
    d = jnp.abs(blocked.spmv(plan, Mb, x)
                - ell_matvec(sp, apk.assemble_mass(sp), x)).max()
    assert float(d) < 1e-12, d
    Kb = blocked.assemble_matrix_components(
        plan, bpk.pk_stiffness_locals(plan, jnp.float64))
    d = jnp.abs(blocked.spmv(plan, Kb, x)
                - ell_matvec(sp, apk.assemble_stiffness(sp), x)).max()
    assert float(d) < 1e-11, d


def test_pk_eps_and_jacobian_windows(space_plan):
    sp, plan, x = space_plan
    eps = jnp.abs(x) * 0.1
    Kb = blocked.assemble_matrix_components(plan, bpk.pk_eps_locals(plan, eps))
    d = jnp.abs(blocked.spmv(plan, Kb, x)
                - ell_matvec(sp, apk.assemble_eps_stiffness(sp, eps),
                             x)).max()
    assert float(d) < 1e-12, d
    fprime = lambda u: jnp.stack([u, 0.5 * u], axis=-1)
    Jb = blocked.assemble_matrix_components(
        plan, bpk.pk_flux_jacobian_locals(plan, x, lambda u: u,
                                          lambda u: 0.5 * u))
    d = jnp.abs(blocked.spmv(plan, Jb, x)
                - ell_matvec(sp, apk.assemble_flux_jacobian(sp, x, fprime),
                             x)).max()
    assert float(d) < 1e-12, d


def test_pk_conv_rhs(space_plan):
    sp, plan, x = space_plan
    rb = bpk.pk_conv_plus_locals_rhs(plan, x, lambda u: u, lambda u: 0.5 * u)
    rr = apk.convection_rhs_flux(
        sp, x, lambda u: jnp.stack([u, 0.5 * u], axis=-1))
    assert float(jnp.abs(rb - rr).max()) < 1e-12
    # fused locals action == separate assembled action
    eps = jnp.abs(x) * 0.1
    L = bpk.pk_eps_locals(plan, eps)
    rb2 = bpk.pk_conv_plus_locals_rhs(plan, x, lambda u: u,
                                      lambda u: 0.5 * u, L)
    Kb = blocked.assemble_matrix_components(plan, L)
    d = jnp.abs(rb2 - (rb + blocked.spmv(plan, Kb, x))).max()
    assert float(d) < 1e-12, d


@pytest.mark.parametrize("stab", ["si", "rv", "gfem"])
def test_blocked_pk_model_matches_gather_full_run(stab):
    common = dict(mesh_size=8, degree=2, stabilization=stab, T=0.05,
                  dtype="float64", krylov_rtol=1e-10,
                  newton_linear_rtol=1e-8)
    pg = burgers.build(burgers.BurgersConfig(**common))
    pb = burgers.build(burgers.BurgersConfig(
        **common, ell_matvec_backend="blocked"))
    ug = np.asarray(pg.solve().u)
    ub = np.asarray(pb.solve().u)
    inv = np.argsort(pb.dof_perm)
    d = np.abs(ub - ug[inv]).max()
    assert d < 1e-12, (stab, d)
