"""Pallas stencil kernels vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.ops import pallas_stencil as pk
from conservation_fem_tpu.ops import structured as st
from conservation_fem_tpu.ops.krylov import cg, jacobi_preconditioner
from conservation_fem_tpu.ops.mesh import rectangle_mesh


@pytest.fixture(scope="module")
def setup():
    host = rectangle_mesh((-2, -2), (2, 2), nx=12)
    sd = st.build_structured(host, 12, 12, jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(13, 13)))
    return sd, x


def test_pallas_matvec_matches(setup):
    sd, x = setup
    y_ref = st.matvec(sd, sd.M_coef, x)
    y_pk = pk.stencil_matvec(sd.M_coef, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref), atol=1e-14)


def test_pallas_cg_matches(setup):
    sd, x = setup
    b = jnp.where(sd.bc2, 0.0, x)
    x_pk = pk.cg_solve(sd.M_coef, b, sd.bc2, sd.diagM2, rtol=1e-12,
                       interpret=True)
    op = lambda v: jnp.where(
        sd.bc2, v, st.matvec(sd, sd.M_coef, jnp.where(sd.bc2, 0.0, v))
    )
    pre = jacobi_preconditioner(jnp.where(sd.bc2, 1.0, sd.diagM2))
    x_ref = cg(op, b, precond=pre, rtol=1e-12).x
    np.testing.assert_allclose(np.asarray(x_pk), np.asarray(x_ref), atol=1e-10)
    # it actually solves the system
    r = b - op(x_pk)
    assert float(jnp.abs(jnp.where(sd.bc2, 0.0, r)).max()) < 1e-11
