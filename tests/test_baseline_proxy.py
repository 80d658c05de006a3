"""Cross-stack oracle: the jitted matrix-free KPP step must match the
scipy sparse-direct implementation to ~1e-10 (two independent stacks)."""

import numpy as np

from conservation_fem_tpu.models import kpp
from conservation_fem_tpu.utils.baseline_proxy import make_kpp_proxy


def test_jax_step_matches_scipy_lu_step():
    p = kpp.build(mesh_size=4)
    proxy = make_kpp_proxy(p.host_mesh, dt=p.dt)
    u0 = np.asarray(p.u0)
    # advance two steps with each stack
    carry = (p.u0, p.u0, p.u0)
    import jax.numpy as jnp

    carry, _ = p.step(carry, jnp.asarray(p.dt))
    carry, _ = p.step(carry, jnp.asarray(2 * p.dt))
    u_jax = np.asarray(carry[0])

    u_sp = proxy.solve(u0, 2)
    np.testing.assert_allclose(u_jax, u_sp, atol=5e-9)


def test_nodal_h_matches():
    p = kpp.build(mesh_size=4)
    proxy = make_kpp_proxy(p.host_mesh, dt=p.dt)
    np.testing.assert_allclose(np.asarray(p.h_cg), proxy.h_cg, atol=1e-11)


def test_burgers_jax_matches_scipy_lu():
    """Cross-stack oracle for Burgers: jitted matrix-free step vs scipy
    sparse-direct with time-dependent exact bc."""
    import jax.numpy as jnp

    from conservation_fem_tpu.models import burgers
    from conservation_fem_tpu.utils.baseline_proxy import make_burgers_proxy

    p = burgers.build(burgers.BurgersConfig(mesh_size=12, backend="ell"))
    proxy = make_burgers_proxy(p.host_mesh, dt=p.dt)
    u0 = np.asarray(p.u0)
    carry = (p.u0, p.u0, p.u0)
    for i in range(2):
        carry, _ = p.step(carry, jnp.asarray((i + 1) * p.dt))
    u_sp = proxy.solve(u0, 2)
    np.testing.assert_allclose(np.asarray(carry[0]), u_sp, atol=5e-9)
