"""Per-component timing of the unstructured KPP RV step on one chip.

Times each piece of HyperbolicProblem.step on the reference gmsh mesh
(ref Data/KPP_RV.h5, 4886 nodes) inside fori_loops (per-call dispatch over
the axon tunnel is ~20-30 ms, so naive timing is useless — CLAUDE.md).

Usage: python scripts/profile_unstructured.py [mesh.h5] [gather|banded]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=1):
    import jax

    out = fn(*args)            # compile + warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    ge._enable_compile_cache()

    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.ops import assembly
    from conservation_fem_tpu.ops.banded import (
        banded_matvec, ell_to_banded, make_banded_plan,
    )
    from conservation_fem_tpu.ops.krylov import cg, jacobi_preconditioner
    from conservation_fem_tpu.ops.mesh import (
        load_h5_mesh, rcm_permutation, reorder_mesh,
    )
    from conservation_fem_tpu.ops.spmv import ell_diag, ell_matvec
    from conservation_fem_tpu.ops import stabilization as stab

    path = sys.argv[1] if len(sys.argv) > 1 else kpp.KPP_REFERENCE_H5
    backend = sys.argv[2] if len(sys.argv) > 2 else "gather"

    hm = load_h5_mesh(path)
    hm = reorder_mesh(hm, rcm_permutation(hm))
    cfg = kpp.KPPConfig(
        mesh_source=path, dtype="float32", krylov_rtol=1e-5,
        newton_linear_rtol=1e-3, modified_newton=True,
        ell_matvec_backend=backend, record_metrics=True,
    )
    p = kpp.build(cfg, host_mesh=hm)
    m = p.mesh
    n = hm.n_nodes
    print(f"mesh: N={n} M={hm.n_cells} K={hm.max_patch} backend={backend}",
          file=sys.stderr)

    u0 = p.u0
    M = p.M
    R = 100  # inner fori_loop reps

    def loop(f):
        """Repeat f R times with data dependence, jitted."""
        @jax.jit
        def run(x):
            def body(i, x):
                y = f(x)
                return y / (1e-30 + jnp.max(jnp.abs(y)))  # keep finite
            return jax.lax.fori_loop(0, R, body, x)
        return run

    results = {}

    t, _ = timeit(loop(lambda x: ell_matvec(m, M, x)), u0)
    results["ell_matvec (gather)"] = t / R

    plan = make_banded_plan(hm)
    band = ell_to_banded(plan, M)
    print(f"bandwidth B={plan.bandwidth}", file=sys.stderr)
    t, _ = timeit(loop(lambda x: banded_matvec(band, x)), u0)
    results["banded matvec"] = t / R

    t, _ = timeit(loop(lambda x: ell_to_banded(plan, M * x[0])[0]), u0)
    results["ell_to_banded convert"] = t / R

    t, _ = timeit(loop(
        lambda x: assembly.convection_rhs_flux(m, x, p.flux_prime)), u0)
    results["convection_rhs_flux"] = t / R

    t, _ = timeit(loop(
        lambda x: assembly.assemble_flux_jacobian(m, x, p.flux_prime)[:, 0]),
        u0)
    results["assemble_flux_jacobian"] = t / R

    t, _ = timeit(loop(
        lambda x: assembly.assemble_eps_stiffness(m, x)[:, 0]), u0)
    results["assemble_eps_stiffness"] = t / R

    h = p.h_cg
    t, _ = timeit(loop(
        lambda x: stab.rv_epsilon_nonlinear(
            m, 0.5, 4.0, x, x, p.flux_prime_norm, x, h)), u0)
    results["rv_epsilon_nonlinear"] = t / R

    # mass CG at the bench tolerance, with iteration count
    mv, diag = p._linear_op(M)
    pre = jacobi_preconditioner(diag)

    @jax.jit
    def mass_cg(b):
        r = cg(mv, b, precond=pre, rtol=1e-5)
        return r.x, r.iters

    t, (x_, iters) = timeit(mass_cg, u0)
    results[f"mass CG rtol=1e-5 ({int(iters)} iters)"] = t

    # full residual projection
    t, _ = timeit(jax.jit(lambda u: p._residual_bdf2(u, u, u)), u0)
    results["residual_bdf2 (full)"] = t

    # full newton solve (one call; includes eps-stiffness + jacobian)
    eps = stab.rv_epsilon_nonlinear(m, 0.5, 4.0, u0, u0, p.flux_prime_norm,
                                    u0, h)
    g = p.bc_value(m.points, 0.0)

    @jax.jit
    def newton(u, eps):
        r = p._newton_cn(u, eps, g)
        return r.u, r.iters

    t, (_, nit) = timeit(newton, u0, eps)
    results[f"newton_cn (full, {int(nit)} iters)"] = t

    # full step
    @jax.jit
    def step(c):
        (uh, a, b), met = p.step(c, jnp.asarray(0.01, u0.dtype))
        return uh, met

    t, (_, met) = timeit(step, (u0, u0, u0))
    results["full step (single)"] = t

    # full step amortized inside scan (the honest number)
    @jax.jit
    def run100(u):
        ts = (jnp.arange(100, dtype=u.dtype) + 1) * 0.01
        (u, _, _), _ = jax.lax.scan(
            lambda c, t: (p.step(c, t)[0], None), (u, u, u), ts)
        return u

    t, _ = timeit(run100, u0)
    results["full step (scan/100)"] = t / 100

    print(f"\n== {jax.default_backend()} N={n} dtype=f32 ==")
    for k, v in results.items():
        print(f"{k:45s} {v*1e6:10.1f} us")


if __name__ == "__main__":
    main()
