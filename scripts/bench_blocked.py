"""Time the blocked unstructured KPP step on the reference gmsh mesh (TPU).

Compares gather / blocked backends and validates the blocked
fixed-iteration f32 solution against an adaptive tight-tolerance run.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(p):
    import jax

    res = p.solve()
    jax.block_until_ready(res.u)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = p.solve()
        jax.block_until_ready(res.u)
        best = min(best, time.perf_counter() - t0)
    return best / p.num_steps, np.asarray(res.u)


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()

    from conservation_fem_tpu.models import kpp

    common = dict(mesh_source=kpp.KPP_REFERENCE_H5, dtype="float32",
                  backend="ell")

    t_g, u_g = run(kpp.build(kpp.KPPConfig(
        krylov_rtol=1e-5, newton_linear_rtol=1e-3, modified_newton=True,
        **common)))
    print(f"gather adaptive:   {t_g*1e3:8.2f} ms/step", flush=True)

    t_b, u_b = run(kpp.build(kpp.KPPConfig(
        krylov_rtol=1e-5, newton_linear_rtol=1e-3, modified_newton=True,
        ell_matvec_backend="blocked", **common)))
    print(f"blocked adaptive:  {t_b*1e3:8.2f} ms/step", flush=True)

    for (cgi, ni, li) in [(10, 4, 8), (12, 3, 10), (8, 3, 6), (12, 2, 12)]:
        t_f, u_f = run(kpp.build(kpp.KPPConfig(
            modified_newton=True, cg_iters=cgi, newton_iters=ni,
            newton_linear_iters=li, ell_matvec_backend="blocked", **common)))
        ok = np.isfinite(u_f).all() and 0.5 < u_f.min() and u_f.max() < 12.0
        print(f"blocked fixed cg={cgi} n={ni} l={li}: {t_f*1e3:8.2f} ms/step"
              f"  sane={ok} range=[{u_f.min():.3f},{u_f.max():.3f}]",
              flush=True)

    # accuracy: fixed f32 blocked vs adaptive tight f32 blocked (same mesh)
    t_a, u_a = run(kpp.build(kpp.KPPConfig(
        krylov_rtol=1e-6, newton_linear_rtol=1e-4,
        ell_matvec_backend="blocked", **common)))
    print(f"blocked adaptive tight: {t_a*1e3:8.2f} ms/step", flush=True)
    t_f, u_f = run(kpp.build(kpp.KPPConfig(
        modified_newton=True, cg_iters=12, newton_iters=3,
        newton_linear_iters=10, ell_matvec_backend="blocked", **common)))
    print(f"fixed-vs-adaptive Linf: {np.abs(u_f - u_a).max():.3e}"
          f"  (field range {u_a.min():.3f}..{u_a.max():.3f})")


if __name__ == "__main__":
    main()
