"""Accuracy of the blocked f32 configs vs an f64 anchor (reference mesh).

Stage 1 (CPU, f64): adaptive tight-tolerance KPP on the reference gmsh
mesh -> /tmp/blocked_f64_anchor.npy
Stage 2 (TPU, f32): adaptive + fixed n=3 + fixed n=2 blocked runs,
L2rel/Linf vs the anchor.

Usage:
  python scripts/probe_blocked_accuracy.py anchor   (CPU f64)
  python scripts/probe_blocked_accuracy.py f32      (TPU f32 variants)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANCHOR = "/tmp/blocked_f64_anchor.npy"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "anchor"
    import jax
    if mode == "anchor":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from conservation_fem_tpu.models import kpp

    common = dict(mesh_source=kpp.KPP_REFERENCE_H5, backend="ell",
                  ell_matvec_backend="blocked")
    if mode == "anchor":
        p = kpp.build(kpp.KPPConfig(
            dtype="float64", krylov_rtol=1e-10, newton_linear_rtol=1e-8,
            **common))
        u = np.asarray(p.solve().u)
        np.save(ANCHOR, u)
        print(f"anchor saved: range {u.min():.6f}..{u.max():.6f}")
        return

    import __graft_entry__ as ge
    ge._enable_compile_cache()
    ref = np.load(ANCHOR)
    nrm = np.linalg.norm(ref)

    def run(label, **kw):
        p = kpp.build(kpp.KPPConfig(dtype="float32", **{**common, **kw}))
        u = np.asarray(p.solve().u)
        l2 = np.linalg.norm(u - ref) / nrm
        linf = np.abs(u - ref).max()
        print(f"{label:32s} L2rel={l2:.3e}  Linf={linf:.3e}", flush=True)

    fixed = dict(modified_newton=True, cg_iters=10,
                 newton_linear_iters=8)
    run("adaptive f32 (1e-5)",
        krylov_rtol=1e-5, newton_linear_rtol=1e-3, modified_newton=True,
        blocked_matrix_free=False)
    run("fixed n=3 f32", newton_iters=3, blocked_matrix_free=False, **fixed)
    run("fixed n=2 f32", newton_iters=2, blocked_matrix_free=False, **fixed)
    run("fixed n=2 cheby trim f32", newton_iters=2,
        blocked_matrix_free=False, modified_newton=True, cg_iters=6,
        newton_linear_iters=12, inner_solver="cheby",
        newton_final_residual=False)


if __name__ == "__main__":
    main()
