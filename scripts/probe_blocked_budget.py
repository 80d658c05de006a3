"""Blocked-step budget by config differencing (reference mesh, TPU).

Vary one knob at a time around the fixed-n=2 bench config and difference
the amortized per-step times: the delta isolates that knob's cost.

Usage: python scripts/probe_blocked_budget.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()
    from timeharness import measure_per_step

    from conservation_fem_tpu.models import kpp

    common = dict(mesh_source=kpp.KPP_REFERENCE_H5, dtype="float32",
                  backend="ell", ell_matvec_backend="blocked",
                  modified_newton=True)
    base = dict(cg_iters=10, newton_iters=2, newton_linear_iters=8)

    results = {}

    def bench(label, **kw):
        p = kpp.build(kpp.KPPConfig(**{**common, **base, **kw}))
        per_step, _ = measure_per_step(p)
        results[label] = per_step
        print(f"{label:44s} {per_step*1e6:8.1f} us/step", flush=True)
        return per_step

    t0 = bench("base (rv, cg10, n2, lin8, bicgstab)")
    t = bench("lin_iters 4", newton_linear_iters=4)
    print(f"  -> per-BiCGStab-iter (x2 newton): {(t0-t)/8*1e6:.1f} us",
          flush=True)
    t = bench("cg_iters 2", cg_iters=2)
    print(f"  -> per-CG-iter: {(t0-t)/8*1e6:.1f} us", flush=True)
    t = bench("gfem (no rv eps)", stabilization="gfem")
    print(f"  -> rv epsilon cost: {(t0-t)*1e6:.1f} us", flush=True)
    t = bench("newton n=1", newton_iters=1)
    print(f"  -> per-newton-iter (lin8 + resid): {(t0-t)*1e6:.1f} us",
          flush=True)
    bench("cheby inner (lin12)", inner_solver="cheby",
          newton_linear_iters=12, cg_iters=6)


if __name__ == "__main__":
    main()
