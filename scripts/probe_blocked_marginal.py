"""Marginal cost of blocked primitives: difference k-ops-per-iteration
runs, so any per-iteration fixed cost cancels (same trick as the
per-call tunnel constant).  Usage: python scripts/probe_blocked_marginal.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.ops import assembly, blocked

    p = kpp.build(kpp.KPPConfig(
        mesh_source=kpp.KPP_REFERENCE_H5, dtype="float32", backend="ell",
        ell_matvec_backend="blocked"))
    plan = p.plan
    area_f = plan.area_b.reshape(-1)
    grads_f = plan.grads_b.reshape(-1, 3, 2)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(plan.n),
                     jnp.float32)
    eps = jnp.abs(x0) * 0.01
    L0 = assembly.local_eps_stiffness(
        area_f, grads_f, blocked.gather_cells(plan, eps).reshape(-1, 3)
    ).reshape(plan.blocks, plan.C, 3, 3)
    D0 = blocked.assemble_matrix(plan, L0)

    def measure(fn, carry0, k, iters=100):
        @jax.jit
        def run(plan, carry):
            def body(c, _):
                for _ in range(k):
                    c = fn(plan, c)
                return c, None
            c, _ = jax.lax.scan(body, carry, None, length=iters)
            return c

        for _ in range(2):
            s = float(jnp.sum(run(plan, carry0)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(jnp.sum(run(plan, carry0)))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    def marginal(label, fn, carry0, k1=1, k2=5, iters=100):
        t1 = measure(fn, carry0, k1, iters)
        t2 = measure(fn, carry0, k2, iters)
        per = (t2 - t1) / (k2 - k1)
        print(f"{label:34s} {per*1e6:9.1f} us marginal "
              f"(k{k1}={t1*1e6:.0f}us k{k2}={t2*1e6:.0f}us per iter)",
              flush=True)

    marginal("spmv (assembled D)",
             lambda plan, c: blocked.spmv(plan, D0, c) * 1e-2, x0)
    marginal("local_apply (one-hot mf)",
             lambda plan, c: blocked.local_apply(plan, L0, c) * 1e-2, x0)

    def asm(plan, D):
        L = L0 * (1.0 + D.ravel()[0] * 1e-20)
        return blocked.assemble_matrix(plan, L) * 1e-2

    marginal("assemble_matrix f32 GEMM", asm, D0, k1=1, k2=3, iters=30)

    def windows_only(plan, c):
        w = blocked.windows(plan, c)
        return c * 0.5 + w.sum() * 1e-12

    marginal("windows (slice relayout)", windows_only, x0)


if __name__ == "__main__":
    main()
