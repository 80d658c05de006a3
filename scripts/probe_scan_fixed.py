"""Isolate the ~270 us/iteration fixed cost seen in blocked-plan scans.

Hypotheses: (a) the 437 MB BlockedPlan threaded through jit as an
argument taxes every scan iteration; (b) the one-hot constants do; (c)
it is the scan carry itself.  Usage: python scripts/probe_scan_fixed.py
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
    from conservation_fem_tpu.ops import blocked  # noqa: F401

    p = kpp.build(kpp.KPPConfig(
        mesh_source=kpp.KPP_REFERENCE_H5, dtype="float32", backend="ell",
        ell_matvec_backend="blocked"))
    plan = p.plan
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(plan.n),
                     jnp.float32)

    def measure(runner, *args, iters=100):
        for _ in range(2):
            s = float(jnp.sum(runner(*args)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(jnp.sum(runner(*args)))
            best = min(best, time.perf_counter() - t0)
        return best / iters, s

    ITERS = 100

    @jax.jit
    def bare(c):
        def body(c, _):
            return c * 0.999999, None
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c

    t, _ = measure(bare, x0)
    print(f"bare scan (no plan arg):          {t*1e6:9.1f} us/iter",
          flush=True)

    @jax.jit
    def with_plan_arg(plan, c):
        def body(c, _):
            return c * 0.999999, None
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c + plan.area_b[0, 0] * 0

    t, _ = measure(with_plan_arg, plan, x0)
    print(f"plan as jit arg, unused in body:  {t*1e6:9.1f} us/iter",
          flush=True)

    @jax.jit
    def plan_in_body(plan, c):
        def body(c, _):
            return c * 0.999999 + plan.area_b[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c

    t, _ = measure(plan_in_body, plan, x0)
    print(f"plan arg, scalar read in body:    {t*1e6:9.1f} us/iter",
          flush=True)

    @jax.jit
    def onehot_in_body(plan, c):
        def body(c, _):
            w = blocked.windows(plan, c)
            uc = jnp.einsum("bsw,bw->bs", plan.Gcell, w)
            return c * 0.999999 + uc.sum() * 1e-30, None
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c

    t, _ = measure(onehot_in_body, plan, x0)
    print(f"plan arg, Gcell einsum in body:   {t*1e6:9.1f} us/iter",
          flush=True)

    Gc = plan.Gcell

    @jax.jit
    def onehot_closure(c):
        def body(c, _):
            w = blocked.windows(plan, c)
            uc = jnp.einsum("bsw,bw->bs", Gc, w)
            return c * 0.999999 + uc.sum() * 1e-30, None
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c

    t, _ = measure(onehot_closure, x0)
    print(f"closure consts, Gcell einsum:     {t*1e6:9.1f} us/iter",
          flush=True)


if __name__ == "__main__":
    main()
