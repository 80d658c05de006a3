"""Microbenchmark blocked-backend primitives on the reference gmsh mesh.

Times assemble_matrix / spmv / local_apply / gather amortized inside one
jitted scan (the ~30 ms tunnel constant cancels across iterations); every
iteration's input depends on the previous output so XLA cannot hoist the
op out of the loop. Guides the round-3 blocked-step optimization.

Usage: python scripts/probe_blocked_ops.py   (TPU)
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
    print(f"plan: n={plan.n} nb={plan.nb} B={plan.B} blocks={plan.blocks} "
          f"W={plan.W} Wpad={plan.Wpad} C={plan.C}", flush=True)
    # Rrow/Ccol are no longer built by make_blocked_plan (dead since the
    # factored assembly); rebuild them here for the historical GEMM rows
    from conservation_fem_tpu.ops.blocked import _plan_struct, build_onehot
    hm = p.host_mesh
    st = _plan_struct(hm.n_nodes, np.asarray(hm.cells, np.int64),
                      hm.patch_cols, hm.patch_mask, hm.boundary_mask,
                      plan.nb, build_rc=True)
    import dataclasses as _dc
    plan = _dc.replace(plan,
                       Rrow=build_onehot(st["Rrow"], jnp.bfloat16),
                       Ccol=build_onehot(st["Ccol"], jnp.bfloat16))
    tot = 0.0
    for f in ("Gcell", "Sv", "Rrow", "Ccol"):
        a = getattr(plan, f)
        mb = a.size * a.dtype.itemsize / 1e6
        tot += mb
        print(f"  {f}: {tuple(a.shape)} {a.dtype} {mb:.1f} MB", flush=True)
    print(f"  one-hot total: {tot:.1f} MB", flush=True)

    area_f = plan.area_b.reshape(-1)
    grads_f = plan.grads_b.reshape(-1, 3, 2)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(plan.n),
                     jnp.float32)
    eps = jnp.abs(x0) * 0.01
    L0 = assembly.local_eps_stiffness(
        area_f, grads_f, blocked.gather_cells(plan, eps).reshape(-1, 3)
    ).reshape(plan.blocks, plan.C, 3, 3)
    D0 = blocked.assemble_matrix(plan, L0)
    bf = jnp.bfloat16
    Rb, Cb = plan.Rrow.astype(bf), plan.Ccol.astype(bf)

    def timeit(label, fn, carry0, iters=100):
        @jax.jit
        def run(plan, carry):
            def body(c, _):
                return fn(plan, c), None
            c, _ = jax.lax.scan(body, carry, None, length=iters)
            return c

        s = 0.0
        for _ in range(2):
            s = float(jnp.sum(run(plan, carry0)))     # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(jnp.sum(run(plan, carry0)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:34s} {best/iters*1e6:9.1f} us/iter (sum {s:.1e})",
              flush=True)

    timeit("spmv (assembled D)",
           lambda plan, c: blocked.spmv(plan, D0, c) * 1e-2, x0)
    timeit("local_apply (one-hot mf)",
           lambda plan, c: blocked.local_apply(plan, L0, c) * 1e-2, x0)
    timeit("gather_cells",
           lambda plan, c: c * 0.5 + blocked.gather_cells(plan, c).sum()
           * 1e-12, x0)

    def asm(plan, D):
        L = L0 * (1.0 + D.ravel()[0] * 1e-20)
        return blocked.assemble_matrix(plan, L) * 1e-2

    timeit("assemble_matrix f32 GEMM", asm, D0, iters=30)

    def asm_bf16(plan, D):
        L = L0 * (1.0 + D.ravel()[0] * 1e-20)
        v = L.reshape(plan.blocks, 9 * plan.C)
        lhs = (Rb * v[:, :, None].astype(bf))
        out = jax.lax.dot_general(
            lhs, Cb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out * 1e-2

    timeit("assemble_matrix bf16 GEMM", asm_bf16, D0, iters=30)

    def locals_build(plan, c):
        L = assembly.local_eps_stiffness(
            area_f, grads_f, blocked.gather_cells(plan, c).reshape(-1, 3)
        ).reshape(plan.blocks, plan.C, 3, 3)
        return c * 0.5 + L.sum() * 1e-12

    timeit("eps locals (gather + quad)", locals_build, x0)

    # accuracy of the bf16 assembly vs f32
    Db = asm_bf16(plan, D0 * 0.0) * 1e2
    Df = blocked.assemble_matrix(plan, L0)
    rel = float(jnp.linalg.norm(Db - Df) / jnp.linalg.norm(Df))
    print(f"bf16-assembly rel error vs f32: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
