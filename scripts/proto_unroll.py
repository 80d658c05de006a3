"""Confirm the while-loop iteration overhead theory: unrolled vs fori/while."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, x, tag, per=1):
    import jax

    out = fn(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:55s} {best/per*1e6:10.1f} us")
    return out


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    ge._enable_compile_cache()

    n = 4886
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    B, nb = 103, 128
    blocks = (n + nb - 1) // nb
    npad = blocks * nb
    W = nb + 2 * B
    Wpad = ((W + 127) // 128) * 128
    D = jnp.asarray(rng.standard_normal((blocks, nb, Wpad)), jnp.float32) * 1e-2

    def windows_of(x):
        xp = jnp.pad(x, (B, npad - n + B + (Wpad - W) + nb))
        chunks = [
            jax.lax.slice(xp, (o,), (o + npad,)).reshape(blocks, nb)
            for o in range(0, Wpad, nb)
        ]
        return jnp.concatenate(chunks, axis=1)[:, :Wpad]

    def spmv(x):
        w = windows_of(x)
        return jnp.einsum("bnw,bw->bn", D, w).reshape(-1)[:n]

    R = 100

    @jax.jit
    def unrolled(x):
        for i in range(R):
            x = spmv(x) * (1.0 + 1e-9 * i)
        return x

    @jax.jit
    def forid(x):
        return jax.lax.fori_loop(
            0, R, lambda i, x: spmv(x) * (1.0 + 1e-9 * i), x)

    # note: dispatch ~20-30ms per call dominates single calls; report raw
    bench(unrolled, x, f"unrolled x{R} spmv (per spmv, incl ~25ms dispatch)", per=R)
    bench(forid, x, f"fori x{R} spmv (per spmv, incl dispatch)", per=R)

    # unrolled CG (10 iterations, with dot products) vs while-loop CG
    Msym = jnp.einsum("bnw,bmw->bnm", D, D)  # not actually used; keep simple

    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.ops.mesh import (
        load_h5_mesh, rcm_permutation, reorder_mesh,
    )
    from conservation_fem_tpu.ops import assembly
    from conservation_fem_tpu.ops.krylov import cg, jacobi_preconditioner
    from conservation_fem_tpu.ops.spmv import ell_diag, ell_matvec

    hm = load_h5_mesh(kpp.KPP_REFERENCE_H5)
    hm = reorder_mesh(hm, rcm_permutation(hm))
    m = hm.device_arrays(jnp.float32)
    Mell = assembly.assemble_mass(m)
    mv = lambda v: ell_matvec(m, Mell, v)
    pre = jacobi_preconditioner(ell_diag(m, Mell))

    def cg_unrolled(mv, b, pre, iters):
        xk = jnp.zeros_like(b)
        r = b
        z = pre(r)
        p = z
        rz = jnp.vdot(r, z)
        for _ in range(iters):
            Ap = mv(p)
            alpha = rz / jnp.vdot(p, Ap)
            xk = xk + alpha * p
            r = r - alpha * Ap
            z = pre(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            rz = rz_new
        return xk

    @jax.jit
    def solve_unrolled(b):
        return cg_unrolled(mv, b, pre, 12)

    @jax.jit
    def solve_while(b):
        return cg(mv, b, precond=pre, rtol=1e-5).x

    # amortize dispatch: run each 20x chained inside one jit
    @jax.jit
    def solve_unrolled_20(b):
        for _ in range(20):
            b = cg_unrolled(mv, b, pre, 12) * 1e-1
        return b

    @jax.jit
    def solve_while_20(b):
        for _ in range(20):
            b = cg(mv, b, precond=pre, rtol=1e-5).x * 1e-1
        return b

    xu = bench(solve_unrolled_20, x, "mass CG unrolled 12 iters (per solve)", per=20)
    xw = bench(solve_while_20, x, "mass CG while rtol=1e-5 (per solve)", per=20)

    # accuracy check of 12 fixed iterations
    r1 = solve_unrolled(x)
    r2 = solve_while(x)
    err = float(jnp.max(jnp.abs(r1 - r2)) / jnp.max(jnp.abs(r2)))
    print(f"unrolled-12 vs while-1e-5 rel diff: {err:.2e}")


if __name__ == "__main__":
    main()
