"""Measure the fori_loop / normalization overhead floor on the chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    ge._enable_compile_cache()

    n = 4886
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    R = 100

    def bench(body, x, tag):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, R, body, x)

        out = run(x)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:50s} {best/R*1e6:10.1f} us")

    # floor: multiply by an i-dependent scalar (not foldable)
    bench(lambda i, x: x * (1.0 + 1e-9 * i), x, "mul only")
    bench(lambda i, x: (x * (1.0 + 1e-9 * i)) / (1e-30 + jnp.max(jnp.abs(x))),
          x, "mul + normalize (old harness body)")

    # blocked spmv without normalization
    B, nb = 103, 128
    blocks = (n + nb - 1) // nb
    npad = blocks * nb
    W = nb + 2 * B
    Wpad = ((W + 127) // 128) * 128
    D = jnp.asarray(rng.standard_normal((blocks, nb, Wpad)), jnp.float32)
    D = D * 1e-3

    def windows_of(x):
        xp = jnp.pad(x, (B, npad - n + B + (Wpad - W) + nb))
        chunks = [
            jax.lax.slice(xp, (o,), (o + npad,)).reshape(blocks, nb)
            for o in range(0, Wpad, nb)
        ]
        return jnp.concatenate(chunks, axis=1)[:, :Wpad]

    def spmv_body(i, x):
        w = windows_of(x * (1.0 + 1e-9 * i))
        return jnp.einsum("bnw,bw->bn", D, w).reshape(-1)[:n]

    bench(spmv_body, x, "blocked spmv (no normalize)")

    # gather ELL spmv without normalization, for comparison
    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.ops.mesh import (
        load_h5_mesh, rcm_permutation, reorder_mesh,
    )
    from conservation_fem_tpu.ops import assembly
    from conservation_fem_tpu.ops.spmv import ell_matvec

    hm = load_h5_mesh(kpp.KPP_REFERENCE_H5)
    hm = reorder_mesh(hm, rcm_permutation(hm))
    m = hm.device_arrays(jnp.float32)
    M = assembly.assemble_mass(m) * 100.0

    bench(lambda i, x: ell_matvec(m, M, x * (1.0 + 1e-9 * i)), x,
          "gather ELL spmv (no normalize)")

    # masked window max, no normalize
    A = jnp.asarray(rng.integers(0, 40, (blocks, nb, Wpad)) == 0)

    def wmax_body(i, x):
        w = windows_of(x * (1.0 + 1e-9 * i))
        return jnp.where(A, w[:, None, :], -jnp.inf).max(axis=2).reshape(-1)[:n]

    bench(wmax_body, x, "masked window max (no normalize)")

    # one-hot vector scatter, no normalize
    S = 768
    Sv = jnp.asarray(
        (rng.integers(0, 40, (blocks, S, nb)) == 0).astype(np.float32))

    def vscat_body(i, x):
        vals = jnp.broadcast_to(x[:S] * (1.0 + 1e-9 * i), (blocks, S))
        return jnp.einsum("bsn,bs->bn", Sv, vals).reshape(-1)[:n]

    bench(vscat_body, x, "one-hot vector scatter (no normalize)")

    # chained spmv x8 in one body (amortize any per-iteration overhead)
    def spmv8_body(i, x):
        y = x * (1.0 + 1e-9 * i)
        for _ in range(8):
            w = windows_of(y)
            y = jnp.einsum("bnw,bw->bn", D, w).reshape(-1)[:n]
        return y

    bench(spmv8_body, x, "blocked spmv x8 chained (per body /8)")


if __name__ == "__main__":
    main()
