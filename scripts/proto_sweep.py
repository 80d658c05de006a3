"""Isolate the ~260us cost: k-chained spmvs in fori body, variants."""

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

    B, nb = 103, 128
    blocks = (n + nb - 1) // nb
    npad = blocks * nb
    W = nb + 2 * B
    Wpad = ((W + 127) // 128) * 128
    D1 = jnp.asarray(rng.standard_normal((blocks, nb, Wpad)), jnp.float32)
    D2 = jnp.asarray(rng.standard_normal((blocks, nb, Wpad)), jnp.float32)

    def windows_of(x):
        xp = jnp.pad(x, (B, npad - n + B + (Wpad - W) + nb))
        chunks = [
            jax.lax.slice(xp, (o,), (o + npad,)).reshape(blocks, nb)
            for o in range(0, Wpad, nb)
        ]
        return jnp.concatenate(chunks, axis=1)[:, :Wpad]

    def spmv(D, x):
        w = windows_of(x)
        return jnp.einsum("bnw,bw->bn", D, w).reshape(-1)[:n]

    R = 100

    def bench_fori(body, tag):
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
        print(f"{tag:55s} {best/R*1e6:10.1f} us/body")

    for k in (1, 2, 4, 8):
        def body(i, x, k=k):
            y = x * (1.0 + 1e-9 * i)
            for j in range(k):
                y = spmv(D1 if j % 2 == 0 else D2, y)
            return y
        bench_fori(body, f"chained x{k} spmv (alternating D)")

    # windows_of cost alone: build windows, cheap reduce back
    def body_w(i, x):
        y = x * (1.0 + 1e-9 * i)
        w = windows_of(y)
        return w[:, :nb].reshape(-1)[:n]
    bench_fori(body_w, "windows_of only")

    # einsum alone on a fixed precomputed window (no windows_of)
    w0 = windows_of(x)

    def body_e(i, x):
        w = w0 * (1.0 + 1e-9 * i) * x[0]
        return jnp.einsum("bnw,bw->bn", D1, w).reshape(-1)[:n]
    bench_fori(body_e, "einsum only (fixed window)")

    # vmap matmul formulation
    mm = jax.vmap(lambda Db, wb: Db @ wb)

    def body_m(i, x):
        y = x * (1.0 + 1e-9 * i)
        w = windows_of(y)
        return mm(D1, w).reshape(-1)[:n]
    bench_fori(body_m, "vmap matmul formulation")

    # GEMM formulation: one (npad, Wpad) x ... no; try reshaping batch into
    # lanes: einsum with multiple vectors (simulate 8 RHS)
    X8 = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)

    @jax.jit
    def run8(X):
        def body(i, X):
            Y = X * (1.0 + 1e-9 * i)
            W8 = jax.vmap(windows_of)(Y)            # (8, blocks, Wpad)
            out = jnp.einsum("bnw,rbw->rbn", D1, W8)
            return out.reshape(8, -1)[:, :n]
        return jax.lax.fori_loop(0, R, body, X)

    out = run8(X8)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run8(X8)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{'8-RHS batched spmv':55s} {best/R*1e6:10.1f} us/body")

    # f64 variant (accuracy path interest)
    D64 = D1.astype(jnp.float64) if jax.config.jax_enable_x64 else None

    # bf16 D with f32 accum
    D16 = D1.astype(jnp.bfloat16)

    def body_bf(i, x):
        y = x * (1.0 + 1e-9 * i)
        w = windows_of(y)
        return jnp.einsum("bnw,bw->bn", D16, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32
                          ).reshape(-1)[:n]
    bench_fori(body_bf, "bf16 einsum spmv")


if __name__ == "__main__":
    main()
