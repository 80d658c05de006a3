"""Mosaic lowering probe for a fused BLOCKED-backend kernel (TPU).

Questions this answers before building ops/pallas_blocked.py:
  1. window construction in-kernel: pltpu.roll over the block dim +
     three small shuffle dots (no jnp.pad / no lane concat) == XLA
     blocked.windows?
  2. batched jax.lax.dot_general (39-batch, bf16 one-hots) — does it
     lower, and what does a gather+scatter round trip cost from VMEM?
  3. the windowed assembled spmv einsum('bnw,bw->bn') f32 in-kernel.
Timing: fori_loop chains of K iterations, differencing two K values
(the per-call tunnel constant cancels).

Usage: python scripts/probe_mosaic_blocked.py   (TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def window_shuffles(plan):
    """Host-built (128, Wpad) shuffle mats: w[b] = X[b-1] P_prev +
    X[b] P_curr + X[b+1] P_next (the roll-based twin of blocked.windows)."""
    nb, B, W, Wpad = plan.nb, plan.B, plan.W, plan.Wpad
    P_prev = np.zeros((nb, Wpad), np.float32)
    j = np.arange(nb - B, nb)
    P_prev[j, j - (nb - B)] = 1.0
    P_curr = np.zeros((nb, Wpad), np.float32)
    j = np.arange(nb)
    P_curr[j, j + B] = 1.0
    P_next = np.zeros((nb, Wpad), np.float32)
    j = np.arange(B)
    # only window slots < W are real; W = nb + 2B so all B fit
    P_next[j, j + nb + B] = 1.0
    return P_prev, P_curr, P_next


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.ops import blocked

    p = kpp.build(kpp.KPPConfig(
        mesh_source=kpp.KPP_REFERENCE_H5, dtype="float32", backend="ell",
        ell_matvec_backend="blocked"))
    plan = p.plan
    nb, B, Wpad, blocks = plan.nb, plan.B, plan.Wpad, plan.blocks
    S3 = plan.Gcell.shape[1]
    print(f"blocks={blocks} nb={nb} B={B} Wpad={Wpad} S3={S3}")

    Pp, Pc, Pn = (jnp.asarray(m) for m in window_shuffles(plan))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(blocks * nb), jnp.float32)
    X2 = x.reshape(blocks, nb)
    # zero tail rows beyond n
    mask_flat = (np.arange(blocks * nb) < plan.n).astype(np.float32)
    X2 = X2 * jnp.asarray(mask_flat.reshape(blocks, nb))
    x = X2.reshape(-1)

    D = jnp.asarray(rng.standard_normal((blocks, nb, Wpad)), jnp.float32)

    cp = {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=110 * 2**20)}

    def win_kernel_body(X, Pp_, Pc_, Pn_):
        bidx = jax.lax.broadcasted_iota(jnp.int32, (blocks, nb), 0)
        Xp = jnp.where(bidx >= 1, pltpu.roll(X, 1, 0), 0.0)
        Xn = jnp.where(bidx < blocks - 1, pltpu.roll(X, blocks - 1, 0), 0.0)
        return (jax.lax.dot(Xp, Pp_) + jax.lax.dot(X, Pc_)
                + jax.lax.dot(Xn, Pn_))

    # --- probe 1: windows in-kernel ---
    def k_win(x_ref, pp_ref, pc_ref, pn_ref, o_ref):
        o_ref[:] = win_kernel_body(x_ref[:], pp_ref[:], pc_ref[:], pn_ref[:])

    w_pl = pl.pallas_call(
        k_win, out_shape=jax.ShapeDtypeStruct((blocks, Wpad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM), **cp)(X2, Pp, Pc, Pn)
    w_ref = blocked.windows(plan, x)
    err = float(jnp.abs(w_pl - w_ref).max())
    print(f"probe1 windows-by-shuffle: maxerr {err:.3e}")

    # --- probe 2: batched one-hot gather+scatter round trip ---
    def k_gs(x_ref, g_ref, s_ref, pp_ref, pc_ref, pn_ref, o_ref):
        X = x_ref[:]
        w = win_kernel_body(X, pp_ref[:], pc_ref[:], pn_ref[:])
        uc = jax.lax.dot_general(
            g_ref[:], w.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (blocks, S3)
        y = jax.lax.dot_general(
            s_ref[:], uc.astype(jnp.bfloat16),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (blocks, nb)
        o_ref[:] = y

    y_pl = pl.pallas_call(
        k_gs, out_shape=jax.ShapeDtypeStruct((blocks, nb), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM), **cp)(
            X2, plan.Gcell, plan.Sv, Pp, Pc, Pn)
    uc_ref = blocked.gather_cells(plan, x)
    y_ref = blocked.scatter_cell_vectors(plan, uc_ref)
    err = float(jnp.abs(y_pl.reshape(-1)[:plan.n] - y_ref).max())
    rel = err / float(jnp.abs(y_ref).max())
    print(f"probe2 batched one-hot gather+scatter: relerr {rel:.3e}")

    # --- probe 3: windowed spmv in-kernel ---
    def k_spmv(x_ref, d_ref, pp_ref, pc_ref, pn_ref, o_ref):
        w = win_kernel_body(x_ref[:], pp_ref[:], pc_ref[:], pn_ref[:])
        o_ref[:] = jax.lax.dot_general(
            d_ref[:], w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    sp_pl = pl.pallas_call(
        k_spmv, out_shape=jax.ShapeDtypeStruct((blocks, nb), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM), **cp)(X2, D, Pp, Pc, Pn)
    sp_ref = blocked.spmv(plan, D, x)
    err = float(jnp.abs(sp_pl.reshape(-1)[:plan.n] - sp_ref).max())
    rel = err / float(jnp.abs(sp_ref).max())
    print(f"probe3 windowed spmv: relerr {rel:.3e}")

    # --- timing: K-iteration chains ---
    def chain(kind, K):
        def k(x_ref, g_ref, s_ref, d_ref, pp_ref, pc_ref, pn_ref, o_ref):
            def body(_, X):
                w = win_kernel_body(X, pp_ref[:], pc_ref[:], pn_ref[:])
                if kind == "gs":
                    uc = jax.lax.dot_general(
                        g_ref[:], w.astype(jnp.bfloat16),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    y = jax.lax.dot_general(
                        s_ref[:], uc.astype(jnp.bfloat16),
                        (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                else:
                    y = jax.lax.dot_general(
                        d_ref[:], w, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                return y / (1.0 + jnp.abs(y).max())
            o_ref[:] = jax.lax.fori_loop(0, K, body, x_ref[:])

        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((blocks, nb), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM), **cp)
        g = jax.jit(lambda X: f(X, plan.Gcell, plan.Sv, D, Pp, Pc, Pn))
        r = g(X2)
        _ = float(jnp.sum(r))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = g(X2)
            _ = float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        return best

    for kind in ("gs", "spmv"):
        t1, t2 = chain(kind, 10), chain(kind, 110)
        per = (t2 - t1) / 100
        print(f"timing {kind}: {per*1e6:8.2f} us/iter "
              f"(K=10 {t1*1e3:.2f} ms, K=110 {t2*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
