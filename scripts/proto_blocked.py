"""Prototype timings for the blocked-window unstructured backend.

Validates on the real chip that (after RCM) one-hot matmuls + shifted
windows beat XLA gathers/scatters for every sparse op in the FEM step.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_loop(f, x, R=100):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(i, x):
            y = f(x)
            return y / (1e-30 + jnp.max(jnp.abs(y)))
        return jax.lax.fori_loop(0, R, body, x)

    out = run(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / R


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    ge._enable_compile_cache()

    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.ops.mesh import (
        load_h5_mesh, rcm_permutation, reorder_mesh,
    )

    hm = load_h5_mesh(kpp.KPP_REFERENCE_H5)
    hm = reorder_mesh(hm, rcm_permutation(hm))
    n = hm.n_nodes
    cols = hm.patch_cols
    mask = hm.patch_mask
    offs = cols - np.arange(n)[:, None]
    B = int(np.abs(offs[mask]).max())
    nb = 128
    blocks = (n + nb - 1) // nb
    npad = blocks * nb
    W = nb + 2 * B
    Wpad = ((W + 127) // 128) * 128
    print(f"N={n} B={B} blocks={blocks} W={W}->{Wpad}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    res = {}

    # 1. blocked-banded SpMV: D (blocks, nb, Wpad), windows by static slices
    D = jnp.asarray(rng.standard_normal((blocks, nb, Wpad)), jnp.float32)

    def windows_of(x):
        xp = jnp.pad(x, (B, npad - n + B + (Wpad - W) + nb))
        chunks = [
            jax.lax.slice(xp, (o,), (o + npad,)).reshape(blocks, nb)
            for o in range(0, Wpad, nb)
        ]
        return jnp.concatenate(chunks, axis=1)[:, :Wpad]

    def blocked_spmv(x):
        w = windows_of(x)
        y = jnp.einsum("bnw,bw->bn", D, w)
        return y.reshape(-1)[:n]

    res["blocked spmv (einsum bnw,bw)"] = timeit_loop(blocked_spmv, x)

    # 1b. same but via matmul with lhs (blocks*nb, Wpad)? needs block-diag - skip
    # 1c. dense matvec for scale
    Dense = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    res["dense matvec 4886^2"] = timeit_loop(lambda x: Dense @ x, x)

    # 2. one-hot cell gather: Gu (blocks, S, Wpad) @ windows -> (blocks, S)
    S = 768  # ~3*C_max
    Gu = jnp.asarray(
        (rng.integers(0, 50, (blocks, S, Wpad)) == 0).astype(np.float32))

    def onehot_gather(x):
        w = windows_of(x)
        return jnp.einsum("bsw,bw->bs", Gu, w).reshape(-1)[:n]

    res["one-hot cell gather (46MB f32)"] = timeit_loop(onehot_gather, x)

    Gu16 = Gu.astype(jnp.bfloat16)

    def onehot_gather16(x):
        w = windows_of(x)
        return jnp.einsum("bsw,bw->bs", Gu16, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).reshape(-1)[:n]

    res["one-hot cell gather (bf16)"] = timeit_loop(onehot_gather16, x)

    # 3. matrix scatter: einsum('bsr,bsw->brw') R(b,S9,nb) x Cl(b,S9,Wpad)
    S9 = 2304
    R9 = jnp.asarray(
        (rng.integers(0, 80, (blocks, S9, nb)) == 0).astype(np.float32))
    Cl9 = jnp.asarray(
        (rng.integers(0, 200, (blocks, S9, Wpad)) == 0).astype(np.float32))

    def onehot_scatter_mat(x):
        vals = jnp.broadcast_to(x[:S9], (blocks, S9))
        out = jnp.einsum("bsr,bsw->brw", R9 * vals[:, :, None], Cl9)
        return out[:, :, 0].reshape(-1)[:n]

    res["one-hot matrix scatter f32"] = timeit_loop(onehot_scatter_mat, x)

    R16, C16 = R9.astype(jnp.bfloat16), Cl9.astype(jnp.bfloat16)

    def onehot_scatter_mat16(x):
        vals = jnp.broadcast_to(x[:S9], (blocks, S9)).astype(jnp.bfloat16)
        out = jnp.einsum("bsr,bsw->brw", R16 * vals[:, :, None], C16,
                         preferred_element_type=jnp.float32)
        return out[:, :, 0].reshape(-1)[:n]

    res["one-hot matrix scatter bf16"] = timeit_loop(onehot_scatter_mat16, x)

    # 4. vector scatter: einsum('bsn,bs->bn')
    Sv = jnp.asarray(
        (rng.integers(0, 40, (blocks, S, nb)) == 0).astype(np.float32))

    def onehot_scatter_vec(x):
        vals = jnp.broadcast_to(x[:S], (blocks, S))
        return jnp.einsum("bsn,bs->bn", Sv, vals).reshape(-1)[:n]

    res["one-hot vector scatter f32"] = timeit_loop(onehot_scatter_vec, x)

    # 5. masked window max (patch reductions): A (blocks, nb, Wpad) bool
    A = jnp.asarray(rng.integers(0, 40, (blocks, nb, Wpad)) == 0)

    def window_max(x):
        w = windows_of(x)
        v = jnp.where(A, w[:, None, :], -jnp.inf)
        return v.max(axis=2).reshape(-1)[:n]

    res["masked window max (bool mask)"] = timeit_loop(window_max, x)

    # 6. segment_sum variants on the real mesh scatter
    from conservation_fem_tpu.ops import assembly
    m = hm.device_arrays(jnp.float32)
    vals9 = jnp.asarray(rng.standard_normal(9 * hm.n_cells), jnp.float32)
    K = hm.max_patch

    def seg_sorted(x):
        flat = vals9 * x[0]
        flat = flat[m.mat_perm]
        return jax.ops.segment_sum(flat, m.mat_segs, num_segments=n * K,
                                   indices_are_sorted=True)[:n]

    res["segment_sum sorted (with perm gather)"] = timeit_loop(seg_sorted, x)

    targets = jnp.asarray(
        (np.repeat(np.asarray(hm.cells), 3, axis=1).reshape(-1, 3, 3)
         * K + np.asarray(hm.cell_slots)).reshape(-1), jnp.int32)

    def seg_unsorted(x):
        flat = vals9 * x[0]
        return jax.ops.segment_sum(flat, targets, num_segments=n * K)[:n]

    res["segment_sum unsorted (no perm)"] = timeit_loop(seg_unsorted, x)

    # 7. raw pieces of current assembly
    def ucell_gather(x):
        return x[m.cells].reshape(-1)[:n]

    res["u[cells] gather (M,3)"] = timeit_loop(ucell_gather, x)

    def perm_gather(x):
        return (vals9 * x[0])[m.mat_perm][:n]

    res["mat_perm gather (9M,)"] = timeit_loop(perm_gather, x)

    print(f"\n== {jax.default_backend()} ==")
    for k, v in res.items():
        print(f"{k:45s} {v*1e6:10.1f} us")


if __name__ == "__main__":
    main()
