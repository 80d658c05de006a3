"""Distributed ELL operators over a node partition with sparse halo
exchange — the unstructured-mesh scaling path (disk / imported gmsh
meshes), complementing the structured-row decomposition in
parallel/structured_sharded.py.

All functions run inside shard_map over a 1D device axis. The two ghost
primitives (cf. DOLFINx, ref linear_advection.py:165,170):

  * halo_gather  == scatter_forward: each device publishes its compact
    shared-node block, one all_gather moves every block to every device,
    and a precomputed flat index picks out this device's halo values.
  * (reverse accumulation is not needed for SpMV with row ownership: each
    device computes exactly its own rows.)

Distributed CG solves use psum dot products.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from conservation_fem_tpu.parallel.partition import Partition, build_partition
from conservation_fem_tpu.ops.krylov import cg, jacobi_preconditioner


class DistributedELL:
    """Row-partitioned ELL operator with halo exchange.

    Usage: build once from a Partition; `spmv(A_rows, x_rows)` and
    `solve_cg(...)` run under shard_map with x sharded by rows.
    """

    def __init__(self, part: Partition, device_mesh: DeviceMesh, axis="i",
                 dtype=jnp.float64):
        self.part = part
        self.dmesh = device_mesh
        self.axis = axis
        self.dtype = dtype
        shard = NamedSharding(device_mesh, P(axis, None))
        sh3 = NamedSharding(device_mesh, P(axis, None, None))
        self.local_cols = jax.device_put(
            jnp.asarray(part.local_cols, jnp.int32), sh3)
        self.local_mask = jax.device_put(jnp.asarray(part.local_mask), sh3)
        self.shared_idx = jax.device_put(
            jnp.asarray(part.shared_idx, jnp.int32), shard)
        self.halo_src = jax.device_put(
            jnp.asarray(part.halo_src, jnp.int32), shard)
        self.row_valid = jax.device_put(
            jnp.asarray(part.global_rows >= 0), shard)
        self.shard = shard

    # ---- device-local pieces (call inside shard_map; leading axis 1) -------

    def _halo_gather(self, x_own, shared_idx, halo_src):
        """x_own (n_own,), publish shared block, all_gather, pick halo."""
        published = x_own[shared_idx]                    # (S,)
        table = jax.lax.all_gather(published, self.axis).reshape(-1)
        return table[halo_src]                           # (H,)

    def _spmv_local(self, A, cols, mask, x_own, shared_idx, halo_src):
        halo = self._halo_gather(x_own, shared_idx, halo_src)
        x_ext = jnp.concatenate([x_own, halo])
        g = x_ext[cols]                                  # (n_own, K)
        return jnp.where(mask, A * g, 0.0).sum(axis=1)

    # ---- public: sharded SpMV and CG ---------------------------------------

    def sharded_spmv(self, A_rows, x_rows):
        """A_rows (n_dev*n_own, K) row-sharded ELL values; x row-sharded."""

        @partial(
            shard_map, mesh=self.dmesh,
            in_specs=(P(self.axis, None), P(self.axis, None, None),
                      P(self.axis, None, None), P(self.axis),
                      P(self.axis, None), P(self.axis, None)),
            out_specs=P(self.axis),
        )
        def run(A, cols, mask, x, sidx, hsrc):
            return self._spmv_local(A, cols[0], mask[0], x, sidx[0], hsrc[0])

        return run(A_rows, self.local_cols, self.local_mask, x_rows,
                   self.shared_idx, self.halo_src)

    def solve_cg(self, A_rows, b_rows, bc_rows, diag_rows, rtol=1e-12,
                 maxiter=1000):
        """Distributed constrained CG: rows/cols pinned at bc, psum dots."""

        @partial(
            shard_map, mesh=self.dmesh,
            in_specs=(P(self.axis, None), P(self.axis), P(self.axis),
                      P(self.axis), P(self.axis, None, None),
                      P(self.axis, None, None),
                      P(self.axis, None), P(self.axis, None),
                      P(self.axis, None)),
            out_specs=P(self.axis),
        )
        def run(A, b, bc, dg, cols, mask, sidx, hsrc, valid):
            cols_, mask_ = cols[0], mask[0]
            sidx_, hsrc_ = sidx[0], hsrc[0]
            pin = bc | ~valid[0]

            def op(x):
                x_in = jnp.where(pin, 0.0, x)
                y = self._spmv_local(A, cols_, mask_, x_in, sidx_, hsrc_)
                return jnp.where(pin, x, y)

            pdot = lambda u, v: jax.lax.psum(jnp.vdot(u, v), self.axis)
            pre = jacobi_preconditioner(jnp.where(pin, 1.0, dg))
            return cg(op, jnp.where(pin & ~bc, 0.0, b), precond=pre,
                      rtol=rtol, maxiter=maxiter, dot=pdot).x

        return run(A_rows, b_rows, bc_rows, diag_rows, self.local_cols,
                   self.local_mask, self.shared_idx, self.halo_src,
                   self.row_valid)

    # ---- host helpers --------------------------------------------------------

    def pad_rows(self, x_global):
        """(n,) global vector -> (n_total,) row-sharded device array."""
        n = self.part.mesh.n_nodes
        x = jnp.concatenate([
            jnp.asarray(x_global, self.dtype),
            jnp.zeros(self.part.n_total - n, self.dtype),
        ])
        return jax.device_put(x, NamedSharding(self.dmesh, P(self.axis)))

    def unpad_rows(self, x_rows):
        return np.asarray(x_rows)[: self.part.mesh.n_nodes]


def distributed_poisson_demo(mesh, device_mesh, axis="i", rtol=1e-12):
    """End-to-end check: solve the constrained Poisson problem from the
    single-device test suite on a node partition (used by tests)."""
    from conservation_fem_tpu.ops import assembly

    part = build_partition(mesh, device_mesh.shape[axis])
    m = part.mesh.device_arrays(jnp.float64)
    K = assembly.assemble_stiffness(m)
    dist = DistributedELL(part, device_mesh, axis)
    # pad row-wise arrays
    n, Kw = part.mesh.n_nodes, part.mesh.max_patch
    pad = part.n_total - n
    A_rows = jnp.concatenate([K, jnp.zeros((pad, Kw), K.dtype)])
    A_rows = jax.device_put(A_rows, dist.shard)
    from conservation_fem_tpu.ops.spmv import ell_diag, ell_matvec

    bc = m.boundary_mask
    g = m.points[:, 0] ** 2 - m.points[:, 1] ** 2
    b = -ell_matvec(m, K, jnp.where(bc, g, 0.0))
    b = jnp.where(bc, g, b)
    diag = ell_diag(m, K)
    x = dist.solve_cg(
        A_rows, dist.pad_rows(b),
        jax.device_put(jnp.concatenate([bc, jnp.zeros(pad, bool)]),
                       NamedSharding(device_mesh, P(axis))),
        dist.pad_rows(diag), rtol=rtol,
    )
    return part.mesh, dist.unpad_rows(x), np.asarray(g)
