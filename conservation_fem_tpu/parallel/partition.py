"""Node partitioning + halo index structures for unstructured meshes.

Host-side preprocessing for the distributed ELL path
(parallel/unstructured_sharded.py): the TPU equivalent of DOLFINx's mesh
partitioning with ghost nodes (SURVEY.md section 2.8; partitioners
ParMETIS/PT-SCOTCH in the reference env, ref Environment/fenicsx-env.yml).

Strategy: RCM-reorder the mesh for locality, split nodes into contiguous
equal blocks (one per device), and for each device build:

  * its row block of the ELL patch structure, with column indices remapped
    to [0, n_own + n_halo) — owned entries first, halo entries after;
  * the halo exchange table: every device publishes a fixed-size block of
    its "shared" owned nodes (those referenced by other devices); after an
    all_gather of these compact blocks each device gathers its halo values
    with a precomputed flat index. This is ghost scatter_forward
    (ref linear_advection.py:170) expressed with one collective.

Cells are assigned to the device owning their first node; scatter-add
contributions to non-owned rows ride the same shared-block mechanism in
reverse (psum over published accumulation blocks) — ghostUpdate(ADD,
REVERSE) (ref linear_advection.py:165).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from conservation_fem_tpu.ops.mesh import Mesh, rcm_permutation, reorder_mesh


class Partition(NamedTuple):
    mesh: Mesh                 # RCM-reordered mesh
    n_dev: int
    n_own: int                 # owned nodes per device (padded)
    n_total: int               # n_own * n_dev (>= n_nodes)
    # halo structures, all shaped per device (leading axis n_dev):
    shared_size: int           # S: published shared-block width
    shared_idx: np.ndarray     # (n_dev, S) local-owned index each device publishes
    halo_size: int             # H: halo width (max over devices)
    halo_src: np.ndarray       # (n_dev, H) flat index into the gathered
                               # (n_dev*S,) shared table for each halo slot
    # per-device ELL row block with remapped columns:
    local_cols: np.ndarray     # (n_dev, n_own, K) in [0, n_own+H)
    local_mask: np.ndarray     # (n_dev, n_own, K)
    global_rows: np.ndarray    # (n_dev, n_own) global node id (or -1 pad)


def build_partition(mesh: Mesh, n_dev: int, reorder: bool = True) -> Partition:
    if reorder:
        mesh = reorder_mesh(mesh, rcm_permutation(mesh))
    n = mesh.n_nodes
    n_own = -(-n // n_dev)
    n_total = n_own * n_dev
    owner = np.minimum(np.arange(n_total) // n_own, n_dev - 1)

    K = mesh.max_patch
    cols = mesh.patch_cols
    mask = mesh.patch_mask

    # halo sets: for device d, referenced nodes owned elsewhere
    halo_sets = []
    for d in range(n_dev):
        lo, hi = d * n_own, min((d + 1) * n_own, n)
        c = cols[lo:hi][mask[lo:hi]]
        ext = np.unique(c[(c < lo) | (c >= hi)])
        halo_sets.append(ext)
    H = max((len(h) for h in halo_sets), default=1) or 1

    # shared sets: for device d, owned nodes referenced by others
    shared_sets = []
    for d in range(n_dev):
        lo, hi = d * n_own, min((d + 1) * n_own, n)
        refs = np.unique(np.concatenate(
            [h[(h >= lo) & (h < hi)] for h in halo_sets] or [np.empty(0, int)]
        ))
        shared_sets.append(refs)
    S = max((len(s) for s in shared_sets), default=1) or 1

    shared_idx = np.zeros((n_dev, S), dtype=np.int64)
    for d, s in enumerate(shared_sets):
        shared_idx[d, : len(s)] = s - d * n_own       # local index
        # pad repeats slot 0 (harmless duplicate publish)

    # global -> (device, shared slot) lookup for halo sources
    flat_lookup = {}
    for d, s in enumerate(shared_sets):
        for j, g in enumerate(s):
            flat_lookup[int(g)] = d * S + j

    halo_src = np.zeros((n_dev, H), dtype=np.int64)
    halo_pos = {}            # (device, global id) -> halo slot
    for d, hset in enumerate(halo_sets):
        for j, g in enumerate(hset):
            halo_src[d, j] = flat_lookup[int(g)]
            halo_pos[(d, int(g))] = j

    # local ELL blocks with remapped columns
    local_cols = np.zeros((n_dev, n_own, K), dtype=np.int64)
    local_mask = np.zeros((n_dev, n_own, K), dtype=bool)
    global_rows = np.full((n_dev, n_own), -1, dtype=np.int64)
    for d in range(n_dev):
        lo, hi = d * n_own, min((d + 1) * n_own, n)
        nrows = hi - lo
        global_rows[d, :nrows] = np.arange(lo, hi)
        cblk = cols[lo:hi].copy()
        mblk = mask[lo:hi].copy()
        own = (cblk >= lo) & (cblk < hi)
        out = np.zeros_like(cblk)
        out[own] = cblk[own] - lo
        ext = mblk & ~own
        if ext.any():
            out[ext] = n_own + np.array(
                [halo_pos[(d, int(g))] for g in cblk[ext]]
            )
        out[~mblk] = 0
        local_cols[d, :nrows] = out
        local_mask[d, :nrows] = mblk
    return Partition(
        mesh=mesh, n_dev=n_dev, n_own=n_own, n_total=n_total,
        shared_size=S, shared_idx=shared_idx,
        halo_size=H, halo_src=halo_src,
        local_cols=local_cols, local_mask=local_mask,
        global_rows=global_rows,
    )
