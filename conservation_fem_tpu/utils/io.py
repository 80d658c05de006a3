"""XDMF/HDF5 time-series I/O, format-compatible with the reference's
DOLFINx output (ref Code/Linear_advection/linear_advection.py:96-97,176
writes Mesh/mesh/{geometry,topology} + Function/<name>/<time> datasets;
Data/*.h5 files in the reference follow this layout).

Reader side ingests the reference's stored golden data for parity tests;
writer side produces the same layout (HDF5 + ASCII XDMF index) so outputs
are ParaView-compatible and cross-readable with FEniCSx tooling.
"""

from __future__ import annotations

import os

import numpy as np

from conservation_fem_tpu.ops.mesh import Mesh, mesh_from_arrays


def _time_key(t: float) -> str:
    """DOLFINx encodes dataset names as repr(t) with '.' -> '_'."""
    return repr(float(t)).replace(".", "_")


def _key_time(k: str) -> float:
    return float(k.replace("_", "."))


def read_h5_mesh(path: str) -> Mesh:
    import h5py

    with h5py.File(path, "r") as f:
        return mesh_from_arrays(
            np.asarray(f["Mesh/mesh/geometry"])[:, :2],
            np.asarray(f["Mesh/mesh/topology"]),
        )


def read_h5_series(path: str, name: str):
    """Read Function/<name>/* -> (times (T,), values (T, ndof)) sorted."""
    import h5py

    with h5py.File(path, "r") as f:
        grp = f[f"Function/{name}"]
        keys = sorted(grp.keys(), key=_key_time)
        times = np.array([_key_time(k) for k in keys])
        vals = np.stack([np.asarray(grp[k])[:, 0] for k in keys])
    return times, vals


class XDMFWriter:
    """Minimal XDMF+HDF5 time-series writer (P1 scalar fields on triangles).

    Mirrors io.XDMFFile usage in the reference: write_mesh once, then
    write_function(u, t) per step (ref linear_advection.py:96-97,176).
    """

    def __init__(self, path: str, mesh: Mesh):
        import h5py

        base, _ = os.path.splitext(path)
        self.h5_path = base + ".h5"
        self.xdmf_path = base + ".xdmf"
        self.mesh = mesh
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._h5 = h5py.File(self.h5_path, "w")
        self._h5.create_dataset("Mesh/mesh/geometry", data=mesh.points)
        self._h5.create_dataset(
            "Mesh/mesh/topology", data=mesh.cells.astype(np.int64)
        )
        self._entries: list[tuple[str, float, str]] = []

    def write_function(self, u, t: float, name: str = "uh"):
        key = _time_key(t)
        self._h5.create_dataset(
            f"Function/{name}/{key}", data=np.asarray(u).reshape(-1, 1)
        )
        self._entries.append((name, float(t), key))

    def close(self):
        self._h5.close()
        n, m = self.mesh.n_nodes, self.mesh.n_cells
        h5 = os.path.basename(self.h5_path)
        grids = []
        for name, t, key in self._entries:
            grids.append(f"""      <Grid Name="{name}_{key}" GridType="Uniform">
        <Topology TopologyType="Triangle" NumberOfElements="{m}">
          <DataItem Dimensions="{m} 3" NumberType="Int" Format="HDF">{h5}:/Mesh/mesh/topology</DataItem>
        </Topology>
        <Geometry GeometryType="XY">
          <DataItem Dimensions="{n} 2" Format="HDF">{h5}:/Mesh/mesh/geometry</DataItem>
        </Geometry>
        <Time Value="{t}" />
        <Attribute Name="{name}" AttributeType="Scalar" Center="Node">
          <DataItem Dimensions="{n} 1" Format="HDF">{h5}:/Function/{name}/{key}</DataItem>
        </Attribute>
      </Grid>""")
        body = "\n".join(grids)
        with open(self.xdmf_path, "w") as f:
            f.write(f"""<?xml version="1.0"?>
<Xdmf Version="3.0">
  <Domain>
    <Grid Name="TimeSeries" GridType="Collection" CollectionType="Temporal">
{body}
    </Grid>
  </Domain>
</Xdmf>
""")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
