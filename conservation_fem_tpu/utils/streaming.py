"""Per-step streaming output from inside jitted time loops.

The reference writes XDMF every step inside its Python time loop
(ref Code/Linear_advection/linear_advection.py:176); here the whole loop
is one jitted lax.scan, so streaming rides jax's ordered io_callback: the
device posts (u, t) to the host after each step and the host appends it
to the XDMF/HDF5 series (or any user sink) while the scan keeps running.

Usage:
    stream = StreamingXDMF(path, host_mesh)        # or StreamingSink(fn)
    ...inside the jitted step:  stream.emit(u, t)
    stream.close()                                  # finalize XDMF index

The callback is `ordered=True`, so entries arrive in step order. Cost: a
device->host copy of one field per emitted step — stream_every in the
solver drivers thins it for long runs.
"""

from __future__ import annotations

import numpy as np


class StreamingSink:
    """Stream (u, t) pairs from a jitted loop to a host function.

    `every` thins on the host (ordered io_callback cannot live inside
    lax.cond, so the device posts every step and the host drops all but
    every k-th). Note `every` only thins DISK writes — every emitted step
    still pays the device->host copy. close() resets the thinning counter
    so one sink can be reused across solve() calls."""

    def __init__(self, fn, every: int = 1):
        self._fn = fn
        self._every = max(int(every), 1)
        self._count = 0

    def emit(self, u, t):
        import jax

        def _cb(u_host, t_host):
            if self._count % self._every == 0:
                self._fn(np.asarray(u_host), float(t_host))
            self._count += 1

        jax.experimental.io_callback(_cb, None, u, t, ordered=True)
        return u

    def close(self):
        self._count = 0


class StreamingXDMF(StreamingSink):
    """Append each emitted step to an XDMF/HDF5 series (the reference's
    per-step xdmf.write_function, ref linear_advection.py:176)."""

    def __init__(self, path: str, host_mesh, name: str = "uh",
                 every: int = 1):
        from conservation_fem_tpu.utils.io import XDMFWriter

        self._writer = XDMFWriter(path, host_mesh)
        self._name = name
        super().__init__(
            lambda u, t: self._writer.write_function(u, t, name=self._name),
            every=every,
        )

    def close(self):
        self._writer.close()
        super().close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
