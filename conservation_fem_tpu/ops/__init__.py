from conservation_fem_tpu.ops import (  # noqa: F401
    assembly,
    bc,
    helpers,
    krylov,
    mesh,
    newton,
    spmv,
    stabilization,
)
