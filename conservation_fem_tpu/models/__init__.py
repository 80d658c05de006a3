from conservation_fem_tpu.models import (  # noqa: F401
    burgers,
    kpp,
    linear_advection,
    pk_hyperbolic,
    advection_ho,
    euler,
    scalar_hyperbolic,
    stokes,
    structured_hyperbolic,
)
