from conservation_fem_tpu.models import linear_advection  # noqa: F401
