from . import numpy_oracle  # noqa: F401
