from .solver import hallar_solve, HallarParams, SpectraplexProblem  # noqa: F401
