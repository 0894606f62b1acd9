from .sdpa import read_sdpa, SDPAData  # noqa: F401
