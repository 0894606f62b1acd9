from .coneops import ConeOps, build_cone_ops  # noqa: F401
