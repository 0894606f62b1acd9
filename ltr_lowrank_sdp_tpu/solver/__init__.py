# driver exports are added once solver.driver lands; import submodules
# directly (ltr_lowrank_sdp_tpu.solver.alm / .admm / .driver).
try:  # pragma: no cover
    from .driver import solve, SolveResult  # noqa: F401
except ImportError:  # during staged bring-up
    pass
