"""ltr_lowrank_sdp_tpu — a TPU-native low-rank SDP framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``muhd-umer/ltr-lowrank-sdp`` reference (LoRADS Burer-Monteiro ALM+ADMM solver,
HALLaR-class spectraplex solver, and a GNN rank-schedule predictor), built
TPU-first: the sparse conic operators A(UV^T) and A*(w)·Y run as
gather/segment-reduction kernels, the inner minimizations compile to batched
dense matmuls under ``jit``, and constraint blocks / instance batches shard
across a ``jax.sharding.Mesh`` with ``psum`` reductions.

The solver is all-double by default (the reference C solver targets DIMACS
residuals of 1e-5..1e-6); x64 is enabled at import time unless
``LORADS_TPU_NO_X64=1`` is set, in which case float32 compute can be selected
through :class:`~ltr_lowrank_sdp_tpu.config.SolverParams`.
"""

import os as _os

import jax as _jax

if _os.environ.get("LORADS_TPU_NO_X64", "0") != "1":
    _jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: first compiles through the remote-TPU
# tunnel are slow (minutes for the fused phase executables); caching them on
# disk makes subsequent processes start hot.
if _os.environ.get("LORADS_TPU_NO_COMPILE_CACHE", "0") != "1":
    _cache_dir = _os.environ.get(
        "LORADS_TPU_COMPILE_CACHE", _os.path.expanduser("~/.lorads_jax_cache")
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # 0.0: persist even sub-second one-op programs — through the
        # remote-TPU tunnel each tiny compile costs ~0.4s, and a solve
        # dispatches a dozen of them before the fused phases start
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .config import SolverParams  # noqa: E402,F401
from .problem import SDPProblem  # noqa: E402,F401

__version__ = "0.1.0"
