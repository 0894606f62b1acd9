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

if _os.environ.get("LORADS_TPU_NO_X64", "0") != "1":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

from .config import SolverParams  # noqa: E402,F401
from .problem import SDPProblem  # noqa: E402,F401

__version__ = "0.1.0"
