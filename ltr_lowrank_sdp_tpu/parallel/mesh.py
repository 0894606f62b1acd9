"""Device mesh construction.

Two parallel axes cover this problem domain (SURVEY.md §5.7-5.8):

* ``batch``  — independent SDP instances (scenario solves, dataset
  harvesting): pure data parallelism, zero communication between instances;
* ``constr`` — the constraint/nnz axis of one huge instance: the stacked COO
  entry list is sharded, factors are replicated, and the two conic operators
  reduce with a single ``psum`` each over ICI.

The reference has no distributed layer at all (single-threaded C); this
module is new TPU-native design.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, batch: int | None = None,
              axis_names=("batch", "constr")) -> Mesh:
    """Factorize the device list into a (batch, constr) mesh.

    ``batch`` fixes the batch-axis size (must divide n_devices); default
    puts everything on the constraint axis.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if batch is None:
        batch = 1
    if n % batch != 0:
        raise ValueError(f"batch axis {batch} does not divide {n} devices")
    arr = np.array(devs).reshape(batch, n // batch)
    return Mesh(arr, axis_names)
