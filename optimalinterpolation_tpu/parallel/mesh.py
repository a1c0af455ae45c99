"""Device mesh + sharding layout (replaces the reference's MPI task farm).

The reference's only distributed mechanism is mpi4py scatter/gather of cell
indices across ranks (``/root/reference/2021_paper_production/GPR_CS2S3.py:
18-23,248-262``). The TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over
a ``cells`` axis; every padded bucket's leading (cells) dimension is sharded
with a ``NamedSharding``, XLA partitions the batched optimize/predict
programs, and — because cells are independent — no collectives are emitted at
all (the reference's gather/bcast round-trips disappear; the smoothing step
runs replicated on the tiny 320x320 hyper fields).

A second ``days`` axis (multi-slice / DCN) is provided for season-scale runs:
days are also embarrassingly parallel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "cell_sharding", "day_cell_mesh"]


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "cells", devices=None
) -> Mesh:
    """1-D mesh over the cells axis (ICI within a slice)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def day_cell_mesh(shape: Sequence[int], devices=None) -> Mesh:
    """2-D (days, cells) mesh: days across slices (DCN), cells within (ICI)."""
    if devices is None:
        devices = jax.devices()
    arr = np.asarray(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, ("days", "cells"))


def cell_sharding(mesh: Mesh, axis_name: str = "cells") -> NamedSharding:
    """Shard the leading (cells) axis of bucket arrays; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))
