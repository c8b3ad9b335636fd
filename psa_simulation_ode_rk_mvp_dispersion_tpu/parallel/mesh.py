"""Device-mesh helpers for sharded batch solves.

The reference has no parallelism at all (serial Python loops,
``scan_mismtach.py:126/:357/:694``); the TPU-native scaling model is:

    batch of independent ODE instances
        -> vmap (one XLA program, one chip)
        -> shard the batch axis over a 1-D device Mesh (pjit/NamedSharding)

Every instance is independent, so the sharded program is embarrassingly SPMD:
no collectives in the hot loop; the only cross-device traffic is the final
gather of per-instance reductions (gain scalars), which rides ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

BATCH_AXIS = "batch"


def default_mesh(
    n_devices: Optional[int] = None, *, axis_name: str = BATCH_AXIS
) -> Optional[Mesh]:
    """A 1-D mesh over (up to) all local devices; None on a single device
    (plain vmap is already optimal there)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else min(n_devices, len(devs))
    if n <= 1:
        return None
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, *, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis; replicate everything else."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def pad_batch(arr: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad the leading axis up to a multiple (edge-replicating the last row so
    padded instances stay numerically benign); returns (padded, original_n)."""
    n = arr.shape[0]
    if multiple <= 1 or n % multiple == 0:
        return arr, n
    pad = multiple - (n % multiple)
    pad_rows = np.repeat(arr[-1:], pad, axis=0)
    return np.concatenate([arr, pad_rows], axis=0), n
