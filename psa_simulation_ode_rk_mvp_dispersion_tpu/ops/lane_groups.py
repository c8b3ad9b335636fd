"""Grouped-lane layout marshalling shared by the fused pallas solvers.

The grouped kernels (``ops/pallas_solver.py`` x32, ``ops/pallas_df32.py``
df32) pack ``g`` ODE instances per lane column with their waves on wave-major
row groups: a ``(B, n)`` host batch becomes an ``(n*g, B/g)`` f32 plane with
wave ``k`` of member ``j`` on row ``k*g + j``, so every wave slice stays
contiguous and the f32 (8, 128) vector tile fills completely.  These helpers
hold the single source of truth for that index map and its padding rule so
the two kernels cannot drift apart (they briefly did: the df32 padding
dropped the ``ndev`` factor and over-padded sharded solves).
"""

from __future__ import annotations

import numpy as np

LANES = 128


def grouped_pad_target(B: int, *, g: int, block: int, ndev: int,
                       lanes: int = LANES) -> int:
    """Padded batch size: a whole number of ``block``-lane pallas blocks per
    device shard when every shard can fill one, else ``lanes``-lane tiles."""
    lane_mult = block if (B // g) >= ndev * block else lanes
    mult = ndev * g * lane_mult
    return ((B + mult - 1) // mult) * mult


def pad_rows(x: np.ndarray, pad: int) -> np.ndarray:
    """Edge-replicate ``pad`` rows on the leading axis (benign padding)."""
    if pad == 0:
        return x
    return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])


def plane_state(X: np.ndarray, g: int) -> np.ndarray:
    """(Bp, n) -> (n*g, Bp/g): wave k of member j on row k*g + j."""
    Bp, n = X.shape
    Bl = Bp // g
    return X.reshape(Bl, g, n).transpose(2, 1, 0).reshape(n * g, Bl)


def rows_scalar(v: np.ndarray, g: int, waves: int = 4) -> np.ndarray:
    """(Bp,) -> (waves*g, Bp/g): per-member value replicated over waves."""
    Bl = v.shape[0] // g
    return np.tile(v.reshape(Bl, g).T, (waves, 1))


def unplane(rows: np.ndarray, g: int, n: int = 4) -> np.ndarray:
    """(n*g, Bl) -> (Bp, n): inverse of :func:`plane_state`."""
    Bl = rows.shape[1]
    return rows.reshape(n, g, Bl).transpose(2, 1, 0).reshape(Bl * g, n)
