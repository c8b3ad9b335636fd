"""Pallas TPU kernel: fused single-launch LLE (driven-damped SSFM) solver.

The Lugiato-Lefever Strang step (``models/lle._lle_chunk_strang``) has
exactly the fused-SSFM structure of the GNLSE kernel -- ``Lh, (K, Lf)^(k-1),
K, Lh`` per save chunk -- with two LLE-specific twists handled by the
``affine`` variant of ``ops/pallas_gnlse._kernel_body``:

- the linear substep is AFFINE: after the frequency-domain multiply by the
  dispersion+loss factor, each lane applies its scalar detuning rotation
  ``dp = exp(-i Delta s)`` and the exact constant drive offset
  ``dF = F (e^{Lam0 s} - 1)/Lam0`` (``Lam0 = -(1 + i Delta)``) in the time
  domain -- fused into the inverse DFT's per-group write, so the drive
  costs zero extra passes;
- the Kerr rotation is unit-gamma (normalized LLE), so the kernel's
  per-lane gamma planes are ones.

Everything else -- the polyphase MXU DFTs, VMEM-resident state, chunked
save/NaN-freeze contract, one stacked output fetch -- is shared with the
scalar GNLSE kernel (see ``ops/pallas_gnlse.py``'s module docstring for
the architecture and ``docs/PERF.md`` rule 7 for the one-fetch rule).

Capability lineage: the reference's split-step roadmap gesture
(/root/reference/tests.py cascaded-comb intent); the scan-engine contract
this kernel mirrors is ``models/lle._lle_solver`` (reduce mode).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from .pallas_gnlse import (
    BLOCK,
    LANES,
    MAX_R,
    M_SUB,
    _make_gnlse_call,
    _pack_grouped,
    _unpack_grouped,
)


@functools.lru_cache(maxsize=32)
def _pallas_lle_solver(n_steps: int, save_every: int, t: int, dt: float,
                       interpret: bool, block: int):
    call = _make_gnlse_call(n_steps, save_every, t, dt, interpret, block,
                            None, affine=True)

    def fused(lh, gam, aff, y0):
        B = y0.shape[1]
        # the dispersion factor is lane-shared for shared lin_phase:
        # broadcast device-side so the host never ships (2T, B)
        lh = jnp.broadcast_to(lh, (lh.shape[0], B))
        pk, ylast, ok = call(lh, gam, y0, aff=aff)
        # ONE stacked output fetch (docs/PERF.md rule 7)
        return jnp.concatenate([pk, ylast, ok], axis=0)

    return jax.jit(fused)


@functools.lru_cache(maxsize=16)
def _pallas_lle_solver_sharded(n_steps: int, save_every: int, t: int,
                               dt: float, interpret: bool, block: int, mesh):
    """shard_map wrapper: batch (lane) axis split over the mesh; the DFT
    weights are closure constants replicated per shard."""
    from jax.sharding import PartitionSpec

    call = _make_gnlse_call(n_steps, save_every, t, dt, interpret, block,
                            None, affine=True)

    def fused(lh, gam, aff, y0):
        pk, ylast, ok = call(lh, gam, y0, aff=aff)
        return jnp.concatenate([pk, ylast, ok], axis=0)

    axes = tuple(mesh.axis_names)
    spec = PartitionSpec(None, axes if len(axes) > 1 else axes[0])
    return jax.jit(
        jax.shard_map(
            fused, mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    ), spec


def solve_lle_batch_pallas(
    psi0: np.ndarray,
    detuning,
    pump_re,
    pump_im,
    lin_phase,
    *,
    dt: float,
    n_steps: int,
    save_every: int,
    interpret: bool = False,
    block: int = BLOCK,
    mesh=None,
):
    """Fused-kernel batched LLE solve; contract mirrors
    ``models/lle._lle_solver`` (reduce mode, Strang, x32): returns host
    ``(peak_max (B,), psi_last (B, T), ok (B,))``.

    ``psi0`` is ``(B, T)`` complex; ``detuning`` / ``pump_re`` / ``pump_im``
    broadcast to ``(B,)`` (the detuning/pump scan axes); ``lin_phase`` is
    the dispersion-only phase rate ``phi_d(omega)`` (fft-ordered, ``(T,)``
    or ``(B, T)``).  T must be a multiple of 128 and at most
    ``128 * MAX_R``; wider grids use the scan engine.  Pass ``mesh`` to
    shard the batch axis (``shard_map``, per-shard kernel launch, no
    collectives).
    """
    psi0 = np.asarray(psi0, dtype=np.complex128)
    if psi0.ndim != 2:
        raise ValueError(f"psi0 must have shape (B, T), got {psi0.shape}")
    B, T = psi0.shape
    m = M_SUB
    if T % m != 0 or T < m:
        raise ValueError(
            f"T={T} is not a multiple of {m}: the fused LLE kernel needs "
            f"polyphase groups of {m}; use the scan engine"
        )
    if T // m > MAX_R:
        raise ValueError(
            f"T={T} too wide for the fused LLE kernel (max {m * MAX_R}); "
            "use the scan engine"
        )

    det = np.broadcast_to(np.asarray(detuning, dtype=np.float64), (B,))
    F = (np.broadcast_to(np.asarray(pump_re, dtype=np.float64), (B,))
         + 1j * np.broadcast_to(np.asarray(pump_im, dtype=np.float64), (B,)))
    phase = np.asarray(lin_phase, dtype=np.float64)
    shared_fac = phase.ndim == 1
    phase_p = phase[None, :] if shared_fac else np.broadcast_to(phase, (B, T))

    def factor_planes(s):
        # dispersion+loss factor exp((-1 + i phi_d) s) (detuning excluded --
        # it rides the affine rows), natural k order, stacked (2T, Bf) f32
        dec = np.exp(-s)
        ang = phase_p * s
        fr = (dec * np.cos(ang)).astype(np.float32)
        fi = (dec * np.sin(ang)).astype(np.float32)
        return np.concatenate([fr.T, fi.T], axis=0)

    # the kernel derives the full-step factor as Lh^2 in VMEM
    lh = factor_planes(0.5 * dt)

    def affine_rows(s):
        # scalar detuning phase exp(-i Delta s) and the exact drive offset
        # F (e^{Lam0 s} - 1)/Lam0, Lam0 = -(1 + i Delta)
        # (models/lle._det_phase / _drive_offset)
        dp = np.exp(-1j * det * s)
        lam0 = -(1.0 + 1j * det)
        dF = F * (np.exp(lam0 * s) - 1.0) / lam0
        return dp, dF

    dp_h, dF_h = affine_rows(0.5 * dt)
    dp_f, dF_f = affine_rows(dt)
    aff = np.stack([dp_h.real, dp_h.imag, dF_h.real, dF_h.imag,
                    dp_f.real, dp_f.imag, dF_f.real, dF_f.imag],
                   axis=0).astype(np.float32)          # (8, B)

    blk = int(min(block, max(B, LANES)))
    ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    if B < ndev * blk:
        blk = LANES
    mult = ndev * blk
    Bp = ((B + mult - 1) // mult) * mult
    pad = Bp - B

    def padded(x, axis=0):
        if not pad:
            return x
        rep = np.repeat(np.take(x, [-1], axis=axis), pad, axis=axis)
        return np.concatenate([x, rep], axis=axis)

    y0 = _pack_grouped(padded(psi0), T, m)             # (2T, Bp)
    aff = padded(aff, axis=1)
    gam = np.ones((1, Bp), dtype=np.float32)           # normalized Kerr
    if lh.shape[1] != 1:
        lh = padded(lh, axis=1)

    if mesh is None:
        solver = _pallas_lle_solver(
            int(n_steps), int(save_every), int(T), float(dt),
            bool(interpret), blk,
        )
        with jax.enable_x64(False):
            out = jax.block_until_ready(solver(
                jnp.asarray(lh), jnp.asarray(gam), jnp.asarray(aff),
                jnp.asarray(y0)))
        out = np.asarray(out, np.float64)              # ONE fetch
    else:
        from jax.sharding import NamedSharding

        from ..parallel.mesh import fetch_global, put_global

        solver, spec = _pallas_lle_solver_sharded(
            int(n_steps), int(save_every), int(T), float(dt),
            bool(interpret), blk, mesh,
        )
        sh = NamedSharding(mesh, spec)
        lhb = np.broadcast_to(lh, (2 * T, Bp))
        args = tuple(put_global(np.ascontiguousarray(x), sh)
                     for x in (lhb, gam, aff, y0))
        with jax.enable_x64(False):
            fused_out = jax.block_until_ready(solver(*args))
        out = np.asarray(fetch_global(fused_out), np.float64)

    pk = out[0, :B]
    ok = out[1 + 2 * T, :B] > 0.0
    psi_last = _unpack_grouped(out[1:1 + 2 * T], T, m, B)
    return pk, psi_last, ok
