"""Pallas TPU kernel: fused batched adaptive (DP45) solve of the 4-wave FWM
system -- the adaptive analog of ``ops/pallas_solver.py``.

Why: the scan/while_loop adaptive path (``ops/adaptive.py``) runs every
controller iteration as a separately dispatched XLA loop body over the whole
batch -- measured 14-20x slower than fixed-step at the same precision
(VERDICT r3 weak #2; BENCH_r03 rk45 5,491 pts/s vs x32 32,229).  This kernel
runs the ENTIRE adaptive integration in one ``pallas_call``:

- state, controller state (per-lane z, dt), coefficients and running
  reductions live in VMEM for all steps -- no per-iteration dispatch;
- the controller is a ``lax.while_loop`` PER SAVE SEGMENT with a scalar
  ``jnp.any(active)`` condition: every lane advances with its OWN step size
  and finished/failed lanes are frozen by per-lane masks (the lockstep cost
  is bounded by the slowest lane of a 2048-instance *block*, not the whole
  batch -- and the sweep's sorted lambda3 grid packs similar-stiffness
  instances into the same block, see layout note below);
- the Dormand-Prince tableau, error norm (``scale = atol + rtol *
  max(|y|, |y_new|)``, RMS over the 4 complex components) and controller
  constants (safety 0.9, factor clip [0.2, 5], order -1/5) are EXACTLY
  ``ops/adaptive.py``'s, so the kernel meets the same tolerance contract.

Layout: the grouped-lane plane layout of ``ops/lane_groups.py`` (g=8
instances per 128-lane column, wave-major row groups -- full (8, 128) f32
tile occupancy); instance ``i`` maps to lane column ``i // g``, so a sorted
parameter grid yields stiffness-homogeneous blocks and the per-block
``max(lane steps)`` stays close to the mean.

Output contract matches ``parallel/sweep._solve_batch_rk45`` (P_max over
the decimated save grid, A_end at the last saved point; the trailing
``n_steps % save_every`` partial span is INTEGRATED but unsaved --
``tail_len`` below -- so it folds into ``ok`` and the step counters only,
the framework-wide save-decimation contract), plus per-lane
accepted/rejected step counters for diagnostics.

Capability lineage: /root/reference/integrators.py:150 (the reserved
adaptive slot) + /root/reference/config.py:89; contract mirror:
``parallel/sweep._solve_batch_rk45`` / ``ops/adaptive._advance_segment``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from .adaptive import (
    MAX_FACTOR,
    MIN_FACTOR,
    ORDER_EXP,
    SAFETY,
    _A,
    _B4,
    _B5,
)
from .lane_groups import grouped_pad_target, pad_rows, plane_state, rows_scalar, unplane

GROUP = 8
BLOCK = 256          # lanes per grid cell (Mosaic sweet spot, CLAUDE.md)
_F32_MAX = 3.4e38    # finite bound: NaN compares false (fixed-kernel trick)


def _kernel_body(n_chunks: int, seg_len: float, rtol: float, atol: float,
                 max_steps: int, g: int, tail_len: float = 0.0):
    """Adaptive DP45 kernel closed over the static save grid geometry.

    Per-segment LOCAL z in [0, seg_len] (the RHS is autonomous) keeps the
    f32 z accumulation exact at any distance and makes the segment end a
    compile-time constant.  ``tail_len > 0`` appends the trailing
    ``n_steps % save_every`` partial span AFTER the save grid: integrated
    but unsaved, folding into ok/counters only (the framework-wide
    decimation contract).
    """
    G = 4 * g

    def kernel(coef_ref, y0_ref, pmax_ref, yf_ref, ok_ref, na_ref, nr_ref):
        coef = coef_ref[:, :]
        gamma = coef[0:G, :]
        neg_half_alpha = -0.5 * coef[G:2 * G, :]
        half_db = 0.5 * coef[2 * G:2 * G + 2 * g, :]
        dt0 = coef[2 * G + 2 * g:2 * G + 3 * g, :]     # (g, B) initial dt
        two_gamma = 2.0 * gamma

        def tile4(t):
            return jnp.concatenate([t] * 4, axis=0)

        def tile8(t):
            return jnp.concatenate([t] * 8, axis=0)

        def rhs(y):
            # identical term structure to ops/pallas_solver._kernel_body_grouped
            re = y[0:G, :]
            im = y[G:2 * G, :]
            P = re * re + im * im
            tot = P[0:g] + P[g:2 * g] + P[2 * g:3 * g] + P[3 * g:4 * g]
            F = 2.0 * tile4(tot) - P
            gF = gamma * F
            d_re = neg_half_alpha * re - gF * im
            d_im = neg_half_alpha * im + gF * re

            r1, r2 = re[0:g], re[g:2 * g]
            r3, r4 = re[2 * g:3 * g], re[3 * g:4 * g]
            i1, i2 = im[0:g], im[g:2 * g]
            i3, i4 = im[2 * g:3 * g], im[3 * g:4 * g]
            s34_re = r3 * r4 - i3 * i4
            s34_im = r3 * i4 + i3 * r4
            s12_re = r1 * r2 - i1 * i2
            s12_im = r1 * i2 + i1 * r2
            t_re = jnp.concatenate([
                r2 * s34_re + i2 * s34_im,
                r1 * s34_re + i1 * s34_im,
                r4 * s12_re + i4 * s12_im,
                r3 * s12_re + i3 * s12_im,
            ], axis=0)
            t_im = jnp.concatenate([
                r2 * s34_im - i2 * s34_re,
                r1 * s34_im - i1 * s34_re,
                r4 * s12_im - i4 * s12_re,
                r3 * s12_im - i3 * s12_re,
            ], axis=0)
            d_re = d_re - two_gamma * t_im
            d_im = d_im + two_gamma * t_re

            det_re = half_db * im[0:2 * g, :]
            det_im = -half_db * re[0:2 * g, :]
            zero = jnp.zeros_like(det_re)
            d_re = d_re + jnp.concatenate([det_re, zero], axis=0)
            d_im = d_im + jnp.concatenate([det_im, zero], axis=0)
            return jnp.concatenate([d_re, d_im], axis=0)

        def dp45_step(y, dt8):
            """One Dormand-Prince step with per-lane dt ((8g, B) plane).

            Returns (y5, err) -- the same tableau walk as
            ``ops/adaptive.rk45_step``."""
            ks = []
            for i in range(7):
                yi = y
                for j, aij in enumerate(_A[i]):
                    if aij != 0.0:
                        yi = yi + (dt8 * aij) * ks[j]
                ks.append(rhs(yi))
            y5 = y
            err = jnp.zeros_like(y)
            for i in range(7):
                if _B5[i] != 0.0:
                    y5 = y5 + (dt8 * _B5[i]) * ks[i]
                d = _B5[i] - _B4[i]
                if d != 0.0:
                    err = err + (dt8 * d) * ks[i]
            return y5, err

        def powers(y):
            re = y[0:G, :]
            im = y[G:2 * G, :]
            return re * re + im * im

        def member_mean4(p):
            # (4g, B) per-wave plane -> (g, B) mean over the 4 waves
            return 0.25 * (p[0:g] + p[g:2 * g] + p[2 * g:3 * g]
                           + p[3 * g:4 * g])

        def error_norm(err, y, y_new):
            """ops/adaptive._error_norm: complex-aware weighted RMS over the
            4 components; 0/0 (dark waves with atol=0) reads as 0."""
            P = powers(y)
            Pn = powers(y_new)
            mag = jnp.sqrt(jnp.maximum(P, Pn))           # max(|y|, |y_new|)
            scale = atol + rtol * mag                    # (4g, B)
            e = jnp.sqrt(powers(err))                    # |err| per wave
            r = jnp.where(scale > 0.0, e / jnp.where(scale > 0.0, scale, 1.0),
                          0.0)
            return jnp.sqrt(member_mean4(r * r))         # (g, B)

        y0 = y0_ref[:, :]
        pmax0 = powers(y0)
        ok0 = jnp.ones_like(y0[0:g, :])
        zero_g = jnp.zeros_like(ok0)

        def advance(carry, length):
            # one adaptive span of STATIC length (local z in [0, length])
            y, ok, dt, na, nr = carry
            z = zero_g
            seg_end = jnp.asarray(length, jnp.float32)
            dt_min = 1e-12 * (length + 1.0)   # ops/adaptive dt_min * span

            def cond(state):
                y_, z_, dt_, ok_, na_, nr_, it = state
                return jnp.any((z_ < seg_end) & (ok_ > 0.0)) & (
                    it < max_steps)

            def body(state):
                y_, z_, dt_, ok_, na_, nr_, it = state
                active = (z_ < seg_end) & (ok_ > 0.0)    # (g, B) bool

                h = jnp.minimum(dt_, seg_end - z_)       # clamp to landing
                h8 = tile8(h)
                y_new, err = dp45_step(y_, h8)
                enorm = error_norm(err, y_, y_new)       # (g, B)
                # all 8 state rows finite (NaN compares false against the
                # f32 max bound; the two means must BOTH be exactly 1)
                fin_all = (
                    member_mean4(
                        (jnp.abs(y_new[0:G]) < _F32_MAX).astype(jnp.float32))
                    + member_mean4(
                        (jnp.abs(y_new[G:2 * G]) < _F32_MAX).astype(
                            jnp.float32))
                ) >= 2.0
                finite = (enorm < _F32_MAX) & fin_all

                accept = active & finite & (enorm <= 1.0)
                # step-size update: exp/log power (Mosaic-safe)
                factor = jnp.where(
                    finite,
                    jnp.clip(
                        SAFETY * jnp.exp(
                            ORDER_EXP * jnp.log(jnp.maximum(enorm, 1e-16))),
                        MIN_FACTOR, MAX_FACTOR),
                    jnp.asarray(0.5, jnp.float32),
                )
                dt_next = jnp.where(active,
                                    jnp.maximum(dt_ * factor, dt_min), dt_)
                failed = active & (~accept) & (h <= dt_min)

                acc8 = tile8(jnp.where(accept, 1.0, 0.0)) > 0.0
                y_out = jnp.where(acc8, y_new, y_)
                z_out = jnp.where(accept, z_ + h, z_)
                ok_out = ok_ * jnp.where(failed, 0.0, 1.0)
                na_out = na_ + jnp.where(accept, 1.0, 0.0)
                nr_out = nr_ + jnp.where(active & ~accept, 1.0, 0.0)
                return (y_out, z_out, dt_next, ok_out, na_out, nr_out,
                        it + 1)

            y, z, dt, ok, na, nr, _it = lax.while_loop(
                cond, body,
                (y, z, dt, ok, na, nr, jnp.asarray(0, jnp.int32)))
            # a lane that exhausted max_steps without reaching the segment
            # end is a failure, not a silent short integration
            ok = ok * jnp.where(z >= seg_end, 1.0, 0.0)
            return (y, ok, dt, na, nr)

        def segment(_c, carry):
            y, pmax, ok, dt, na, nr = carry
            y, ok, dt, na, nr = advance((y, ok, dt, na, nr), seg_len)
            pmax = jnp.maximum(pmax, powers(y))
            return (y, pmax, ok, dt, na, nr)

        y, pmax, ok, dt, na, nr = lax.fori_loop(
            0, n_chunks, segment,
            (y0, pmax0, ok0, dt0, zero_g, zero_g))
        if tail_len > 0.0:
            # trailing partial span: ok/counters only; y/pmax stay at the
            # last saved grid point
            _yt, ok, _dtt, na, nr = advance((y, ok, dt, na, nr), tail_len)
        pmax_ref[:, :] = pmax
        yf_ref[:, :] = y
        ok_ref[:, :] = ok
        na_ref[:, :] = na
        nr_ref[:, :] = nr

    return kernel


def _make_call(n_chunks: int, seg_len: float, rtol: float, atol: float,
               max_steps: int, interpret: bool, block: int, g: int,
               tail_len: float = 0.0):
    from jax.experimental import pallas as pl

    kernel = _kernel_body(n_chunks, seg_len, rtol, atol, max_steps, g,
                          tail_len)
    G = 4 * g
    n_coef = 2 * G + 3 * g

    def call(coef, y0):
        B = y0.shape[1]
        blk = min(block, B)
        grid = (B // blk,)
        spec_kwargs = {}
        if not interpret:
            from jax.experimental.pallas import tpu as pltpu

            spec_kwargs = {"memory_space": pltpu.VMEM}
        in_specs = [
            pl.BlockSpec((n_coef, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((2 * G, blk), lambda i: (0, i), **spec_kwargs),
        ]
        out_specs = tuple(
            pl.BlockSpec((r, blk), lambda i: (0, i), **spec_kwargs)
            for r in (G, 2 * G, g, g, g)
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=tuple(
                jax.ShapeDtypeStruct((r, B), jnp.float32)
                for r in (G, 2 * G, g, g, g)
            ),
            interpret=interpret,
        )(coef, y0)

    return call


@functools.lru_cache(maxsize=64)
def _pallas_rk45_solver(n_chunks: int, seg_len: float, rtol: float,
                        atol: float, max_steps: int, interpret: bool,
                        block: int, g: int, tail_len: float = 0.0):
    call = _make_call(n_chunks, seg_len, rtol, atol, max_steps, interpret,
                      block, g, tail_len)

    def fused(coef, y0):
        # ONE stacked output fetch (docs/PERF.md rule 7)
        pmax, y_last, ok, na, nr = call(coef, y0)
        return jnp.concatenate([pmax, y_last, ok, na, nr], axis=0)

    return jax.jit(fused)


@functools.lru_cache(maxsize=16)
def _pallas_rk45_solver_sharded(n_chunks: int, seg_len: float, rtol: float,
                                atol: float, max_steps: int, interpret: bool,
                                block: int, g: int, mesh,
                                tail_len: float = 0.0):
    """shard_map wrapper (lane axis over the mesh, per-shard launches)."""
    from jax.sharding import PartitionSpec

    call = _make_call(n_chunks, seg_len, rtol, atol, max_steps, interpret,
                      block, g, tail_len)

    def fused(coef, y0):
        pmax, y_last, ok, na, nr = call(coef, y0)
        return jnp.concatenate([pmax, y_last, ok, na, nr], axis=0)

    axes = tuple(mesh.axis_names)
    spec = PartitionSpec(None, axes if len(axes) > 1 else axes[0])
    return jax.jit(
        jax.shard_map(
            fused, mesh=mesh,
            in_specs=(spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    ), spec


@dataclasses.dataclass(frozen=True)
class PallasAdaptiveResult:
    P_max: np.ndarray    # (B, 4) f64
    A_end: np.ndarray    # (B, 4) c128 lab frame (last saved grid point)
    ok: np.ndarray       # (B,) bool
    n_accepted: np.ndarray   # (B,) int64
    n_rejected: np.ndarray   # (B,) int64


def solve_batch_rk45_pallas(
    A0: np.ndarray,
    gamma,
    alpha,
    delta_beta,
    *,
    dz_m: float,
    n_steps: int,
    save_every: int,
    rtol: float,
    atol: float,
    max_steps: int = 10_000,
    interpret: bool = False,
    group: int = GROUP,
    block: int = BLOCK,
    mesh=None,
) -> PallasAdaptiveResult:
    """Fused single-launch adaptive (DP45) solve of B instances (rotating
    frame, x32).  Contract mirrors ``parallel/sweep._solve_batch_rk45``:
    save grid ``z_k = k * save_every * dz_m`` (k = 0..n_steps//save_every),
    P_max/A_end over/at saved points, per-lane failure masking.  ``dt0`` =
    ``dz_m`` (the sweep's adaptive lane convention)."""
    A0 = np.asarray(A0, dtype=np.complex128)
    if A0.ndim != 2 or A0.shape[1] != 4:
        raise ValueError(f"A0 must have shape (B, 4), got {A0.shape}")
    B = A0.shape[0]
    n_chunks = int(n_steps) // int(save_every)
    tail_len = (int(n_steps) - n_chunks * int(save_every)) * float(dz_m)
    if n_chunks == 0 and tail_len == 0.0:
        P0 = np.abs(A0) ** 2
        return PallasAdaptiveResult(
            P_max=P0, A_end=A0.copy(), ok=np.isfinite(A0).all(axis=1),
            n_accepted=np.zeros(B, np.int64),
            n_rejected=np.zeros(B, np.int64),
        )
    seg_len = float(save_every) * float(dz_m)
    gamma = np.broadcast_to(np.asarray(gamma, dtype=np.float64), (B,))
    alpha = np.broadcast_to(np.asarray(alpha, dtype=np.float64), (B,))
    dbeta = np.broadcast_to(np.asarray(delta_beta, dtype=np.float64), (B,))

    g = int(group)
    ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    Bp = grouped_pad_target(B, g=g, block=block, ndev=ndev)
    pad = Bp - B

    A0p = pad_rows(A0, pad)
    ga, al, db = (pad_rows(x, pad) for x in (gamma, alpha, dbeta))
    Bl = Bp // g
    G = 4 * g

    coef = np.concatenate([
        rows_scalar(ga, g),                       # gamma  (4g, Bl)
        rows_scalar(al, g),                       # alpha  (4g, Bl)
        rows_scalar(db, g, waves=2),              # dbeta  (2g, Bl)
        np.full((g, Bl), float(dz_m)),            # dt0    (g, Bl)
    ], axis=0).astype(np.float32)
    y0 = np.concatenate(
        [plane_state(A0p.real, g), plane_state(A0p.imag, g)], axis=0
    ).astype(np.float32)

    if mesh is None:
        solver = _pallas_rk45_solver(
            n_chunks, seg_len, float(rtol), float(atol), int(max_steps),
            bool(interpret), int(block), g, tail_len,
        )
        with jax.enable_x64(False):
            out = np.asarray(jax.block_until_ready(
                solver(jnp.asarray(coef), jnp.asarray(y0))
            ))
    else:
        from jax.sharding import NamedSharding

        from ..parallel.mesh import fetch_global, put_global

        solver, spec = _pallas_rk45_solver_sharded(
            n_chunks, seg_len, float(rtol), float(atol), int(max_steps),
            bool(interpret), int(block), g, mesh, tail_len,
        )
        sh = NamedSharding(mesh, spec)
        with jax.enable_x64(False):
            out = jax.block_until_ready(
                solver(put_global(coef, sh), put_global(y0, sh))
            )
        out = np.asarray(fetch_global(out))

    pmax, y_last = out[:G], out[G:3 * G]
    ok, na, nr = out[3 * G:3 * G + g], out[3 * G + g:3 * G + 2 * g], \
        out[3 * G + 2 * g:]

    pmax = unplane(np.asarray(pmax, np.float64), g)[:B]
    yl = np.asarray(y_last, np.float64)
    A_end_rot = (unplane(yl[0:G], g) + 1j * unplane(yl[G:2 * G], g))[:B]
    ok_arr = (np.asarray(ok, np.float64).T.reshape(Bp) > 0.0)[:B]
    na_arr = np.asarray(na, np.float64).T.reshape(Bp)[:B].astype(np.int64)
    nr_arr = np.asarray(nr, np.float64).T.reshape(Bp)[:B].astype(np.int64)

    # lab-frame pump phases at the last saved z (host, f64) -- the same
    # rotation the fixed kernel applies (ops/pallas_solver.py)
    z_last = n_chunks * seg_len
    rot = np.exp(0.5j * dbeta[:B] * z_last)
    A_end = A_end_rot.copy()
    A_end[:, 0] *= rot
    A_end[:, 1] *= rot
    return PallasAdaptiveResult(
        P_max=pmax, A_end=A_end, ok=ok_arr,
        n_accepted=na_arr, n_rejected=nr_arr,
    )
