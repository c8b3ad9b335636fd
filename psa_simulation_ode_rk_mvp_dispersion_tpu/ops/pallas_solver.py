"""Pallas TPU kernel: fused batched RK4 solve of the 4-wave FWM system.

Why a kernel when XLA already runs the scan: profiling the x32 scan solver on
a v5e shows ~60-70 us per RK4 step for a 10^4-instance batch -- sequencer /
loop-dispatch overhead, not compute (the VPU work per step is ~1-2 us) nor
HBM (state is ~320 KB).  This kernel runs the ENTIRE z-integration in one
``pallas_call``: state, coefficients and running reductions live in VMEM for
all ``n_steps``; nothing touches HBM between steps and there is no per-step
dispatch.

Data layout (the (8, 128) f32 VPU tile, pallas_guide.md "Tiling Constraints"):
state is ``(8, B)`` float32 -- rows 0..3 the real parts of [p1, p2, s, i],
rows 4..7 the imaginary parts; every RHS term is a row-slice + lane-wise op.
B is padded to a multiple of 128 lanes.

Physics: the rotating-frame (autonomous) RHS -- identical term structure to
``ops/rhs.rhs_yaman_autonomous`` -- so the kernel needs no z argument and no
transcendentals.  Reductions (running max power over saved samples, last
saved state, per-lane finite mask) match ``ops/integrators.integrate_reduce``
semantics: samples at step multiples of ``save_every`` plus the initial state;
NaN lanes freeze at their last finite state.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

LANES = 128
BLOCK = 2048  # lanes per grid cell.  Mosaic compile time is wildly
              # non-monotonic in block width (measured on v5e: 128 -> 124 s,
              # 256 -> 2 s, 512 -> 102 s, 1024/2048 -> ~1 s); 2048 pairs the
              # fastest runtime (75k points/s) with ~1 s compiles


def _kernel_body(n_steps: int, save_every: int):
    """Returns the pallas kernel closed over static loop bounds."""

    def kernel(coef_ref, y0_ref, pmax_ref, yf_ref, ok_ref):
        # coef_ref (4, B): [gamma, alpha, dbeta, dz]; y0_ref (8, B)
        gamma = coef_ref[0:1, :]
        alpha = coef_ref[1:2, :]
        dbeta = coef_ref[2:3, :]
        dz = coef_ref[3:4, :]       # per-lane copy of the (uniform) step
        neg_half_alpha = -0.5 * alpha
        half_db = 0.5 * dbeta
        two_gamma = 2.0 * gamma

        def rhs(y):
            re = y[0:4, :]
            im = y[4:8, :]
            P = re * re + im * im                          # (4, B)
            tot = P[0:1, :] + P[1:2, :] + P[2:3, :] + P[3:4, :]
            F = 2.0 * tot - P
            gF = gamma * F
            # loss + Kerr: (-a/2) A + i gF A
            d_re = neg_half_alpha * re - gF * im
            d_im = neg_half_alpha * im + gF * re

            # FWM: i * 2g * [conj(a2) s34, conj(a1) s34, conj(a4) s12, conj(a3) s12]
            r1, r2, r3, r4 = re[0:1], re[1:2], re[2:3], re[3:4]
            i1, i2, i3, i4 = im[0:1], im[1:2], im[2:3], im[3:4]
            s34_re = r3 * r4 - i3 * i4
            s34_im = r3 * i4 + i3 * r4
            s12_re = r1 * r2 - i1 * i2
            s12_im = r1 * i2 + i1 * r2
            # conj(a) * s = (ar - i ai)(sr + i si)
            t1_re = r2 * s34_re + i2 * s34_im
            t1_im = r2 * s34_im - i2 * s34_re
            t2_re = r1 * s34_re + i1 * s34_im
            t2_im = r1 * s34_im - i1 * s34_re
            t3_re = r4 * s12_re + i4 * s12_im
            t3_im = r4 * s12_im - i4 * s12_re
            t4_re = r3 * s12_re + i3 * s12_im
            t4_im = r3 * s12_im - i3 * s12_re
            t_re = jnp.concatenate([t1_re, t2_re, t3_re, t4_re], axis=0)
            t_im = jnp.concatenate([t1_im, t2_im, t3_im, t4_im], axis=0)
            # i * (2g) * t : re += -2g t_im ; im += 2g t_re
            d_re = d_re - two_gamma * t_im
            d_im = d_im + two_gamma * t_re

            # pump detuning: i * (-db/2) * a on waves 0,1
            det_re = half_db * im[0:2, :]
            det_im = -half_db * re[0:2, :]
            zero = jnp.zeros_like(det_re)
            d_re = d_re + jnp.concatenate([det_re, zero], axis=0)
            d_im = d_im + jnp.concatenate([det_im, zero], axis=0)
            return jnp.concatenate([d_re, d_im], axis=0)

        def rk4(y):
            k1 = rhs(y)
            k2 = rhs(y + (0.5 * dz) * k1)
            k3 = rhs(y + (0.5 * dz) * k2)
            k4 = rhs(y + dz * k3)
            return y + (dz / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)

        def powers(y):
            re = y[0:4, :]
            im = y[4:8, :]
            return re * re + im * im

        y0 = y0_ref[:, :]
        pmax0 = powers(y0)
        ok0 = jnp.ones_like(y0[0:1, :])  # 1.0 = healthy lane

        n_chunks = n_steps // save_every
        remainder = n_steps - n_chunks * save_every

        # chunked loop (round 3): inner fori = RK4 + per-step freeze only
        # (one fused finite reduction; NaN compares false against the f32
        # max bound); save-grid bookkeeping at chunk boundaries.  Per-step
        # freeze semantics and every saved observable are unchanged.
        def step(_i, carry):
            y, ok = carry
            y_new = rk4(y)
            fin = jnp.all(
                jnp.abs(y_new) < jnp.asarray(3.4e38, jnp.float32),
                axis=0, keepdims=True,
            )
            ok_new = ok * fin.astype(jnp.float32)
            y_out = jnp.where(ok_new > 0.0, y_new, y)
            return (y_out, ok_new)

        def chunk(_c, carry):
            y, y_last, pmax, ok = carry
            y, ok = lax.fori_loop(0, save_every, step, (y, ok))
            pmax = jnp.maximum(pmax, powers(y))
            return (y, y, pmax, ok)

        y, y_last, pmax, ok = lax.fori_loop(
            0, n_chunks, chunk, (y0, y0, pmax0, ok0)
        )
        if remainder > 0:
            # trailing partial steps: integrated (can flip ok), unobserved
            _y, ok = lax.fori_loop(0, remainder, step, (y, ok))
        pmax_ref[:, :] = pmax
        yf_ref[:, :] = y_last
        ok_ref[:, :] = ok

    return kernel


@functools.lru_cache(maxsize=64)
def _pallas_solver(n_steps: int, save_every: int, interpret: bool):
    from jax.experimental import pallas as pl

    kernel = _kernel_body(n_steps, save_every)

    def call(coef, y0):
        B = y0.shape[1]
        blk = min(BLOCK, B)
        grid = (B // blk,)
        if interpret:
            in_specs = [
                pl.BlockSpec((4, blk), lambda i: (0, i)),
                pl.BlockSpec((8, blk), lambda i: (0, i)),
            ]
            out_specs = (
                pl.BlockSpec((4, blk), lambda i: (0, i)),
                pl.BlockSpec((8, blk), lambda i: (0, i)),
                pl.BlockSpec((1, blk), lambda i: (0, i)),
            )
        else:
            from jax.experimental.pallas import tpu as pltpu

            in_specs = [
                pl.BlockSpec((4, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ]
            out_specs = (
                pl.BlockSpec((4, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((4, B), jnp.float32),
                jax.ShapeDtypeStruct((8, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
            ),
            interpret=interpret,
        )(coef, y0)

    def fused(coef, y0):
        pmax, y_last, ok = call(coef, y0)
        return jnp.concatenate([pmax, y_last, ok], axis=0)  # (13, B)

    return jax.jit(fused)


@dataclasses.dataclass(frozen=True)
class PallasBatchResult:
    P_max: np.ndarray   # (B, 4) f64
    A_end: np.ndarray   # (B, 4) c128 lab frame (last saved sample)
    ok: np.ndarray      # (B,) bool


def solve_batch_pallas(
    A0: np.ndarray,
    gamma,
    alpha,
    delta_beta,
    *,
    dz_m: float,
    n_steps: int,
    save_every: int,
    interpret: bool = False,
    group: int = None,
    mesh=None,
) -> PallasBatchResult:
    """Fused single-launch x32 solve of B instances (rotating frame).

    Same contract as ``df32_solver.solve_batch_df32`` at x32 precision.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    ``group`` packs that many instances per lane column (default GROUP=8 on
    the compiled path -- full tile occupancy; see ``_kernel_body_grouped``).
    """
    A0 = np.asarray(A0, dtype=np.complex128)
    if A0.ndim != 2 or A0.shape[1] != 4:
        raise ValueError(f"A0 must have shape (B, 4), got {A0.shape}")
    B = A0.shape[0]
    gamma = np.broadcast_to(np.asarray(gamma, dtype=np.float64), (B,))
    alpha = np.broadcast_to(np.asarray(alpha, dtype=np.float64), (B,))
    dbeta = np.broadcast_to(np.asarray(delta_beta, dtype=np.float64), (B,))

    if group is None:
        group = GROUP
    if group > 1:
        return _solve_grouped_x32(
            A0, gamma, alpha, dbeta, dz_m=dz_m, n_steps=n_steps,
            save_every=save_every, interpret=interpret,
            block=BLOCK_GROUPED, g=int(group), mesh=mesh,
        )
    if mesh is not None:
        raise ValueError("mesh sharding requires the grouped kernel (group > 1)")

    # pad lanes to a multiple of the block (edge-replicate: padding is benign)
    mult = BLOCK if B >= BLOCK else LANES
    Bp = ((B + mult - 1) // mult) * mult
    pad = Bp - B

    def padded(x):
        return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]) if pad else x

    A0p = padded(A0)
    coef = np.stack(
        [padded(gamma), padded(alpha), padded(dbeta),
         np.full(Bp, float(dz_m))], axis=0
    ).astype(np.float32)  # (4, Bp)
    y0 = np.concatenate([A0p.real.T, A0p.imag.T], axis=0).astype(np.float32)  # (8, Bp)

    solver = _pallas_solver(int(n_steps), int(save_every), bool(interpret))
    # Pallas' TPU lowering hits a RecursionError under jax_enable_x64 (the
    # kernel is pure f32 anyway); trace/compile/run it with x64 off.
    with jax.enable_x64(False):
        out = np.asarray(jax.block_until_ready(
            solver(jnp.asarray(coef), jnp.asarray(y0))
        ))                                  # ONE fetch of (13, Bp)
    pmax, y_last, ok = out[:4], out[4:12], out[12:]

    pmax = np.asarray(pmax, np.float64).T[:B]          # (B, 4)
    y_last = np.asarray(y_last, np.float64)
    A_end_rot = (y_last[0:4].T + 1j * y_last[4:8].T)[:B]
    ok_arr = np.asarray(ok, np.float64)[0, :B] > 0.0

    # lab-frame pump phases at last saved z (host, f64)
    n_chunks = int(n_steps) // int(save_every)
    z_last = n_chunks * int(save_every) * float(dz_m)
    rot = np.exp(0.5j * dbeta * z_last)
    A_end = A_end_rot.copy()
    A_end[:, 0] *= rot
    A_end[:, 1] *= rot

    return PallasBatchResult(P_max=pmax, A_end=A_end, ok=ok_arr)


# ---------------------------------------------------------------------------
# Grouped-lane kernel: g instances per lane column (wave-major row groups)
# ---------------------------------------------------------------------------
#
# The ungrouped kernel's FWM section is 12 products over (1, B) single-row
# slices -- 1/8 sublane occupancy on the (8, 128) f32 tile.  Grouping packs
# g instances per lane column: every wave slice becomes a contiguous
# (g, B/g) plane and g=8 fills tiles exactly.  Same trick as the df32
# kernel (ops/pallas_df32.py), measured there at +54% throughput.

GROUP = 8
BLOCK_GROUPED = 256


def _kernel_body_grouped(n_steps: int, save_every: int, g: int):
    G = 4 * g

    def kernel(coef_ref, y0_ref, pmax_ref, yf_ref, ok_ref):
        coef = coef_ref[:, :]
        gamma = coef[0:G, :]              # per-member, replicated per wave
        neg_half_alpha = -0.5 * coef[G:2 * G, :]
        half_db = 0.5 * coef[2 * G:2 * G + 2 * g, :]   # waves 0,1 rows only
        dz = coef[2 * G + 2 * g:2 * G + 2 * g + 1, :]  # (1, B)
        two_gamma = 2.0 * gamma

        def tile4(t):
            return jnp.concatenate([t] * 4, axis=0)

        def rhs(y):
            re = y[0:G, :]
            im = y[G:2 * G, :]
            P = re * re + im * im                       # (4g, B)
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

        def rk4(y):
            k1 = rhs(y)
            k2 = rhs(y + (0.5 * dz) * k1)
            k3 = rhs(y + (0.5 * dz) * k2)
            k4 = rhs(y + dz * k3)
            return y + (dz / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)

        def powers(y):
            re = y[0:G, :]
            im = y[G:2 * G, :]
            return re * re + im * im

        y0 = y0_ref[:, :]
        pmax0 = powers(y0)
        ok0 = jnp.ones_like(y0[0:g, :])

        def memall(m):
            # (8g, B) boolean plane -> (g, B): all 8 rows of each member
            out = m[0:g]
            for k in range(1, 8):
                out = out & m[k * g:(k + 1) * g]
            return out

        n_chunks = n_steps // save_every
        remainder = n_steps - n_chunks * save_every

        def step(_i, carry):
            y, ok = carry
            y_new = rk4(y)
            fin = memall(jnp.abs(y_new) < jnp.asarray(3.4e38, jnp.float32))
            ok_new = ok * fin.astype(jnp.float32)
            # concat the f32 mask, not booleans (Mosaic cannot cast i1 vregs)
            alive = jnp.concatenate([ok_new] * 8, axis=0) > 0.0
            y_out = jnp.where(alive, y_new, y)
            return (y_out, ok_new)

        def chunk(_c, carry):
            y, y_last, pmax, ok = carry
            y, ok = lax.fori_loop(0, save_every, step, (y, ok))
            pmax = jnp.maximum(pmax, powers(y))
            return (y, y, pmax, ok)

        y, y_last, pmax, ok = lax.fori_loop(
            0, n_chunks, chunk, (y0, y0, pmax0, ok0)
        )
        if remainder > 0:
            # trailing partial steps: integrated (can flip ok), unobserved
            _y, ok = lax.fori_loop(0, remainder, step, (y, ok))
        pmax_ref[:, :] = pmax
        yf_ref[:, :] = y_last
        ok_ref[:, :] = ok

    return kernel


def _make_call_grouped(n_steps: int, save_every: int, interpret: bool,
                       block: int, g: int):
    from jax.experimental import pallas as pl

    kernel = _kernel_body_grouped(n_steps, save_every, g)
    G = 4 * g
    n_coef = 2 * G + 2 * g + 1

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
        out_specs = (
            pl.BlockSpec((G, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((2 * G, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((g, blk), lambda i: (0, i), **spec_kwargs),
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((G, B), jnp.float32),
                jax.ShapeDtypeStruct((2 * G, B), jnp.float32),
                jax.ShapeDtypeStruct((g, B), jnp.float32),
            ),
            interpret=interpret,
        )(coef, y0)

    return call


@functools.lru_cache(maxsize=64)
def _pallas_solver_grouped(n_steps: int, save_every: int, interpret: bool,
                           block: int, g: int):
    call = _make_call_grouped(n_steps, save_every, interpret, block, g)

    def fused(coef, y0):
        # one stacked output: every separate device->host fetch costs a full
        # tunnel round trip (~30 ms) regardless of size (docs/PERF.md)
        pmax, y_last, ok = call(coef, y0)
        return jnp.concatenate([pmax, y_last, ok], axis=0)

    return jax.jit(fused)


@functools.lru_cache(maxsize=16)
def _pallas_solver_grouped_sharded(n_steps: int, save_every: int,
                                   interpret: bool, block: int, g: int, mesh):
    """shard_map-wrapped grouped x32 kernel (lane axis split over the mesh,
    per-shard pallas launch, no collectives -- same pattern as pallas_df32)."""
    from jax.sharding import PartitionSpec

    call = _make_call_grouped(n_steps, save_every, interpret, block, g)

    def fused(coef, y0):
        pmax, y_last, ok = call(coef, y0)
        return jnp.concatenate([pmax, y_last, ok], axis=0)  # (3G+g, Bl)

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


def _solve_grouped_x32(A0, gamma, alpha, dbeta, *, dz_m, n_steps, save_every,
                       interpret, block, g, mesh=None):
    from .lane_groups import grouped_pad_target, pad_rows, plane_state, rows_scalar, unplane as _unplane

    B = A0.shape[0]
    ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    Bp = grouped_pad_target(B, g=g, block=block, ndev=ndev)
    pad = Bp - B

    A0p = pad_rows(A0, pad)
    ga, al, db = (pad_rows(x, pad) for x in (gamma, alpha, dbeta))
    Bl = Bp // g
    G = 4 * g

    coef = np.concatenate([
        rows_scalar(ga, g),                # gamma      (4g, Bl)
        rows_scalar(al, g),                # alpha      (4g, Bl)
        rows_scalar(db, g, waves=2),       # dbeta      (2g, Bl)
        np.full((1, Bl), float(dz_m)),     # dz         (1, Bl)
    ], axis=0).astype(np.float32)
    y0 = np.concatenate(
        [plane_state(A0p.real, g), plane_state(A0p.imag, g)], axis=0
    ).astype(np.float32)  # (8g, Bl)

    if mesh is None:
        solver = _pallas_solver_grouped(
            int(n_steps), int(save_every), bool(interpret), int(block), g
        )
        coef_dev, y0_dev = jnp.asarray(coef), jnp.asarray(y0)
        with jax.enable_x64(False):
            out = jax.block_until_ready(solver(coef_dev, y0_dev))
        out = np.asarray(out)                # ONE fetch of (3G + g, Bl)
        pmax, y_last, ok = out[:G], out[G:3 * G], out[3 * G:]
    else:
        from jax.sharding import NamedSharding

        from ..parallel.mesh import put_global

        solver, spec = _pallas_solver_grouped_sharded(
            int(n_steps), int(save_every), bool(interpret), int(block), g, mesh
        )
        sh = NamedSharding(mesh, spec)
        coef_dev = put_global(coef, sh)
        y0_dev = put_global(y0, sh)
        with jax.enable_x64(False):
            fused_out = jax.block_until_ready(solver(coef_dev, y0_dev))
        from ..parallel.mesh import fetch_global

        out = np.asarray(fetch_global(fused_out))
        pmax, y_last, ok = out[:G], out[G:3 * G], out[3 * G:]

    pmax = _unplane(np.asarray(pmax, np.float64), g)[:B]
    yl = np.asarray(y_last, np.float64)
    A_end_rot = (_unplane(yl[0:G], g) + 1j * _unplane(yl[G:2 * G], g))[:B]
    ok_arr = (np.asarray(ok, np.float64).T.reshape(Bp) > 0.0)[:B]

    n_chunks = int(n_steps) // int(save_every)
    z_last = n_chunks * int(save_every) * float(dz_m)
    rot = np.exp(0.5j * dbeta * z_last)
    A_end = A_end_rot.copy()
    A_end[:, 0] *= rot
    A_end[:, 1] *= rot
    return PallasBatchResult(P_max=pmax, A_end=A_end, ok=ok_arr)
