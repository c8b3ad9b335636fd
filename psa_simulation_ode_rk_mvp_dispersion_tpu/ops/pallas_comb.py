"""Pallas TPU kernel: fused single-launch N-wave comb RK4 solver (x32).

The XLA scan comb solver (``models/nwave.py``) dispatches one HLO loop
iteration per RK4 step; at N=64/B=4096 that leaves ~5x on the table vs the
MXU's matmul rate.  This kernel keeps the whole batched comb state in VMEM
for the entire integration and evaluates the cubic coupling as dense DFT
matmuls on the MXU:

- Layout: state (N, B) per real/imag plane (wave rows x instance lanes);
  forward DFT (L, N) @ (N, B) and inverse (N, L) @ (L, B) land on the MXU.
- Complex matmuls via Karatsuba with host-precomputed summed weights:
  3 real matmuls per transform instead of 4
      F = W A:  p1 = Wr Ar, p2 = Wi Ai, p3 = (Wr+Wi)(Ar+Ai)
                Fr = p1 - p2, Fi = p3 - p1 - p2.
- The cubic product collapses: F^2 conj(F) = F |F|^2 -- one real magnitude
  map instead of a complex triple product.
- RK4 + save-grid P_max reduction + per-lane finite masking identical in
  contract to ``solve_comb_batch`` (rk4, x32).

Per-step algorithmic work per instance: 24 N L real MACs (6 matmuls x 4 RHS
evals) -- at N=64, L=128 a (512-lane) block is ~100 MFLOP/step, dense MXU
food with zero loop-dispatch overhead.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

LANES = 128
BLOCK = 512


def _dft_weight_planes(n: int):
    """Forward (L, N) and inverse (N, L) DFT factor planes (r, i, r+i)."""
    from ..models.nwave import _fft_len

    L = _fft_len(n)
    jj = np.arange(L)
    ang_f = (-2.0 * np.pi / L) * np.outer(jj, np.arange(n))        # (L, N)
    ang_i = (2.0 * np.pi / L) * np.outer(np.arange(n), jj)         # (N, L)
    fr, fi = np.cos(ang_f), np.sin(ang_f)
    ir, ii = np.cos(ang_i) / L, np.sin(ang_i) / L
    f32 = np.float32
    return (
        fr.astype(f32), fi.astype(f32), (fr + fi).astype(f32),
        ir.astype(f32), ii.astype(f32), (ir + ii).astype(f32),
        L,
    )


def _kernel_body(n_steps: int, save_every: int, n: int, L: int, dz: float,
                 mxu_precision: str = "highest"):
    dz = float(dz)
    c_half = np.float32(0.5 * dz)
    c_full = np.float32(dz)
    c_sixth = np.float32(dz / 6.0)

    def kernel(fr_ref, fi_ref, fs_ref, ir_ref, ii_ref, is_ref,
               beta_ref, gamma_ref, alpha_ref, y0_ref,
               pmax_ref, ylast_ref, ok_ref):
        fr = fr_ref[:, :]
        fi = fi_ref[:, :]
        fs = fs_ref[:, :]
        ivr = ir_ref[:, :]
        ivi = ii_ref[:, :]
        ivs = is_ref[:, :]
        beta = beta_ref[:, :]          # (N, B)
        gamma = gamma_ref[:, :]        # (1, B)
        neg_half_alpha = alpha_ref[:, :] * np.float32(-0.5)  # (1, B)

        y0_all = y0_ref[:, :]
        ar0 = y0_all[0:n, :]
        ai0 = y0_all[n:2 * n, :]

        f32 = jnp.float32

        # Mosaic supports only DEFAULT and HIGHEST dot precisions
        prec = {
            "highest": lax.Precision.HIGHEST,  # multi-pass bf16 = full f32
            "default": lax.Precision.DEFAULT,  # 1-pass bf16 (fast, lossy)
        }[mxu_precision]

        def mm(w, x):
            # HIGHEST keeps the f32 mantissa through the MXU (the default is
            # single-pass bf16: ~1e-2 relative after 1000 cascaded steps)
            return lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=prec,
            )

        def rhs(ar, ai):
            # forward DFT (Karatsuba complex matmul, 3 real matmuls)
            p1 = mm(fr, ar)
            p2 = mm(fi, ai)
            p3 = mm(fs, ar + ai)
            Fr = p1 - p2
            Fi = p3 - p1 - p2
            # cubic product: F^2 conj(F) = F |F|^2
            mag = Fr * Fr + Fi * Fi
            Gr = Fr * mag
            Gi = Fi * mag
            # inverse DFT
            q1 = mm(ivr, Gr)
            q2 = mm(ivi, Gi)
            q3 = mm(ivs, Gr + Gi)
            Tr = q1 - q2
            Ti = q3 - q1 - q2
            # dA = (-alpha/2) A + i beta A + i gamma T
            dr = neg_half_alpha * ar - beta * ai - gamma * Ti
            di = neg_half_alpha * ai + beta * ar + gamma * Tr
            return dr, di

        def rk4(ar, ai):
            k1r, k1i = rhs(ar, ai)
            k2r, k2i = rhs(ar + c_half * k1r, ai + c_half * k1i)
            k3r, k3i = rhs(ar + c_half * k2r, ai + c_half * k2i)
            k4r, k4i = rhs(ar + c_full * k3r, ai + c_full * k3i)
            two = np.float32(2.0)
            return (
                ar + c_sixth * (k1r + two * (k2r + k3r) + k4r),
                ai + c_sixth * (k1i + two * (k2i + k3i) + k4i),
            )

        pmax0 = ar0 * ar0 + ai0 * ai0
        ok0 = jnp.ones_like(ar0[0:1, :])

        def step(i, carry):
            ar, ai, lr, li, pmax, ok = carry
            ar_n, ai_n = rk4(ar, ai)
            fin = (
                jnp.all(ar_n == ar_n, axis=0, keepdims=True)
                & jnp.all(ai_n == ai_n, axis=0, keepdims=True)
                & jnp.all(jnp.abs(ar_n) < np.float32(3.4e38), axis=0, keepdims=True)
                & jnp.all(jnp.abs(ai_n) < np.float32(3.4e38), axis=0, keepdims=True)
            )
            ok_n = ok * fin.astype(f32)
            alive = ok_n > np.float32(0.0)
            ar_o = jnp.where(alive, ar_n, ar)
            ai_o = jnp.where(alive, ai_n, ai)
            at_save = ((i + jnp.int32(1)) % jnp.int32(save_every)) == jnp.int32(0)
            P = ar_o * ar_o + ai_o * ai_o
            upd = jnp.logical_and(at_save, P > pmax)
            pmax_o = jnp.where(upd, P, pmax)
            lr_o = jnp.where(at_save, ar_o, lr)
            li_o = jnp.where(at_save, ai_o, li)
            return (ar_o, ai_o, lr_o, li_o, pmax_o, ok_n)

        ar, ai, lr, li, pmax, ok = lax.fori_loop(
            0, n_steps, step, (ar0, ai0, ar0, ai0, pmax0, ok0)
        )
        pmax_ref[:, :] = pmax
        ylast_ref[:, :] = jnp.concatenate([lr, li], axis=0)
        ok_ref[:, :] = ok

    return kernel


def _make_comb_call(
    n_steps: int, save_every: int, n: int, dz: float, interpret: bool, block: int,
    mxu_precision: str = "highest",
):
    from jax.experimental import pallas as pl

    fr, fi, fs, ir, ii, is_, L = _dft_weight_planes(n)
    kernel = _kernel_body(n_steps, save_every, n, L, dz, mxu_precision)

    w_f = [jnp.asarray(fr), jnp.asarray(fi), jnp.asarray(fs)]
    w_i = [jnp.asarray(ir), jnp.asarray(ii), jnp.asarray(is_)]

    def call(beta, gamma, alpha, y0):
        B = y0.shape[1]
        blk = min(block, B)
        grid = (B // blk,)
        spec_kwargs = {}
        if not interpret:
            from jax.experimental.pallas import tpu as pltpu

            spec_kwargs = {"memory_space": pltpu.VMEM}
        rep_f = pl.BlockSpec((L, n), lambda i: (0, 0), **spec_kwargs)
        rep_i = pl.BlockSpec((n, L), lambda i: (0, 0), **spec_kwargs)
        in_specs = [
            rep_f, rep_f, rep_f, rep_i, rep_i, rep_i,
            pl.BlockSpec((n, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((1, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((1, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((2 * n, blk), lambda i: (0, i), **spec_kwargs),
        ]
        out_specs = (
            pl.BlockSpec((n, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((2 * n, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((1, blk), lambda i: (0, i), **spec_kwargs),
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((n, B), jnp.float32),
                jax.ShapeDtypeStruct((2 * n, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
            ),
            interpret=interpret,
        )(*w_f, *w_i, beta, gamma, alpha, y0)

    return call


@functools.lru_cache(maxsize=32)
def _pallas_comb_solver(
    n_steps: int, save_every: int, n: int, dz: float, interpret: bool, block: int,
    mxu_precision: str = "highest",
):
    call = _make_comb_call(
        n_steps, save_every, n, dz, interpret, block, mxu_precision
    )

    def fused(bt, g, a, y0):
        # one stacked output: each device->host fetch costs a ~30 ms tunnel
        # round trip regardless of size (docs/PERF.md rule 7)
        pmax, y_last, ok = call(bt, g, a, y0)
        return jnp.concatenate([pmax, y_last, ok], axis=0)

    return jax.jit(fused)


@functools.lru_cache(maxsize=16)
def _pallas_comb_solver_sharded(
    n_steps: int, save_every: int, n: int, dz: float, interpret: bool, block: int,
    mxu_precision: str, mesh,
):
    """shard_map-wrapped comb kernel: lane (batch) axis split over the mesh;
    the DFT weight planes are closure constants, replicated to every shard."""
    from jax.sharding import PartitionSpec

    call = _make_comb_call(n_steps, save_every, n, dz, interpret, block,
                           mxu_precision)

    def fused(bt, g, a, y0):
        pmax, y_last, ok = call(bt, g, a, y0)
        return jnp.concatenate([pmax, y_last, ok], axis=0)

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


def solve_comb_batch_pallas(
    A0: np.ndarray,
    gamma,
    alpha,
    beta_lin,
    *,
    dz_m: float,
    n_steps: int,
    save_every: int,
    interpret: bool = False,
    block: int = BLOCK,
    mxu_precision: str = "highest",
    mesh=None,
):
    """Fused-kernel comb solve; contract mirrors ``nwave.solve_comb_batch``
    (rk4, x32): returns host ``(P_max (B, N), A_final (B, N), ok (B,))``.

    ``A0`` is ``(B, N)`` complex; ``gamma``/``alpha`` broadcast to ``(B,)``;
    ``beta_lin`` broadcasts to ``(B, N)``.  Pass ``mesh`` to shard the batch
    axis with ``shard_map`` (per-shard kernel launch, no collectives).
    """
    A0 = np.asarray(A0, dtype=np.complex128)
    if A0.ndim != 2:
        raise ValueError(f"A0 must have shape (B, N), got {A0.shape}")
    B, n = A0.shape
    gamma = np.broadcast_to(np.asarray(gamma, dtype=np.float64), (B,))
    alpha = np.broadcast_to(np.asarray(alpha, dtype=np.float64), (B,))
    beta = np.broadcast_to(np.asarray(beta_lin, dtype=np.float64), (B, n))

    # VMEM-fit auto block: ~24 (L, blk) f32 planes live through the RK4 body
    # plus 12 (L, N) weight planes (measured on v5e; 16 MB VMEM, keep 2 MB
    # headroom).  Wider combs must take narrower lane blocks.
    from ..models.nwave import _fft_len

    L = _fft_len(n)
    budget = 14 * 1024 * 1024 - 12 * L * n * 4
    blk_fit = (budget // (24 * L * 4)) // LANES * LANES
    if blk_fit < LANES:
        raise ValueError(
            f"comb too wide for the fused kernel (N={n}, L={L}): weight + "
            f"state planes exceed VMEM even at a {LANES}-lane block; use the "
            "scan engine"
        )
    block = int(min(block, blk_fit))

    ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    mult = ndev * (block if B >= ndev * block else LANES)
    Bp = ((B + mult - 1) // mult) * mult
    pad = Bp - B

    def padded(x):
        return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]) if pad else x

    A0p = padded(A0)
    g = padded(gamma).astype(np.float32)[None, :]
    a = padded(alpha).astype(np.float32)[None, :]
    bt = padded(beta).astype(np.float32).T            # (N, Bp)
    y0 = np.concatenate(
        [A0p.real.T.astype(np.float32), A0p.imag.T.astype(np.float32)], axis=0
    )  # (2N, Bp)

    if mesh is None:
        solver = _pallas_comb_solver(
            int(n_steps), int(save_every), int(n), float(dz_m), bool(interpret),
            int(block), str(mxu_precision),
        )
        args = (jnp.asarray(bt), jnp.asarray(g), jnp.asarray(a), jnp.asarray(y0))
        with jax.enable_x64(False):
            out = jax.block_until_ready(solver(*args))
        out = np.asarray(out, np.float64)     # ONE fetch of (3N+1, Bp)
        pmax, y_last, ok = out[:n], out[n:3 * n], out[3 * n:]
    else:
        from jax.sharding import NamedSharding

        from ..parallel.mesh import put_global

        solver, spec = _pallas_comb_solver_sharded(
            int(n_steps), int(save_every), int(n), float(dz_m), bool(interpret),
            int(block), str(mxu_precision), mesh,
        )
        sh = NamedSharding(mesh, spec)
        args = tuple(put_global(x, sh) for x in (bt, g, a, y0))
        with jax.enable_x64(False):
            fused_out = jax.block_until_ready(solver(*args))
        from ..parallel.mesh import fetch_global

        out = np.asarray(fetch_global(fused_out), np.float64)
        pmax, y_last, ok = out[:n], out[n:3 * n], out[3 * n:]

    pmax = np.asarray(pmax, np.float64).T[:B]
    yl = np.asarray(y_last, np.float64)
    A_final = (yl[0:n] + 1j * yl[n:2 * n]).T[:B]
    ok_arr = np.asarray(ok, np.float64)[0, :B] > 0.0
    return pmax, A_final, ok_arr


def solve_batch_pallas_comb_result(
    A0, gamma, alpha, beta_lin, *, dz_m, n_steps, save_every, interpret=False,
    mesh=None,
):
    """``nwave.solve_comb_batch``-shaped wrapper: (P_max, A_final, ok)."""
    return solve_comb_batch_pallas(
        A0, gamma, alpha, beta_lin,
        dz_m=dz_m, n_steps=n_steps, save_every=save_every, interpret=interpret,
        mesh=mesh,
    )
