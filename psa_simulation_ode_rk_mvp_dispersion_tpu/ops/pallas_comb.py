"""Pallas TPU kernel: fused single-launch N-wave comb RK4 solver (x32).

The XLA scan comb solver (``models/nwave.py``) dispatches one HLO loop
iteration per RK4 step; at N=64/B=4096 that leaves ~5x on the table vs the
MXU's matmul rate.  This kernel keeps the whole batched comb state in VMEM
for the entire integration and evaluates the cubic coupling as dense DFT
matmuls on the MXU:

- Layout: state (N, B) per real/imag plane (wave rows x instance lanes);
  forward DFT (L, N) @ (N, B) and inverse (N, L) @ (L, B) land on the MXU.
- Two matmul formulations (``variant``):
  * ``'karatsuba'``: 3 real matmuls per transform with host-precomputed
    summed weights (F = W A: p1 = Wr Ar, p2 = Wi Ai, p3 = (Wr+Wi)(Ar+Ai);
    Fr = p1 - p2, Fi = p3 - p1 - p2) -- minimal MACs (3 N L), but the
    forward contraction is only N lanes deep (half the 128-wide MXU at
    N=64).
  * ``'block'``: the 4-real-matmul complex product arranged as 2 matmuls
    over the STACKED state u = [Ar; Ai]: Fr = [Wr | -Wi] u, Fi = [Wi | Wr] u
    -- 4/3 the MACs of Karatsuba but full-width contractions (2N forward,
    2L inverse) and 2 dispatches per transform instead of 3.  Measured
    faster on v5e at N=64 (round 3); the numerical result differs only at
    f32 rounding.
- The cubic product collapses: F^2 conj(F) = F |F|^2 -- one real magnitude
  map instead of a complex triple product.
- The step loop is CHUNKED: an inner fori over ``save_every`` steps does
  only RK4 + per-step NaN freeze (one fused |u| reduction per step); the
  save-grid P_max / y_last bookkeeping runs once per chunk boundary.
  Per-step freeze semantics match ``ops/integrators._steps_chunk`` (a lane
  that blows up mid-chunk keeps its last good step state, which the next
  save boundary then observes -- identical contract to the scan engine).
- RK4 + save-grid P_max reduction + per-lane finite masking identical in
  contract to ``solve_comb_batch`` (rk4, x32).

Per-step algorithmic work per instance: 24 N L real MACs (karatsuba) or
32 N L (block) across 4 RHS evals -- at N=64, L=128 a 512-lane block is
~100-130 MFLOP/step, dense MXU food with zero loop-dispatch overhead.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

LANES = 128
BLOCK = 1024     # best measured lane block (round-3 A/B; VMEM-fit capped)
DEFAULT_VARIANT = "block"


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


def _dft_weight_blocks(n: int):
    """Block-complex weights: forward [Wr|-Wi] / [Wi|Wr] (L, 2N) pairs and
    inverse (N, 2L) pairs (the 4-real-matmul complex product as 2 wide
    matmuls; full-width MXU contractions)."""
    fr, fi, _fs, ir, ii, _is, L = _dft_weight_planes(n)
    f_re = np.concatenate([fr, -fi], axis=1)     # (L, 2N)
    f_im = np.concatenate([fi, fr], axis=1)      # (L, 2N)
    i_re = np.concatenate([ir, -ii], axis=1)     # (N, 2L)
    i_im = np.concatenate([ii, ir], axis=1)      # (N, 2L)
    return f_re, f_im, i_re, i_im, L


def _dft_weight_stacked(n: int):
    """Fully stacked complex-as-real weights: ONE forward matmul
    [Fr; Fi] = W_f @ [Ar; Ai] with W_f = [[Wr -Wi]; [Wi Wr]] (2L, 2N), and
    one inverse (2N, 2L).  Same MACs as the 'block' pair with half the dot
    dispatches -- but measured on v5e (round 3, noise-controlled A/B) it is
    NOT faster than 'block' (Mosaic pipelines the pair dots; the stacked
    matmul pays back the saved dispatch in row-slice layout ops).  Kept for
    A/B and for future hardware where dispatch latency dominates."""
    f_re, f_im, i_re, i_im, L = _dft_weight_blocks(n)
    w_f = np.concatenate([f_re, f_im], axis=0)   # (2L, 2N)
    w_i = np.concatenate([i_re, i_im], axis=0)   # (2N, 2L)
    return w_f, w_i, L


def _kernel_body(n_steps: int, save_every: int, n: int, L: int, dz: float,
                 mxu_precision: str = "highest", variant: str = DEFAULT_VARIANT,
                 integrator: str = "rk4"):
    dz = float(dz)
    c_half = np.float32(0.5 * dz)
    c_full = np.float32(dz)
    c_sixth = np.float32(dz / 6.0)
    c_24 = np.float32(dz / 24.0)
    if integrator not in ("rk4", "ab4", "abm4"):
        raise ValueError(
            f"integrator must be 'rk4', 'ab4' or 'abm4', got {integrator!r}"
        )
    multistep = integrator != "rk4"
    n_chunks = n_steps // save_every
    remainder = n_steps - n_chunks * save_every

    f32 = jnp.float32
    # Mosaic supports only DEFAULT and HIGHEST dot precisions; 'x3' is a
    # MANUAL compensated split (the ops/pallas_gnlse DOT_ALG scheme): both
    # operands split into (hi, lo) bf16 planes and w@x ~= wh@xh + (wh@xl +
    # wl@xh) -- 3 full-rate bf16 MXU passes vs HIGHEST's 6, dropping only
    # the ~2^-18-relative wl@xl term.  Weight splits are hoisted out of the
    # step loops (loop constants); operand splits are 2 VPU ops per matmul.
    if mxu_precision not in ("highest", "default", "x3"):
        raise ValueError(
            f"mxu_precision must be 'highest', 'default' or 'x3', "
            f"got {mxu_precision!r}"
        )
    x3 = mxu_precision == "x3"
    prec = (lax.Precision.DEFAULT if mxu_precision == "default"
            else lax.Precision.HIGHEST)
    bf16 = jnp.bfloat16
    d3 = functools.partial(
        lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=lax.Precision.DEFAULT,
    )

    def _split(x):
        xh = x.astype(bf16)
        return xh, (x - xh.astype(f32)).astype(bf16)

    def mm(w, x):
        # HIGHEST keeps the f32 mantissa through the MXU (the default is
        # single-pass bf16: ~1e-2 relative after 1000 cascaded steps)
        return lax.dot_general(
            w, x, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=prec,
        )

    def make_pair(wa, wb):
        """(wa @ x, wb @ x) sharing x's hi/lo split on the x3 path; weight
        splits precomputed once (captured as loop constants)."""
        if not x3:
            return lambda x: (mm(wa, x), mm(wb, x))
        wah, wal = _split(wa)
        wbh, wbl = _split(wb)

        def pair(x):
            xh, xl = _split(x)
            return (d3(wah, xh) + (d3(wah, xl) + d3(wal, xh)),
                    d3(wbh, xh) + (d3(wbh, xl) + d3(wbl, xh)))

        return pair

    def make_single(w):
        if not x3:
            return lambda x: mm(w, x)
        wh, wl = _split(w)

        def single(x):
            xh, xl = _split(x)
            return d3(wh, xh) + (d3(wh, xl) + d3(wl, xh))

        return single

    def kernel(*refs):
        if variant == "fused":
            (wf_ref, wi_ref,
             beta_ref, gamma_ref, alpha_ref, y0_ref,
             pmax_ref, ylast_ref, ok_ref) = refs
            wf = wf_ref[:, :]
            wi = wi_ref[:, :]
        elif variant == "block":
            (wfr_ref, wfi_ref, wir_ref, wii_ref,
             beta_ref, gamma_ref, alpha_ref, y0_ref,
             pmax_ref, ylast_ref, ok_ref) = refs
            wfr = wfr_ref[:, :]
            wfi = wfi_ref[:, :]
            wir = wir_ref[:, :]
            wii = wii_ref[:, :]
        else:
            (fr_ref, fi_ref, fs_ref, ir_ref, ii_ref, is_ref,
             beta_ref, gamma_ref, alpha_ref, y0_ref,
             pmax_ref, ylast_ref, ok_ref) = refs
            fr = fr_ref[:, :]
            fi = fi_ref[:, :]
            fs = fs_ref[:, :]
            ivr = ir_ref[:, :]
            ivi = ii_ref[:, :]
            ivs = is_ref[:, :]
        beta = beta_ref[:, :]          # (N, B)
        gamma = gamma_ref[:, :]        # (1, B)
        neg_half_alpha = alpha_ref[:, :] * np.float32(-0.5)  # (1, B)

        u0 = y0_ref[:, :]              # (2N, B) stacked [Ar; Ai]

        if variant == "fused":
            s_f, s_i = make_single(wf), make_single(wi)
        elif variant == "block":
            fwd_pair = make_pair(wfr, wfi)
            inv_pair = make_pair(wir, wii)
        else:
            s_fr, s_fi, s_fs = make_single(fr), make_single(fi), make_single(fs)
            s_ir, s_ii, s_is = (make_single(ivr), make_single(ivi),
                                make_single(ivs))

        def rhs_fused(u):
            FF = s_f(u)                       # (2L, B) stacked [Fr; Fi]
            Fr = FF[0:L, :]
            Fi = FF[L:2 * L, :]
            mag = Fr * Fr + Fi * Fi
            g = FF * jnp.concatenate([mag, mag], axis=0)
            T = s_i(g)                        # (2N, B) stacked [Tr; Ti]
            Tr = T[0:n, :]
            Ti = T[n:2 * n, :]
            ar = u[0:n, :]
            ai = u[n:2 * n, :]
            # dA = (-alpha/2) A + i beta A + i gamma T
            dr = neg_half_alpha * ar - beta * ai - gamma * Ti
            di = neg_half_alpha * ai + beta * ar + gamma * Tr
            return jnp.concatenate([dr, di], axis=0)

        def rhs_block(u):
            Fr, Fi = fwd_pair(u)
            mag = Fr * Fr + Fi * Fi
            g = jnp.concatenate([Fr * mag, Fi * mag], axis=0)  # (2L, B)
            Tr, Ti = inv_pair(g)
            ar = u[0:n, :]
            ai = u[n:2 * n, :]
            # dA = (-alpha/2) A + i beta A + i gamma T
            dr = neg_half_alpha * ar - beta * ai - gamma * Ti
            di = neg_half_alpha * ai + beta * ar + gamma * Tr
            return jnp.concatenate([dr, di], axis=0)

        def rhs_karatsuba(u):
            ar = u[0:n, :]
            ai = u[n:2 * n, :]
            # forward DFT (Karatsuba complex matmul, 3 real matmuls)
            p1 = s_fr(ar)
            p2 = s_fi(ai)
            p3 = s_fs(ar + ai)
            Fr = p1 - p2
            Fi = p3 - p1 - p2
            # cubic product: F^2 conj(F) = F |F|^2
            mag = Fr * Fr + Fi * Fi
            Gr = Fr * mag
            Gi = Fi * mag
            # inverse DFT
            q1 = s_ir(Gr)
            q2 = s_ii(Gi)
            q3 = s_is(Gr + Gi)
            Tr = q1 - q2
            Ti = q3 - q1 - q2
            dr = neg_half_alpha * ar - beta * ai - gamma * Ti
            di = neg_half_alpha * ai + beta * ar + gamma * Tr
            return jnp.concatenate([dr, di], axis=0)

        rhs = {"fused": rhs_fused, "block": rhs_block,
               "karatsuba": rhs_karatsuba}[variant]

        def rk4_with_f(u):
            k1 = rhs(u)
            k2 = rhs(u + c_half * k1)
            k3 = rhs(u + c_half * k2)
            k4 = rhs(u + c_full * k3)
            return u + c_sixth * (k1 + np.float32(2.0) * (k2 + k3) + k4), k1

        def freeze(u, u_new, ok):
            # one fused reduction: NaN compares false against the f32-max
            # bound, so this is the same flag as the explicit ==/abs pair
            fin = jnp.all(jnp.abs(u_new) < np.float32(3.4e38),
                          axis=0, keepdims=True)
            ok_n = ok * fin.astype(f32)
            return jnp.where(ok_n > np.float32(0.0), u_new, u), ok_n

        def step(_i, carry):
            u, ok = carry
            u_new, _ = rk4_with_f(u)
            return freeze(u, u_new, ok)

        def ms_step(_i, carry):
            # AB4 (optionally AM4 PECE-corrected): ONE (or two) RHS evals per
            # step vs RK4's four -- the Adams history planes ride the carry
            u, ok, f1, f2, f3 = carry
            f0 = rhs(u)
            u_new = u + c_24 * (
                np.float32(55.0) * f0 - np.float32(59.0) * f1
                + np.float32(37.0) * f2 - np.float32(9.0) * f3
            )
            if integrator == "abm4":
                fp = rhs(u_new)
                u_new = u + c_24 * (
                    np.float32(9.0) * fp + np.float32(19.0) * f0
                    - np.float32(5.0) * f1 + f2
                )
            u_o, ok_n = freeze(u, u_new, ok)
            return (u_o, ok_n, f0, f1, f2)

        def observe(u, pmax):
            P = u[0:n, :] * u[0:n, :] + u[n:2 * n, :] * u[n:2 * n, :]
            return jnp.where(P > pmax, P, pmax)

        pmax0 = u0[0:n, :] * u0[0:n, :] + u0[n:2 * n, :] * u0[n:2 * n, :]
        ok0 = jnp.ones_like(u0[0:1, :])

        if not multistep:
            def chunk(_c, carry):
                u, ok, pmax, last = carry
                u2, ok2 = lax.fori_loop(0, save_every, step, (u, ok))
                return (u2, ok2, observe(u2, pmax), u2)

            u, ok, pmax, last = lax.fori_loop(
                0, n_chunks, chunk, (u0, ok0, pmax0, u0)
            )
            if remainder > 0:
                # trailing partial steps: integrated (they can flip ok) but
                # unobserved (framework saved-grid convention)
                _u, ok = lax.fori_loop(0, remainder, step, (u, ok))
        else:
            # --- Adams driver: 3-step RK4 bootstrap (statically unrolled,
            # recording f at each pre-step state = the RK4 k1), then chunked
            # AB4/ABM4 with identical save-grid / freeze bookkeeping ---
            n_boot = min(3, n_steps)
            u, ok, pmax, last = u0, ok0, pmax0, u0
            fs = []
            for b in range(n_boot):
                u_new, f0 = rk4_with_f(u)
                u, ok = freeze(u, u_new, ok)
                fs.append(f0)
                if (b + 1) % save_every == 0:
                    pmax = observe(u, pmax)
                    last = u
            if n_steps > 3:
                carry = (u, ok, fs[2], fs[1], fs[0])
                S = n_steps // save_every
                boot_saved = n_boot // save_every
                if boot_saved < S:
                    nb = (boot_saved + 1) * save_every
                    carry = lax.fori_loop(0, nb - n_boot, ms_step, carry)
                    pmax = observe(carry[0], pmax)
                    last = carry[0]
                    n_full = S - boot_saved - 1
                    if n_full > 0:
                        def ms_chunk(_c, big):
                            u, ok, f1, f2, f3, pmax, last = big
                            u2, ok2, g1, g2, g3 = lax.fori_loop(
                                0, save_every, ms_step, (u, ok, f1, f2, f3)
                            )
                            return (u2, ok2, g1, g2, g3,
                                    observe(u2, pmax), u2)

                        u, ok, f1, f2, f3, pmax, last = lax.fori_loop(
                            0, n_full, ms_chunk, (*carry, pmax, last)
                        )
                        carry = (u, ok, f1, f2, f3)
                    cur = S * save_every
                else:
                    cur = n_boot
                if n_steps - cur > 0:
                    carry = lax.fori_loop(0, n_steps - cur, ms_step, carry)
                u, ok = carry[0], carry[1]
        pmax_ref[:, :] = pmax
        ylast_ref[:, :] = last
        ok_ref[:, :] = ok

    return kernel


def _make_comb_call(
    n_steps: int, save_every: int, n: int, dz: float, interpret: bool, block: int,
    mxu_precision: str = "highest", variant: str = DEFAULT_VARIANT,
    integrator: str = "rk4",
):
    from jax.experimental import pallas as pl

    if variant == "fused":
        w_f, w_i, L = _dft_weight_stacked(n)
        weights = [jnp.asarray(w_f), jnp.asarray(w_i)]
        w_shapes = [(2 * L, 2 * n), (2 * n, 2 * L)]
    elif variant == "block":
        f_re, f_im, i_re, i_im, L = _dft_weight_blocks(n)
        weights = [jnp.asarray(f_re), jnp.asarray(f_im),
                   jnp.asarray(i_re), jnp.asarray(i_im)]
        w_shapes = [(L, 2 * n), (L, 2 * n), (n, 2 * L), (n, 2 * L)]
    elif variant == "karatsuba":
        fr, fi, fs, ir, ii, is_, L = _dft_weight_planes(n)
        weights = [jnp.asarray(fr), jnp.asarray(fi), jnp.asarray(fs),
                   jnp.asarray(ir), jnp.asarray(ii), jnp.asarray(is_)]
        w_shapes = [(L, n)] * 3 + [(n, L)] * 3
    else:
        raise ValueError(
            f"variant must be 'fused', 'block' or 'karatsuba', got {variant!r}"
        )
    kernel = _kernel_body(n_steps, save_every, n, L, dz, mxu_precision,
                          variant, integrator)

    def call(beta, gamma, alpha, y0):
        B = y0.shape[1]
        blk = min(block, B)
        grid = (B // blk,)
        spec_kwargs = {}
        if not interpret:
            from jax.experimental.pallas import tpu as pltpu

            spec_kwargs = {"memory_space": pltpu.VMEM}
        in_specs = [
            pl.BlockSpec(ws, lambda i: (0, 0), **spec_kwargs)
            for ws in w_shapes
        ] + [
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
        )(*weights, beta, gamma, alpha, y0)

    return call


@functools.lru_cache(maxsize=32)
def _pallas_comb_solver(
    n_steps: int, save_every: int, n: int, dz: float, interpret: bool, block: int,
    mxu_precision: str = "highest", variant: str = DEFAULT_VARIANT,
    integrator: str = "rk4",
):
    call = _make_comb_call(
        n_steps, save_every, n, dz, interpret, block, mxu_precision, variant,
        integrator,
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
    mxu_precision: str, mesh, variant: str = DEFAULT_VARIANT,
    integrator: str = "rk4",
):
    """shard_map-wrapped comb kernel: lane (batch) axis split over the mesh;
    the DFT weight planes are closure constants, replicated to every shard."""
    from jax.sharding import PartitionSpec

    call = _make_comb_call(n_steps, save_every, n, dz, interpret, block,
                           mxu_precision, variant, integrator)

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
    variant: str = DEFAULT_VARIANT,
    integrator: str = "rk4",
    mesh=None,
):
    """Fused-kernel comb solve; contract mirrors ``nwave.solve_comb_batch``
    (rk4, x32): returns host ``(P_max (B, N), A_final (B, N), ok (B,))``.

    ``A0`` is ``(B, N)`` complex; ``gamma``/``alpha`` broadcast to ``(B,)``;
    ``beta_lin`` broadcasts to ``(B, N)``.  Pass ``mesh`` to shard the batch
    axis with ``shard_map`` (per-shard kernel launch, no collectives).
    ``variant`` selects the matmul formulation (see module docstring);
    ``mxu_precision`` the dot path: 'highest' (6-pass bf16, f32-class),
    'x3' (3-pass compensated hi/lo-bf16 split, ~2x the MXU pass rate at
    ~2^-18-relative extra rounding per matmul), or 'default' (1-pass bf16,
    lossy -- A/B only).
    """
    A0 = np.asarray(A0, dtype=np.complex128)
    if A0.ndim != 2:
        raise ValueError(f"A0 must have shape (B, N), got {A0.shape}")
    B, n = A0.shape
    gamma = np.broadcast_to(np.asarray(gamma, dtype=np.float64), (B,))
    alpha = np.broadcast_to(np.asarray(alpha, dtype=np.float64), (B,))
    beta = np.broadcast_to(np.asarray(beta_lin, dtype=np.float64), (B, n))

    # Width/block limits, MEASURED on v5e Mosaic (2026-08-17): the compiler
    # crashes (remote-compile HTTP 500) beyond these, independent of the
    # VMEM arithmetic -- L=128 compiles up to 1024 lanes/block, L=256 up to
    # 256 lanes, L>=512 (N=256 combs) not at all.  Wider combs use the scan
    # engine (the dft-matmul coupling handles any N under XLA).
    from ..models.nwave import _fft_len

    L = _fft_len(n)
    if L > 256:
        raise ValueError(
            f"comb too wide for the fused kernel (N={n}, FFT len {L}): "
            "Mosaic cannot compile the VMEM-resident body past L=256 "
            "(measured v5e limit); use the scan engine (coupling='dft')"
        )
    cap = 1024 if L <= 128 else 256
    w_floats = 12 * L * n if variant == "karatsuba" else 8 * L * n
    budget = 14 * 1024 * 1024 - w_floats * 4
    # the Adams history (f1..f3, three (2N, B) planes) rides the loop carry
    planes = 24 if integrator == "rk4" else 30
    blk_fit = (budget // (planes * L * 4)) // LANES * LANES
    if blk_fit < LANES:
        raise ValueError(
            f"comb too wide for the fused kernel (N={n}, L={L}): weight + "
            f"state planes exceed VMEM even at a {LANES}-lane block; use the "
            "scan engine"
        )
    block = int(min(block, cap, blk_fit))

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
            int(block), str(mxu_precision), str(variant), str(integrator),
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
            int(block), str(mxu_precision), mesh, str(variant), str(integrator),
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
    mesh=None, mxu_precision="highest", integrator="rk4",
):
    """``nwave.solve_comb_batch``-shaped wrapper: (P_max, A_final, ok)."""
    return solve_comb_batch_pallas(
        A0, gamma, alpha, beta_lin,
        dz_m=dz_m, n_steps=n_steps, save_every=save_every, interpret=interpret,
        mesh=mesh, mxu_precision=mxu_precision, integrator=integrator,
    )
