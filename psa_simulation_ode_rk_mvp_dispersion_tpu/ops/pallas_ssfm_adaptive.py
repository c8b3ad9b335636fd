"""Pallas TPU kernel: fused batched ADAPTIVE split-step (SSFM) solver.

One kernel body serves both split-step families that share the fixed-step
kernel machinery (``ops/pallas_gnlse.py`` / ``ops/pallas_lle.py``):

- scalar GNLSE, Kerr nonlinearity (``models/gnlse`` ``integrator='rk45'``);
- the LLE driven-damped cavity via the ``affine`` linear substep
  (``models/lle`` ``integrator='rk45'``).

The scan adaptive controller (``models/gnlse._gnlse_advance_segment``)
dispatches one XLA while-iteration per attempt over the whole batch and
rebuilds per-lane (B, T) linear factors with host-library transcendentals
and FFTs each time; this kernel runs the ENTIRE Sinkin step-doubling
integration in one ``pallas_call``:

- state: the fixed-step kernels' grouped-stacked (2T, blk) f32 planes,
  polyphase MXU DFTs (``_make_dft_ops``, HIGHEST 'x6' dots by default --
  unlike the comb adaptive family, HIGHEST both COMPILES in this while
  body (~11-70 s vs the manual x3 path's 4.5-14 min -- Mosaic compile
  time tracks the op count of the 3-dot compensated splits, not the
  precision flag) and is REQUIRED for the adaptive use-case: the x3
  noise floor pins the controller's h ~40x low, see ``_DOT``);
- per-ATTEMPT in-kernel linear factors: ``exp(i phi k s)`` planes built
  from the phase-rate input by VPU transcendentals for the per-lane step
  ``s`` -- the quarter-step factor once, the half-step factor as its
  exact square (the round-5 attempt-sharing rule);
- controller: per-lane (8, blk) replicated-row planes, explicit
  ``jnp.concatenate`` tilings for sublane broadcasts, ones-matrix MXU
  dots for the cross-sublane error-norm reductions -- the Mosaic layout
  rule of ``ops/pallas_comb_adaptive.py`` (round 4) applied verbatim;
- the scan-controller semantics: Sinkin global RMS error norm,
  Richardson-extrapolated accepted state (4 yf - yc)/3, safety 0.9 /
  factors [0.2, 5] / exponent -1/3, boundary-clipped steps keep the
  converged dt, the 1e30 runaway-gain escape, per-lane failure masking,
  save grid = segment boundaries with P-peak over saved samples, and the
  trailing-partial-span rule (integrated, ok/counters only) -- PLUS one
  kernel-specific robustness rule: accepted steps never SHRINK h (the
  no-shrink-on-accept deadband; the x3-bf16 DFT noise floor is
  h-independent and otherwise ratchets dt to dt_min while accepting --
  see the body comment), so the accepted-step sequence is
  tolerance-class vs the scan engine, not identical.

Contract mirrors: ``models/gnlse._gnlse_adaptive_solver`` (reduce mode) /
``models/lle._lle_adaptive_solver``; capability lineage: the adaptive slot
of reference config.py:89 extended to the SSFM families (VERDICT r4 #4).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from .pallas_gnlse import (
    LANES,
    MAX_R,
    M_SUB,
    _dft_weight_blocks,
    _make_dft_ops,
    _pack_grouped,
    _unpack_grouped,
)

# compile-bisection flags (debugging the Mosaic compile blow-up):
# comma list in PSA_SSFM_ABLATE of {nofac, nokerr, noaff, nodft, fori}
_ABLATE = frozenset(
    f for f in os.environ.get("PSA_SSFM_ABLATE", "").split(",") if f)

# DFT dot path: 'x6' = HIGHEST (6-pass bf16, f32-class) -- REQUIRED for
# the adaptive use-case: the x3 3-pass compensated path's ~4e-6 relative
# noise floor sits inside the (0.73, 1]*denom accept band at rtol 1e-5,
# pinning the controller's equilibrium h ~40x below the truncation-limited
# value (measured round 5: lle_bench na_mean 128k vs interpret's ~3k).
# 'x3' kept as the A/B lever.  Read at solver-build time (a mid-process
# flip only affects shapes not yet built, _ssfm_rk45_solver is cached).
_DOT = os.environ.get("PSA_SSFM_DOT", "x6")

_F32_MAX = 3.4e38
_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 5.0
_ERR_EXP = -1.0 / 3.0        # order-2 Strang doubling: local error O(h^3)


def _auto_block(t: int) -> int:
    """Lanes per grid cell: the attempt keeps ~10 live (2T, blk) plane
    sets (state, spectrum, yc/yf, factor pair, tilings); keep them inside
    the ~12 MB usable VMEM.  blk=256 dies in the Mosaic remote compile
    ("Check failed: limits[i] <= dim(i) (2 vs. 1)", SIGABRT) -- measured
    round 5, lle_tiny_b256 vs lle_tiny_b128/lle_bench_blk128 in
    scripts/debug_ssfm_kernel.py -- and the pallas TPU lowering requires
    lane-dim blocks divisible by 128, so 128 is the ONLY legal width."""
    return 128


def _kernel_body(rtol: float, atol: float, max_steps: int, t: int,
                 affine: bool, interpret: bool = False):
    m = M_SUB
    r = t // m
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    d3 = functools.partial(
        lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=lax.Precision.DEFAULT,
    )

    def _split(x):
        xh = x.astype(bf16)
        return xh, (x - xh.astype(f32)).astype(bf16)

    def kernel(wfr_ref, wfi_ref, wir_ref, wii_ref, ph_ref, ctl_ref, y0_ref,
               pk_ref, ylast_ref, ok_ref, na_ref, nr_ref, dt_ref):
        wfr = wfr_ref[:, :]
        wfi = wfi_ref[:, :]
        wir = wir_ref[:, :]
        wii = wii_ref[:, :]
        ctl = ctl_ref[:, :]
        blk = ctl.shape[1]
        # (8, blk) replicated-row per-lane constants (Mosaic layout rule:
        # no (1, B) planes anywhere in the controller)
        gam8 = ctl[0:8, :]
        nha8 = ctl[8:16, :]          # -alpha/2 (LLE: -1)
        dt0 = ctl[16:24, :]          # carried per-lane step size (runtime)
        seg8 = ctl[24:32, :]         # this launch's segment length (runtime)
        okin = ctl[32:40, :]         # carried per-lane ok flag (runtime)
        if affine:
            det8 = ctl[40:48, :]
            fre8 = ctl[48:56, :]
            fim8 = ctl[56:64, :]
            il0r8 = ctl[64:72, :]    # 1/Lam0 = conj(Lam0)/|Lam0|^2
            il0i8 = ctl[72:80, :]

        ones_2t = jnp.ones((8, 2 * t), bf16)

        def rowsum(x):
            # exact f32 row sum via hi/lo-split bf16 MXU dots: reduces over
            # sublane rows AND replicates across 8 sublanes in one op
            xh, xl = _split(x)
            return d3(ones_2t, xh) + d3(ones_2t, xl)          # (8, blk)

        def tile_m(p8):
            return jnp.concatenate([p8] * (m // 8), axis=0)   # (m, blk)

        def tile_2t(p8):
            return jnp.concatenate([p8] * (2 * t // 8), axis=0)

        # polyphase twiddles W_T^{g d} at FULL lane width: width-1 planes
        # are the transpose cousin of the fatal (1, B) Mosaic pattern and
        # must not exist inside the while body
        if r > 1:
            rows = lax.broadcasted_iota(jnp.int32, (t, blk), 0)
            gidx = rows // m
            didx = rows - gidx * m
            ang_tw = np.float32(-2.0 * np.pi / t) * (gidx * didx).astype(f32)
            twc = jnp.cos(ang_tw)
            tws = jnp.sin(ang_tw)

        def twiddle(g, gr, gi, conj=False):
            if r == 1:
                return gr, gi
            tr = twc[g * m:(g + 1) * m, :]
            ti = tws[g * m:(g + 1) * m, :]
            if conj:
                return gr * tr + gi * ti, gi * tr - gr * ti
            return gr * tr - gi * ti, gr * ti + gi * tr

        # x3 compensated bf16 dots on TPU (HIGHEST inside a while body is
        # the measured Mosaic compile limit); interpret mode keeps HIGHEST
        fwd_cplx, _fr, inv_cplx, _ir, _p, _s = _make_dft_ops(
            t, m, _DOT == "x3" and not interpret, wfr, wfi, wir, wii,
            twiddle)

        def dft_fwd(y):
            if "nodft" in _ABLATE:
                return ([y[2 * g * m:(2 * g + 1) * m, :] for g in range(r)],
                        [y[(2 * g + 1) * m:2 * (g + 1) * m, :]
                         for g in range(r)])
            return fwd_cplx(lambda g: y[2 * g * m:2 * (g + 1) * m, :])

        def dft_inv(Sr, Si, aff=None):
            """Inverse DFT -> grouped (2T, blk) value; ``aff`` applies the
            LLE per-lane detuning rotation + drive offset (each an (m, blk)
            pre-tiled plane) to every group's write."""
            parts = [None] * r

            def write(g, or_, oi):
                if aff is not None:
                    dpr, dpi, dfr, dfi = aff
                    or_, oi = (or_ * dpr - oi * dpi + dfr,
                               or_ * dpi + oi * dpr + dfi)
                parts[g] = (or_, oi)

            if "nodft" in _ABLATE:
                for g in range(r):
                    write(g, Sr[g], Si[g])
            else:
                inv_cplx(Sr, Si, write)
            return jnp.concatenate(
                [p for g in range(r) for p in parts[g]], axis=0)

        def kerr(y, gs_m):
            """Exact rotation exp(i gamma s P); ``gs_m`` is the pre-tiled
            (m, blk) per-lane angle scale gamma*s."""
            if "nokerr" in _ABLATE:
                return y
            outs = []
            for g in range(r):
                ar = y[2 * g * m:(2 * g + 1) * m, :]
                ai = y[(2 * g + 1) * m:2 * (g + 1) * m, :]
                ang = gs_m * (ar * ar + ai * ai)
                ca = jnp.cos(ang)
                sa = jnp.sin(ang)
                outs.append(ar * ca - ai * sa)
                outs.append(ar * sa + ai * ca)
            return jnp.concatenate(outs, axis=0)

        def aff_scalars(s8):
            if "noaff" in _ABLATE:
                z = tile_m(jnp.zeros_like(s8))
                o = tile_m(jnp.ones_like(s8))
                return (o, z, z, z)
            """LLE per-lane scalar maps for step s: detuning rotation
            exp(-i Delta s) and exact drive offset F (e^{Lam0 s}-1)/Lam0,
            each returned as a pre-tiled (m, blk) plane quadruple."""
            angd = -det8 * s8
            dpr = jnp.cos(angd)
            dpi = jnp.sin(angd)
            er = jnp.exp(-s8)
            exr = er * dpr - 1.0          # e^{Lam0 s} - 1 (re)
            exi = er * dpi
            t1r = fre8 * exr - fim8 * exi
            t1i = fre8 * exi + fim8 * exr
            dfr = t1r * il0r8 - t1i * il0i8
            dfi = t1r * il0i8 + t1i * il0r8
            return (tile_m(dpr), tile_m(dpi), tile_m(dfr), tile_m(dfi))

        def factors(s8):
            if "nofac" in _ABLATE:
                o = tile_m(jnp.ones_like(s8))
                z = tile_m(jnp.zeros_like(s8))
                F1 = [(o, z) for _ in range(r)]
                return F1, [(o, z) for _ in range(r)]
            """Per-lane linear factor planes exp((-alpha/2 + i phi k) s)
            for the quarter step, natural-k order, as (Fr, Fi) lists of r
            (m, blk) planes; the half-step factor is the exact square."""
            s_m = tile_m(s8)
            a_m = tile_m(nha8 * s8)
            mag = jnp.exp(a_m)
            Fq = []
            for c in range(r):
                phc = ph_ref[c * m:(c + 1) * m, :]
                angc = phc * s_m
                Fq.append((mag * jnp.cos(angc), mag * jnp.sin(angc)))
            Fh = [(qr * qr - qi * qi, (qr + qr) * qi) for qr, qi in Fq]
            return Fq, Fh

        def apply_fac(Sr, Si, F):
            out_r = []
            out_i = []
            for c in range(r):
                fr_c, fi_c = F[c]
                out_r.append(Sr[c] * fr_c - Si[c] * fi_c)
                out_i.append(Sr[c] * fi_c + Si[c] * fr_c)
            return out_r, out_i

        def attempt(y, h8):
            """(coarse h Strang step, two fused fine h/2 steps) with the
            round-5 sharing: one transcendental factor build (quarter) +
            exact square (half), one shared forward transform."""
            q8 = 0.25 * h8
            Fq, Fh = factors(q8)
            gs_f = tile_m(gam8 * h8)          # Kerr angle scale, coarse
            gs_h = tile_m(gam8 * (0.5 * h8))  # fine steps
            if affine:
                aff_q = aff_scalars(q8)
                aff_h = aff_scalars(0.5 * h8)
            else:
                aff_q = aff_h = None

            S0r, S0i = dft_fwd(y)
            # coarse: lin(h/2) K(h) lin(h/2)
            yc = dft_inv(*apply_fac(S0r, S0i, Fh), aff=aff_h)
            yc = kerr(yc, gs_f)
            Sr, Si = dft_fwd(yc)
            yc = dft_inv(*apply_fac(Sr, Si, Fh), aff=aff_h)
            # fine pair: lin(h/4) K(h/2) lin(h/2) K(h/2) lin(h/4)
            yf = dft_inv(*apply_fac(S0r, S0i, Fq), aff=aff_q)
            yf = kerr(yf, gs_h)
            Sr, Si = dft_fwd(yf)
            yf = dft_inv(*apply_fac(Sr, Si, Fh), aff=aff_h)
            yf = kerr(yf, gs_h)
            Sr, Si = dft_fwd(yf)
            yf = dft_inv(*apply_fac(Sr, Si, Fq), aff=aff_q)
            return yc, yf

        inv_t = np.float32(1.0 / t)

        def mean_pow(y):
            return rowsum(y * y) * inv_t                      # (8, blk)

        def fin_all(y):
            ind = (jnp.abs(y) < jnp.asarray(_F32_MAX, f32)).astype(f32)
            return rowsum(ind) >= (2 * t - 0.5)               # (8, blk)

        u0 = y0_ref[:, :]
        ok0 = fin_all(u0).astype(f32) * okin
        zero8 = jnp.zeros_like(ok0)

        def advance(carry):
            u, ok, dt, na, nr = carry
            z = zero8
            seg_end = seg8                       # (8, blk) runtime plane
            dt_min = np.float32(1e-12) * (seg8 + 1.0)

            def cond(state):
                _u, z_, _dt, ok_, _na, _nr, it = state
                return jnp.any((z_ < seg_end) & (ok_ > 0.0)) & (
                    it < max_steps)

            def body(state):
                u_, z_, dt_, ok_, na_, nr_, it = state
                active = (z_ < seg_end) & (ok_ > 0.0)
                clipped = (seg_end - z_) < dt_
                h = jnp.minimum(dt_, seg_end - z_)
                yc, yf = attempt(u_, h)
                # Sinkin global RMS error norm (models/gnlse contract)
                d = jnp.sqrt(mean_pow(yf - yc))
                s = jnp.sqrt(jnp.maximum(mean_pow(yf), mean_pow(u_)))
                denom = jnp.maximum(atol + rtol * s,
                                    np.float32(1.2e-38))
                enorm = d / denom
                finite = (enorm < _F32_MAX) & fin_all(yf) & fin_all(yc)
                accept = active & finite & (enorm <= 1.0)
                y_new = np.float32(1.0 / 3.0) * (4.0 * yf - yc)
                # runaway-gain escape (split error is blind to pure
                # linear blowup): mean power past 1e30 fails the lane now
                escape = mean_pow(y_new) > np.float32(1e30)
                accept = accept & ~escape
                factor = jnp.where(
                    finite,
                    jnp.clip(
                        _SAFETY * jnp.exp(
                            np.float32(_ERR_EXP)
                            * jnp.log(jnp.maximum(enorm, 1e-16))),
                        _MIN_FACTOR, _MAX_FACTOR),
                    jnp.asarray(0.5, f32),
                )
                # no-shrink-on-accept deadband (round 5, TPU fix): the x3
                # compensated-bf16 DFT noise is an h-INDEPENDENT error
                # floor; when it lands in (0.73, 1.0] x denom the pure
                # Sinkin update accepts yet shrinks h every step
                # (factor = 0.9 enorm^{-1/3} < 1), ratcheting dt to
                # dt_min where z + h == z stalls in f32 until max_steps
                # (measured: lle_mid ok=0, na~max_steps, while interpret
                # mode with HIGHEST dots is healthy).  An accepted step
                # may hold or grow h, never shrink it; genuine error
                # growth still shrinks h through the rejection branch.
                base = jnp.where(
                    clipped & accept, dt_,
                    jnp.where(accept, h * jnp.maximum(factor, 1.0),
                              h * factor))
                dt_next = jnp.where(active, jnp.maximum(base, dt_min), dt_)
                failed = active & (((~accept) & (h <= dt_min)) | escape)
                acc2t = tile_2t(jnp.where(accept, 1.0, 0.0)) > 0.0
                u_out = jnp.where(acc2t, y_new, u_)
                # clipped accepted steps land EXACTLY on the segment
                # boundary (z + h can round below seg_end in f32)
                z_out = jnp.where(accept,
                                  jnp.where(clipped, seg_end, z_ + h), z_)
                ok_out = ok_ * jnp.where(failed, 0.0, 1.0)
                na_out = jnp.where(accept, na_ + 1.0, na_)
                nr_out = jnp.where(active & ~accept, nr_ + 1.0, nr_)
                return (u_out, z_out, dt_next, ok_out, na_out, nr_out,
                        it + 1)

            if "fori" in _ABLATE:
                st = (u, z, dt, ok, na, nr, jnp.asarray(0, jnp.int32))
                for _k in range(2):
                    st = body(st)
                u, z, dt, ok, na, nr, _it = st
            else:
                u, z, dt, ok, na, nr, _it = lax.while_loop(
                    cond, body,
                    (u, z, dt, ok, na, nr, jnp.asarray(0, jnp.int32)))
            ok = ok * jnp.where(z >= seg_end, 1.0, 0.0)
            return (u, ok, dt, na, nr)


        def peak_of(u):
            # stride-8 row maxima -> a native (8, blk) plane (row j = max
            # over sample rows == j mod 8); the host takes the final max
            # over the 8 rows.  NO (1, blk) plane exists (the Mosaic
            # layout rule: single-row planes/outputs fail the remote
            # compile in while-loop kernels, ops/pallas_comb_adaptive).
            acc = None
            for g in range(r):
                ar = u[2 * g * m:(2 * g + 1) * m, :]
                ai = u[(2 * g + 1) * m:2 * (g + 1) * m, :]
                p = ar * ar + ai * ai
                for k in range(m // 8):
                    sl = p[k * 8:(k + 1) * 8, :]
                    acc = sl if acc is None else jnp.maximum(acc, sl)
            return acc                                         # (8, blk)

        # ONE segment per launch: the host loops over the save grid with
        # device-resident state feedback (a >60 s monolithic launch hits
        # the attachment's per-RPC deadline -- measured ABORTED at the
        # bench shape -- and per-launch statics would force a fresh
        # ~19-min Mosaic compile per workload geometry; with seg/dt/ok as
        # RUNTIME ctl rows one compile serves every shape)
        u, ok, dt, na, nr = advance((u0, ok0, dt0, zero8, zero8))
        pk = jnp.maximum(peak_of(u0), peak_of(u))
        pk_ref[:, :] = pk
        ylast_ref[:, :] = u
        ok_ref[:, :] = ok
        na_ref[:, :] = na
        nr_ref[:, :] = nr
        dt_ref[:, :] = dt

    return kernel


def _make_call(rtol: float, atol: float, max_steps: int, t: int,
               affine: bool, interpret: bool, block: int, n_ctl: int):
    from jax.experimental import pallas as pl

    kernel = _kernel_body(rtol, atol, max_steps, t, affine, interpret)
    m = M_SUB
    wfr, wfi, wir, wii = _dft_weight_blocks(m)

    def call(ph, ctl, y0):
        B = y0.shape[1]
        # shared (T, 1) phase broadcasts device-side: the kernel must see
        # full-width blocks only (pallas_lle's lh pattern)
        ph = jnp.broadcast_to(ph, (ph.shape[0], B))
        blk = min(block, B)
        grid = (B // blk,)
        spec_kwargs = {}
        if not interpret:
            from jax.experimental.pallas import tpu as pltpu

            spec_kwargs = {"memory_space": pltpu.VMEM}

        def rep(shape):
            return pl.BlockSpec(shape, lambda i: (0, 0), **spec_kwargs)

        ph_spec = pl.BlockSpec((t, blk), lambda i: (0, i), **spec_kwargs)
        in_specs = [
            rep(wfr.shape), rep(wfi.shape), rep(wir.shape), rep(wii.shape),
            ph_spec,
            pl.BlockSpec((n_ctl, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((2 * t, blk), lambda i: (0, i), **spec_kwargs),
        ]
        out_specs = tuple(
            pl.BlockSpec((rr, blk), lambda i: (0, i), **spec_kwargs)
            for rr in (8, 2 * t, 8, 8, 8, 8)
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=tuple(
                jax.ShapeDtypeStruct((rr, B), jnp.float32)
                for rr in (8, 2 * t, 8, 8, 8, 8)
            ),
            interpret=interpret,
        )(jnp.asarray(wfr), jnp.asarray(wfi), jnp.asarray(wir),
          jnp.asarray(wii), ph, ctl, y0)

    return call


@functools.lru_cache(maxsize=32)
def _ssfm_rk45_solver(rtol: float, atol: float, max_steps: int, t: int,
                      affine: bool, interpret: bool, block: int, n_ctl: int):
    call = _make_call(rtol, atol, max_steps, t, affine, interpret, block,
                      n_ctl)

    def fused(ph, ctl, y0):
        pk, ylast, ok, na, nr, dt = call(ph, ctl, y0)
        # ONE stacked buffer: stays on device between segment launches
        return jnp.concatenate([pk, ylast, ok, na, nr, dt], axis=0)

    return jax.jit(fused)


@functools.lru_cache(maxsize=16)
def _ssfm_prep_fn(t: int):
    """Device-resident relaunch prep: fold a launch's stacked output into
    the accumulators and build the next launch's (ctl, y0) -- all jit'd so
    NOTHING crosses the tunnel between segment launches."""

    @jax.jit
    def prep(out, ctl, pk_acc, na_acc, nr_acc, seg_next):
        pk = jnp.maximum(pk_acc, out[0:8])
        ylast = out[8:8 + 2 * t]
        ok = out[8 + 2 * t:16 + 2 * t]
        na = na_acc + out[16 + 2 * t:24 + 2 * t]
        nr = nr_acc + out[24 + 2 * t:32 + 2 * t]
        dt = out[32 + 2 * t:40 + 2 * t]
        ctl2 = ctl.at[16:24, :].set(dt).at[24:32, :].set(seg_next) \
                  .at[32:40, :].set(ok)
        return ctl2, ylast, pk, ok, na, nr

    @jax.jit
    def gather(ylast, pk, ok, na, nr):
        # final single-fetch assembly (docs/PERF.md rule 7)
        return jnp.concatenate([pk, ylast, ok, na, nr], axis=0)

    return prep, gather


@functools.lru_cache(maxsize=16)
def _ssfm_rk45_solver_sharded(rtol: float, atol: float, max_steps: int,
                              t: int, affine: bool, interpret: bool,
                              block: int, n_ctl: int, bf: int, mesh):
    from jax.sharding import PartitionSpec

    call = _make_call(rtol, atol, max_steps, t, affine, interpret, block,
                      n_ctl)

    def fused(ph, ctl, y0):
        pk, ylast, ok, na, nr, dt = call(ph, ctl, y0)
        return jnp.concatenate([pk, ylast, ok, na, nr, dt], axis=0)

    axes = tuple(mesh.axis_names)
    ax = axes if len(axes) > 1 else axes[0]
    spec = PartitionSpec(None, ax)
    ph_spec = PartitionSpec() if bf == 1 else spec
    return jax.jit(
        jax.shard_map(
            fused, mesh=mesh,
            in_specs=(ph_spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    ), spec


@dataclasses.dataclass(frozen=True)
class SSFMAdaptiveResult:
    peak_max: np.ndarray     # (B,) f64: max |A|^2 over saved samples
    A_end: np.ndarray        # (B, T) c128 at the last saved grid point
    ok: np.ndarray           # (B,) bool
    n_accepted: np.ndarray   # (B,) int64
    n_rejected: np.ndarray   # (B,) int64


def _solve(A0, gam, nha, phase, aff_rows, *, dz, n_steps, save_every,
           rtol, atol, max_steps, interpret, block, mesh):
    A0 = np.asarray(A0, dtype=np.complex128)
    B, T = A0.shape
    m = M_SUB
    if T % m != 0 or T < m or T // m > MAX_R:
        raise ValueError(
            f"T={T} must be a multiple of {m} and at most {m * MAX_R} for "
            "the fused adaptive SSFM kernel; use engine='scan'"
        )
    n_chunks = int(n_steps) // int(save_every)
    seg_len = float(save_every) * float(dz)
    tail_len = (int(n_steps) - n_chunks * int(save_every)) * float(dz)
    if n_chunks == 0 and tail_len == 0.0:
        P0 = np.abs(A0) ** 2
        return SSFMAdaptiveResult(
            peak_max=P0.max(axis=1), A_end=A0.copy(),
            ok=np.isfinite(A0).all(axis=1),
            n_accepted=np.zeros(B, np.int64),
            n_rejected=np.zeros(B, np.int64),
        )
    affine = aff_rows is not None
    if block is None:
        block = _auto_block(T)
    ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    blk = int(block) if B >= ndev * int(block) else LANES
    mult = ndev * blk
    Bp = ((B + mult - 1) // mult) * mult
    pad = Bp - B

    def padded(x, axis=0):
        if not pad:
            return x
        rep = np.repeat(np.take(x, [-1], axis=axis), pad, axis=axis)
        return np.concatenate([x, rep], axis=axis)

    y0 = _pack_grouped(padded(A0), T, m)

    phase = np.asarray(phase, dtype=np.float64)
    if phase.ndim == 1:
        ph = phase[:, None].astype(np.float32)              # (T, 1) shared
        bf = 1
    else:
        ph = padded(np.broadcast_to(phase, (B, T)).T.copy(), axis=1)
        ph = ph.astype(np.float32)                          # (T, Bp)
        bf = 0

    def rows8(v):
        return np.tile(np.broadcast_to(np.asarray(v, np.float64),
                                       (Bp,))[None, :], (8, 1))

    # ctl layout: [gam; -alpha/2; dt (runtime); seg (runtime); ok (runtime)]
    # + the affine per-lane scalars -- dt/seg/ok are RUNTIME rows so one
    # compiled kernel serves every save-grid geometry
    ctl_rows = [rows8(padded(np.broadcast_to(gam, (B,)))),
                rows8(padded(np.broadcast_to(nha, (B,)))),
                rows8(np.full(Bp, float(dz))),
                rows8(np.full(Bp, seg_len if n_chunks > 0 else tail_len)),
                rows8(np.ones(Bp))]
    if affine:
        ctl_rows += [rows8(padded(np.broadcast_to(v, (B,))))
                     for v in aff_rows]
    ctl = np.concatenate(ctl_rows, axis=0).astype(np.float32)
    n_ctl = ctl.shape[0]

    prep, gather = _ssfm_prep_fn(int(T))
    zero8 = np.zeros((8, Bp), np.float32)
    seg32 = np.float32(seg_len)
    tail32 = np.float32(tail_len)

    if mesh is None:
        solver = _ssfm_rk45_solver(
            float(rtol), float(atol), int(max_steps), int(T), affine,
            bool(interpret), blk, n_ctl)
        with jax.enable_x64(False):
            ph_d = jnp.asarray(ph)
            ctl_d = jnp.asarray(ctl)
            y_d = jnp.asarray(y0)
            pk_d = jnp.zeros((8, Bp), jnp.float32)
            na_d = jnp.zeros((8, Bp), jnp.float32)
            nr_d = jnp.zeros((8, Bp), jnp.float32)
            ok_d = jnp.ones((8, Bp), jnp.float32)
            ylast_d = y_d
            # per-segment launches, state resident on device throughout
            for c in range(n_chunks):
                out = solver(ph_d, ctl_d, ylast_d)
                nxt = (seg32 if c + 1 < n_chunks else
                       (tail32 if tail_len > 0.0 else seg32))
                ctl_d, ylast_d, pk_d, ok_d, na_d, nr_d = prep(
                    out, ctl_d, pk_d, na_d, nr_d, nxt)
            if tail_len > 0.0:
                # trailing partial span: ok/counters only (unsaved)
                out = solver(ph_d, ctl_d, ylast_d)
                _c2, _yt, _pkt, ok_d, na_d, nr_d = prep(
                    out, ctl_d, pk_d, na_d, nr_d, seg32)
                _pkt = None
            out = np.asarray(jax.block_until_ready(
                gather(ylast_d, pk_d, ok_d, na_d, nr_d)))
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.mesh import fetch_global, put_global

        solver, spec = _ssfm_rk45_solver_sharded(
            float(rtol), float(atol), int(max_steps), int(T), affine,
            bool(interpret), blk, n_ctl, bf, mesh)
        sh = NamedSharding(mesh, spec)
        ph_sh = (NamedSharding(mesh, PartitionSpec()) if bf == 1 else sh)
        with jax.enable_x64(False):
            ph_d = put_global(ph, ph_sh)
            ctl_d = put_global(ctl, sh)
            ylast_d = put_global(y0, sh)
            pk_d = put_global(zero8, sh)
            na_d = put_global(zero8, sh)
            nr_d = put_global(zero8, sh)
            ok_d = put_global(np.ones((8, Bp), np.float32), sh)
            for c in range(n_chunks):
                out = solver(ph_d, ctl_d, ylast_d)
                nxt = (seg32 if c + 1 < n_chunks else
                       (tail32 if tail_len > 0.0 else seg32))
                ctl_d, ylast_d, pk_d, ok_d, na_d, nr_d = prep(
                    out, ctl_d, pk_d, na_d, nr_d, nxt)
            if tail_len > 0.0:
                out = solver(ph_d, ctl_d, ylast_d)
                _c2, _yt, _pkt, ok_d, na_d, nr_d = prep(
                    out, ctl_d, pk_d, na_d, nr_d, seg32)
            out = np.asarray(fetch_global(jax.block_until_ready(
                gather(ylast_d, pk_d, ok_d, na_d, nr_d))))

    pk = np.asarray(out[0:8], np.float64).max(axis=0)[:B]
    # the initial state is a saved sample in every geometry (incl. the
    # n_chunks==0 + tail case, where no launch computed a peak)
    pk = np.maximum(pk, (np.abs(A0) ** 2).max(axis=1))
    A_end = _unpack_grouped(out[8:8 + 2 * T], T, m, B)
    ok = (np.asarray(out[8 + 2 * T], np.float64) > 0.0)[:B]
    na = np.asarray(out[8 + 2 * T + 8], np.float64)[:B].astype(np.int64)
    nr = np.asarray(out[8 + 2 * T + 16], np.float64)[:B].astype(np.int64)
    return SSFMAdaptiveResult(peak_max=pk, A_end=A_end, ok=ok,
                              n_accepted=na, n_rejected=nr)


def solve_gnlse_batch_rk45_pallas(
    A0: np.ndarray,
    gamma,
    alpha,
    lin_phase,
    *,
    dz_m: float,
    n_steps: int,
    save_every: int,
    rtol: float,
    atol: float,
    max_steps: int = 100_000,
    interpret: bool = False,
    block: int = None,
    mesh=None,
) -> SSFMAdaptiveResult:
    """Fused adaptive (Sinkin step-doubling Strang) GNLSE solve, Kerr
    nonlinearity, x32.  ``lin_phase`` is the fft-ordered dispersion phase
    rate ((T,) shared or (B, T)); ``alpha`` is the flat per-lane loss
    (spectral loss profiles use the scan engine).  Contract mirrors
    ``models/gnlse`` ``integrator='rk45'`` reduce mode."""
    B = np.asarray(A0).shape[0]
    return _solve(
        A0, np.broadcast_to(np.asarray(gamma, np.float64), (B,)),
        -0.5 * np.broadcast_to(np.asarray(alpha, np.float64), (B,)),
        lin_phase, None,
        dz=dz_m, n_steps=n_steps, save_every=save_every, rtol=rtol,
        atol=atol, max_steps=max_steps, interpret=interpret, block=block,
        mesh=mesh,
    )


def solve_lle_batch_rk45_pallas(
    psi0: np.ndarray,
    detuning,
    pump_re,
    pump_im,
    lin_phase,
    *,
    dt: float,
    n_steps: int,
    save_every: int,
    rtol: float,
    atol: float,
    max_steps: int = 100_000,
    interpret: bool = False,
    block: int = None,
    mesh=None,
) -> SSFMAdaptiveResult:
    """Fused adaptive LLE solve (affine linear substep: per-lane detuning
    rotation + exact drive offset computed IN KERNEL per attempt).
    Contract mirrors ``models/lle._lle_adaptive_solver`` reduce mode."""
    B = np.asarray(psi0).shape[0]
    det = np.broadcast_to(np.asarray(detuning, np.float64), (B,))
    fre = np.broadcast_to(np.asarray(pump_re, np.float64), (B,))
    fim = np.broadcast_to(np.asarray(pump_im, np.float64), (B,))
    # 1/Lam0 with Lam0 = -(1 + i Delta), precomputed in f64 on the host
    mag2 = 1.0 + det * det
    il0r = -1.0 / mag2
    il0i = det / mag2
    return _solve(
        psi0, np.ones(B), np.full(B, -1.0), lin_phase,
        (det, fre, fim, il0r, il0i),
        dz=dt, n_steps=n_steps, save_every=save_every, rtol=rtol,
        atol=atol, max_steps=max_steps, interpret=interpret, block=block,
        mesh=mesh,
    )
