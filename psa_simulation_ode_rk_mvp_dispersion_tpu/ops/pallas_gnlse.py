"""Pallas TPU kernel: fused single-launch SSFM (GNLSE, Kerr) solver (x32).

The XLA scan SSFM (``models/gnlse.py``) round-trips the whole (B, T) field
through HBM for every FFT of every split step and dispatches one loop
iteration per step; measured on v5e it runs at ~6-17% of HBM peak -- the
program is latency/dispatch-bound, not bandwidth- or FLOP-bound
(BENCH_GNLSE.md).  This kernel keeps the batched field in VMEM for the
whole integration and evaluates each length-T DFT as a GROUP-SPLIT matmul
on the MXU:

- Decimation in time with T = r * m (m = 128): sample n = q*r + g splits
  the field into r polyphase groups of length m.  Forward transform =
  one (m, 2m) @ (2m, blk) stacked-complex matmul per group (full 2m=256
  contraction depth on the MXU), a per-group twiddle multiply
  W_T^{g d}, and an r-point DFT across groups with SCALAR weights —
  dense r^2 plane FMAs by default (python-unrolled; +-1 / +-i weights
  are special-cased), or a compile-time-unrolled radix-2 FFT over the
  group planes (``PSA_GNLSE_PALLAS_XGROUP=fft``; measured slower at r=8
  and VMEM-OOM with the in-kernel NL body — see XGROUP below).
  MAC cost per instance per transform pair is 2*T*m complex MACs --
  T/m = r times cheaper than a dense T x T DFT matmul, with every
  matmul perfectly MXU-shaped.
- The spectrum lands in NATURAL k order (k = c*m + d maps to row c*m+d),
  so the split-step linear factors exp((-alpha/2 + i*phi(omega)) h) are
  plain precomputed (T, B) planes -- per-instance dispersion, flat OR
  spectral loss all collapse into them.
- State layout: (2T, blk) f32 planes, rows grouped as
  [ar_g (m rows); ai_g (m rows)] per group g -- each group's stacked
  complex pair is one static slice (the 'block' complex-matmul variant of
  ``ops/pallas_comb.py``).
- Step structure mirrors ``models/gnlse._chunk_stepper`` exactly: each
  save chunk is Lh, (K, Lf)^(k-1), K, Lh with per-chunk NaN freeze and
  the running max-over-saved-samples peak reduction -- the contract of
  ``models/gnlse._gnlse_reduce_solver`` (reference save-decimation
  semantics: /root/reference/integrators.py:137-140).

The nonlinear substep is the exact Kerr rotation by default; with
``nl=`` (:class:`models.gnlse.NLTerms`) it becomes the same in-kernel RK4
on the generalized operator that the scan engine integrates
(``models/gnlse._nl_substep``).  As implemented (the module's time axis
is the reverse of Agrawal's retarded time -- ``_nl_rhs``'s t = -T note --
so the shock derivative is SUBTRACTED and the Raman kernel conjugated):
N(A) = i gamma [W - (i/w0) dW/dt], W = A((1-f_R)P + f_R conj(H_R)*P),
with every transform staying in VMEM:

- the Raman convolution forward-transforms the REAL power waveform
  (imag block dropped: 2 (m, m) matmuls per group instead of 2 (m, 2m)),
  multiplies by conj(H_R) in natural k order, and takes only the REAL
  part of the inverse (1 matmul per group);
- the self-steepening derivative is a full complex pair with the
  i*omega multiply and the final i gamma (W - (i/w0) dW/dt) combine
  fused into the inverse's per-group write;
- ``f_r == 0`` / ``inv_w0 == 0`` are STATIC flags: each disabled term's
  transforms drop out of the kernel at trace time (so nl with both off
  is the scan engine's RK4-pure-Kerr path, not the rotation).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

import os

LANES = 128
M_SUB = 128      # polyphase sub-transform length (= MXU contraction / 2)
# 512 lanes/block (round 4): same-session A/B at the bench shape (T=1024,
# B=2048, 1000 Kerr steps) measured 1.90M inst-steps/s at 512 vs 1.60M at
# 256 (+19%, and rep spread collapsed 2.3x -> 1.04x); lane results are
# block-size-independent (lanes never mix), so this is a pure schedule win.
# The KERR body only: the in-kernel Raman/steepening RK4 and the vector
# kernel carry ~2-3x the live planes and blow the remote-compile VMEM
# limits at 512 (measured HTTP 500, 2026-08-19) -- they stay at NL_BLOCK.
BLOCK = int(os.environ.get("PSA_GNLSE_PALLAS_BLOCK", "512"))
NL_BLOCK = int(os.environ.get("PSA_GNLSE_PALLAS_NL_BLOCK", "256"))
MAX_R = 16       # cap on polyphase groups (T <= 2048)
# DFT matmul accuracy/speed knob: 'x6' = f32-equivalent (6 bf16 passes),
# 'x3' = 3-pass compensated bf16 (2x the MXU pass rate, but the dropped
# wl@xl cross term costs real accuracy over long integrations).  Measured
# on v5e at the bench shape (T=1024, B=2048, 1000 steps): power error vs
# x64 is 2.9e-4 core / 1.9e-2 tails for x6 (BETTER than the c64 scan
# engine: 4.5e-3 / 2.6e-2) vs 9.1e-3 / 0.43 for x3, at indistinguishable
# wall clock (the kernel is not MXU-pass-bound).  Default: x6.
DOT_ALG = os.environ.get("PSA_GNLSE_PALLAS_DOT", "x6")
# Cross-group r-point DFT strategy: 'fma' = dense unrolled FMAs (r^2
# plane ops, DEFAULT), 'fft' = radix-2 butterflies ((r/2) log2 r plane
# ops).  Measured on v5e at T=1024 (r=8, 2026-08-17): the fft path is
# NOT faster for the Kerr body (1.86M vs 2.0M inst-steps/s — the
# cross-group stage is a small share of the kernel and the butterfly
# chains serialize), and with the in-kernel Raman/steepening body it
# exceeds the 100M scoped-VMEM limit (all r planes live through log2 r
# stages vs the dense path's freed accumulators).  Kept as an opt-in
# A/B lever for wider r; non-power-of-two r falls back to 'fma'.
XGROUP = os.environ.get("PSA_GNLSE_PALLAS_XGROUP", "fma")


def _dft_weight_blocks(m: int, inv_extra: float = 1.0):
    """Stacked-complex DFT_m weights: forward [fr | -fi] / [fi | fr] and
    inverse [ir | -ii] / [ii | ir], each (m, 2m) f32 (G = W @ [ar; ai]).
    ``inv_extra`` folds an additional 1/x into the inverse weights (the
    radix-2 cross-group path bakes its 1/r here so the butterflies stay
    unit-modulus)."""
    ang = (-2.0 * np.pi / m) * np.outer(np.arange(m), np.arange(m))
    fr, fi = np.cos(ang), np.sin(ang)
    ir, ii = fr / (m * inv_extra), -fi / (m * inv_extra)   # conj(F)/(m x)
    f32 = np.float32
    return (
        np.concatenate([fr, -fi], axis=1).astype(f32),
        np.concatenate([fi, fr], axis=1).astype(f32),
        np.concatenate([ir, -ii], axis=1).astype(f32),
        np.concatenate([ii, ir], axis=1).astype(f32),
    )


def _group_perm(t: int, m: int) -> np.ndarray:
    """perm[row] = sample index held by state row ``row`` (within a group
    block of 2m rows, the first m are real, handled by the caller)."""
    r = t // m
    # row g*m + q  holds sample n = q*r + g
    g = np.repeat(np.arange(r), m)
    q = np.tile(np.arange(m), r)
    return q * r + g


def _pack_grouped(A0p: np.ndarray, t: int, m: int) -> np.ndarray:
    """(Bp, T) complex -> the kernel's grouped-stacked (2T, Bp) f32 layout:
    row 2*g*m + q -> Re A[q*r+g], row (2*g+1)*m + q -> Im A[q*r+g]."""
    perm = _group_perm(t, m)
    r = t // m
    ar = A0p.real.T.astype(np.float32)[perm]
    ai = A0p.imag.T.astype(np.float32)[perm]
    rows = []
    for gg in range(r):
        rows.append(ar[gg * m:(gg + 1) * m])
        rows.append(ai[gg * m:(gg + 1) * m])
    return np.concatenate(rows, axis=0)


def _unpack_grouped(yl: np.ndarray, t: int, m: int, b: int) -> np.ndarray:
    """Inverse of :func:`_pack_grouped`: (2T, Bp) planes -> (b, T) c128."""
    r = t // m
    perm = _group_perm(t, m)
    ar = np.concatenate([yl[2 * gg * m:(2 * gg + 1) * m] for gg in range(r)],
                        axis=0)
    ai = np.concatenate([yl[(2 * gg + 1) * m:2 * (gg + 1) * m]
                         for gg in range(r)], axis=0)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(t)
    return (ar[inv] + 1j * ai[inv]).T[:b]


def _scalar_fma(acc_r, acc_i, wr: float, wi: float, xr, xi):
    """acc += (wr + i wi) * (xr + i xi) with +-1 / +-i fast paths."""
    f = np.float32
    if abs(wi) < 1e-12:
        if abs(wr - 1.0) < 1e-12:
            return acc_r + xr, acc_i + xi
        if abs(wr + 1.0) < 1e-12:
            return acc_r - xr, acc_i - xi
        return acc_r + f(wr) * xr, acc_i + f(wr) * xi
    if abs(wr) < 1e-12:
        if abs(wi - 1.0) < 1e-12:
            return acc_r - xi, acc_i + xr
        if abs(wi + 1.0) < 1e-12:
            return acc_r + xi, acc_i - xr
        return acc_r - f(wi) * xi, acc_i + f(wi) * xr
    return (acc_r + f(wr) * xr - f(wi) * xi,
            acc_i + f(wr) * xi + f(wi) * xr)


def _scalar_cmul(wr: float, wi: float, xr, xi):
    """(wr + i wi) * (xr + i xi) with +-1 / +-i fast paths."""
    f = np.float32
    if abs(wi) < 1e-12:
        if abs(wr - 1.0) < 1e-12:
            return xr, xi
        if abs(wr + 1.0) < 1e-12:
            return -xr, -xi
        return f(wr) * xr, f(wr) * xi
    if abs(wr) < 1e-12:
        if abs(wi - 1.0) < 1e-12:
            return -xi, xr
        if abs(wi + 1.0) < 1e-12:
            return xi, -xr
        return -f(wi) * xi, f(wi) * xr
    return f(wr) * xr - f(wi) * xi, f(wr) * xi + f(wi) * xr


def _bitrev(n: int):
    bits = n.bit_length() - 1
    return [int(format(i, f"0{bits}b")[::-1], 2) for i in range(n)]


def _fft_planes(xr, xi, sign: float):
    """Radix-2 DIT FFT over python LISTS of (m, blk) planes (compile-time
    unrolled): out[k] = sum_j exp(sign * 2i pi j k / r) in[j].  ``sign=-1``
    is the forward DFT; ``sign=+1`` the un-normalized inverse (the caller
    bakes the 1/r elsewhere).  r = len(xr) must be a power of two.  Cost is
    (r/2) log2 r butterflies of one scalar cmul + two plane adds, vs the
    dense path's r^2 scalar FMAs; the stage-0/1 weights are all +-1 / +-i
    so their cmuls are free sign flips."""
    rN = len(xr)
    order = _bitrev(rN)
    xr = [xr[j] for j in order]
    xi = [xi[j] for j in order]
    span = 1
    while span < rN:
        step = span * 2
        for k in range(span):
            ang = sign * 2.0 * np.pi * k / step
            wr, wi = float(np.cos(ang)), float(np.sin(ang))
            for base in range(0, rN, step):
                i0, i1 = base + k, base + k + span
                tr, ti = _scalar_cmul(wr, wi, xr[i1], xi[i1])
                xr[i1], xi[i1] = xr[i0] - tr, xi[i0] - ti
                xr[i0], xi[i0] = xr[i0] + tr, xi[i0] + ti
        span = step
    return xr, xi


def _use_fft(t: int, m: int) -> bool:
    r = t // m
    return XGROUP == "fft" and r > 1 and (r & (r - 1)) == 0


def _make_dft_ops(t: int, m: int, x3: bool, wfr, wfi, wir, wii, twiddle):
    """Group-plane DFT machinery shared by the scalar and vector SSFM
    kernels (called INSIDE a kernel body; ``wfr``..`` wii`` are the loaded
    (m, 2m) stacked weights, ``twiddle(g, gr, gi, conj=False)`` the
    polyphase twiddle).  Returns
    ``(fwd_cplx, fwd_real, inv_cplx, inv_real, pair_mm, single_mm)``:

    - ``fwd_cplx(read_g)`` / ``fwd_real(read_g)``: forward DFT, group
      layout -> natural-k-order (Sr, Si) lists of r (m, blk) planes;
      ``read_g(g)`` yields group g's stacked (2m, blk) complex block
      (fwd_real: the (m, blk) real block, imag dropped -- 2 (m, m)
      matmuls per group).
    - ``inv_cplx(Sr, Si, write)`` / ``inv_real(Sr, Si, write)``: inverse;
      ``write(g, or_, oi)`` / ``write(g, or_)`` stores group g's planes
      (no (2T, blk) temporaries).

    ``x3`` selects the 3-pass compensated hi/lo-bf16 dot path (see
    DOT_ALG); the cross-group r-point stage follows XGROUP.
    """
    f32 = jnp.float32
    r = t // m
    use_fft = _use_fft(t, m)
    wf = [[np.exp(-2j * np.pi * gg * cc / r) for cc in range(r)]
          for gg in range(r)]

    def xdft_fwd(Gr, Gi):
        """Cross-group r-point DFT: group-order planes -> natural c order."""
        if use_fft:
            return _fft_planes(Gr, Gi, -1.0)
        Sr = [np.float32(0.0)] * r
        Si = [np.float32(0.0)] * r
        for g in range(r):
            for c in range(r):
                Sr[c], Si[c] = _scalar_fma(
                    Sr[c], Si[c], wf[g][c].real, wf[g][c].imag, Gr[g], Gi[g])
        return Sr, Si

    def xdft_inv(Sr, Si):
        """Cross-group inverse: natural c order -> group order.  The 1/r is
        baked into the IDFT_m matmul weights on the fft path (unit-modulus
        butterflies) and into the scalar weights on the dense path."""
        if use_fft:
            return _fft_planes(Sr, Si, 1.0)
        inv_r = 1.0 / r
        Hr = []
        Hi = []
        for g in range(r):
            hr = hi = np.float32(0.0)
            for c in range(r):
                hr, hi = _scalar_fma(hr, hi, wf[g][c].real * inv_r,
                                     -wf[g][c].imag * inv_r, Sr[c], Si[c])
            Hr.append(hr)
            Hi.append(hi)
        return Hr, Hi

    bf16 = jnp.bfloat16
    d3 = functools.partial(
        lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=lax.Precision.DEFAULT,
    )

    def _split(x):
        xh = x.astype(bf16)
        return xh, (x - xh.astype(f32)).astype(bf16)

    def mm(w, x):
        return lax.dot_general(
            w, x, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )

    def pair_mm(wr, wi, x):
        """(wr @ x, wi @ x) sharing x's hi/lo split on the x3 path."""
        if not x3:
            return mm(wr, x), mm(wi, x)
        xh, xl = _split(x)
        wrh, wrl = _split(wr)
        wih, wil = _split(wi)
        return (d3(wrh, xh) + (d3(wrh, xl) + d3(wrl, xh)),
                d3(wih, xh) + (d3(wih, xl) + d3(wil, xh)))

    def single_mm(w, x):
        """w @ x on the same accuracy contract as pair_mm."""
        if not x3:
            return mm(w, x)
        xh, xl = _split(x)
        wh, wl = _split(w)
        return d3(wh, xh) + (d3(wh, xl) + d3(wl, xh))

    def fwd_cplx(read_g):
        Gr = []
        Gi = []
        for g in range(r):
            gr, gi = pair_mm(wfr, wfi, read_g(g))
            gr, gi = twiddle(g, gr, gi)
            Gr.append(gr)
            Gi.append(gi)
        return xdft_fwd(Gr, Gi)

    def fwd_real(read_g):
        frm = wfr[:, 0:m]
        fim = wfi[:, 0:m]
        Gr = []
        Gi = []
        for g in range(r):
            gr, gi = pair_mm(frm, fim, read_g(g))
            gr, gi = twiddle(g, gr, gi)
            Gr.append(gr)
            Gi.append(gi)
        return xdft_fwd(Gr, Gi)

    def inv_cplx(Sr, Si, write):
        Hr, Hi = xdft_inv(Sr, Si)
        for g in range(r):
            hr, hi = twiddle(g, Hr[g], Hi[g], conj=True)
            vg = jnp.concatenate([hr, hi], axis=0)
            or_, oi = pair_mm(wir, wii, vg)
            write(g, or_, oi)

    def inv_real(Sr, Si, write):
        Hr, Hi = xdft_inv(Sr, Si)
        for g in range(r):
            hr, hi = twiddle(g, Hr[g], Hi[g], conj=True)
            vg = jnp.concatenate([hr, hi], axis=0)
            write(g, single_mm(wir, vg))

    return fwd_cplx, fwd_real, inv_cplx, inv_real, pair_mm, single_mm


def _kernel_body(n_steps: int, save_every: int, t: int, m: int, dz: float,
                 interpret: bool = False,
                 nl_static: "tuple[float, float] | None" = None,
                 affine: bool = False):
    r = t // m
    n_chunks = n_steps // save_every
    remainder = n_steps - n_chunks * save_every
    f32 = jnp.float32
    gh = np.float32(dz)                      # Kerr angle scale: gamma*h*P
    # generalized-nonlinearity static parameters (shared across the batch,
    # like the scan engine's NLTerms): compile-time floats so disabled
    # terms drop their transforms at trace time
    f_r = inv_w0 = 0.0
    if nl_static is not None:
        f_r, inv_w0 = (float(nl_static[0]), float(nl_static[1]))
    has_raman = nl_static is not None and f_r > 0.0
    has_steep = nl_static is not None and inv_w0 != 0.0
    if affine and nl_static is not None:
        raise ValueError("the affine (LLE) linear substep is Kerr-only")

    # Mosaic's dot lowering takes only a (Precision, Precision) pair -- no
    # DotAlgorithmPreset.  'x6' is plain HIGHEST (6 bf16 passes, f32-class).
    # 'x3' is a MANUAL compensated split: both operands split into (hi, lo)
    # bf16 planes and w@x ~= wh@xh + wh@xl + wl@xh -- 3 full-rate bf16 MXU
    # passes, ~2x the HIGHEST throughput, error ~2^-21 relative for
    # unit-modulus DFT weights (dropping wl@xl costs ~2^-16*2^-8).
    # Interpret mode (XLA:CPU) keeps HIGHEST: same f32-class contract
    # without emulating bf16 arithmetic.
    x3 = DOT_ALG == "x3" and not interpret

    def kernel(*refs):
        (wfr_ref, wfi_ref, wir_ref, wii_ref, lh_ref, gam_ref) = refs[:6]
        i = 6
        aff_ref = None
        if affine:
            # (8, blk) per-instance affine rows: [dp_h re | dp_h im | dF_h
            # re | dF_h im | dp_f ... | dF_f ...] -- the scalar detuning
            # phase and exact drive offset for the half and full steps
            aff_ref = refs[i]
            i += 1
        hrc_ref = om_ref = None
        if nl_static is not None:
            hrc_ref, om_ref = refs[i:i + 2]
            i += 2
        y0_ref, pk_ref, ylast_ref, ok_ref = refs[i:i + 4]
        i += 4
        # VMEM scratch: ping-pong state (u, v), the derived full-step
        # factor, (r > 1) the lane-width-1 polyphase twiddles, and (nl)
        # the RK4 planes [P|R], k-current, k-accumulator, stage input --
        # explicit buffers keep the Mosaic stack allocation bounded (a
        # value-carried fori version of this body OOMs the 16 MB budget).
        # The frozen save-state lives directly in the ylast OUTPUT ref.
        u_ref, v_ref, lf_ref = refs[i:i + 3]
        i += 3
        tw_ref = None
        if r > 1:
            tw_ref = refs[i]
            i += 1
        pr_ref = kt_ref = ka_ref = st_ref = None
        if nl_static is not None:
            pr_ref, kt_ref, ka_ref, st_ref = refs[i:i + 4]
        s_ref = ylast_ref
        wfr = wfr_ref[:, :]
        wfi = wfi_ref[:, :]
        wir = wir_ref[:, :]
        wii = wii_ref[:, :]
        gam = gam_ref[:, :]                  # (1, blk)
        blk = gam.shape[1]

        u_ref[:, :] = y0_ref[:, :]
        s_ref[:, :] = y0_ref[:, :]
        # full-step factor from the half-step one (exp(x h/2)^2 = exp(x h)):
        # saves a (2T, blk) input block + its pipeline double buffer
        lhr = lh_ref[0:t, :]
        lhi = lh_ref[t:2 * t, :]
        lf_ref[0:t, :] = lhr * lhr - lhi * lhi
        lf_ref[t:2 * t, :] = (lhr + lhr) * lhi
        # polyphase twiddles W_T^{g d} in group-plane layout (row g*m + d),
        # lane-width-1 (they are lane-independent; Mosaic broadcasts the
        # width-1 operand in the multiplies), from an in-kernel iota
        if r > 1:
            rows = lax.broadcasted_iota(jnp.int32, (t, 1), 0)
            gidx = rows // m
            didx = rows - gidx * m
            ang = np.float32(-2.0 * np.pi / t) * (gidx * didx).astype(f32)
            tw_ref[0:t, :] = jnp.cos(ang)
            tw_ref[t:2 * t, :] = jnp.sin(ang)

        def _twiddle(g, gr, gi, conj=False):
            if r == 1:
                return gr, gi
            tr = tw_ref[g * m:(g + 1) * m, :]
            ti = tw_ref[t + g * m:t + (g + 1) * m, :]
            if conj:
                return gr * tr + gi * ti, gi * tr - gr * ti
            return gr * tr - gi * ti, gr * ti + gi * tr

        fwd_cplx, fwd_real, inv_cplx, inv_real, _pmm, _smm = _make_dft_ops(
            t, m, x3, wfr, wfi, wir, wii, _twiddle)

        def lin(src, dst, fac_ref, aff_off=0):
            """One linear substep dst = IDFT( fac * DFT(src) ), group layout.

            ``fac_ref`` holds natural-k-order stacked (2T, blk) factor
            planes (re rows 0..T, im rows T..2T).  The spectrum is streamed
            through r (m, blk) accumulators; the inverse writes straight
            into ``dst`` slices -- no (2T, blk) temporaries.

            With ``affine`` (the LLE driven-damped substep), each inverse
            write is followed by the per-instance scalar detuning rotation
            and the exact constant drive offset ``dst = out * dp + dF``
            (``models/lle._lle_chunk_strang``'s lin_half/lin_full);
            ``aff_off`` selects the half-step (0) or full-step (4) rows of
            the affine input."""
            Sr, Si = fwd_cplx(lambda g: src[2 * g * m:2 * (g + 1) * m, :])
            # natural-order spectrum: apply the linear factor in place
            for c in range(r):
                fr_c = fac_ref[c * m:(c + 1) * m, :]
                fi_c = fac_ref[t + c * m:t + (c + 1) * m, :]
                Sr[c], Si[c] = (Sr[c] * fr_c - Si[c] * fi_c,
                                Sr[c] * fi_c + Si[c] * fr_c)

            if affine:
                dpr = aff_ref[aff_off:aff_off + 1, :]
                dpi = aff_ref[aff_off + 1:aff_off + 2, :]
                dfr = aff_ref[aff_off + 2:aff_off + 3, :]
                dfi = aff_ref[aff_off + 3:aff_off + 4, :]

                def write(g, or_, oi):
                    dst[2 * g * m:(2 * g + 1) * m, :] = \
                        or_ * dpr - oi * dpi + dfr
                    dst[(2 * g + 1) * m:2 * (g + 1) * m, :] = \
                        or_ * dpi + oi * dpr + dfi
            else:
                def write(g, or_, oi):
                    dst[2 * g * m:(2 * g + 1) * m, :] = or_
                    dst[(2 * g + 1) * m:2 * (g + 1) * m, :] = oi

            inv_cplx(Sr, Si, write)

        def kerr(src, dst):
            """Exact rotation exp(i gamma h P) per sample (group layout)."""
            for g in range(r):
                ar = src[2 * g * m:(2 * g + 1) * m, :]
                ai = src[(2 * g + 1) * m:2 * (g + 1) * m, :]
                ang = (gam * gh) * (ar * ar + ai * ai)
                ca = jnp.cos(ang)
                sa = jnp.sin(ang)
                dst[2 * g * m:(2 * g + 1) * m, :] = ar * ca - ai * sa
                dst[(2 * g + 1) * m:2 * (g + 1) * m, :] = ar * sa + ai * ca

        def nl_rhs(src, dst):
            """dst = N(src): the generalized nonlinear operator, mirroring
            ``models/gnlse._nl_rhs`` (src and dst are distinct (2T, blk)
            grouped-complex refs; dst doubles as the W buffer)."""
            one_m_fr = np.float32(1.0 - f_r)
            fr_f = np.float32(f_r)
            # P = |A|^2 into pr rows 0..T (group layout)
            for g in range(r):
                ar = src[2 * g * m:(2 * g + 1) * m, :]
                ai = src[(2 * g + 1) * m:2 * (g + 1) * m, :]
                pr_ref[g * m:(g + 1) * m, :] = ar * ar + ai * ai
            if has_raman:
                # R = Re IDFT( conj(H_R) * DFT(P) ) into pr rows T..2T
                Sr, Si = fwd_real(lambda g: pr_ref[g * m:(g + 1) * m, :])
                for c in range(r):
                    hr_c = hrc_ref[c * m:(c + 1) * m, :]
                    hi_c = hrc_ref[t + c * m:t + (c + 1) * m, :]
                    Sr[c], Si[c] = (Sr[c] * hr_c - Si[c] * hi_c,
                                    Sr[c] * hi_c + Si[c] * hr_c)

                def write_r(g, rr):
                    pr_ref[t + g * m:t + (g + 1) * m, :] = rr

                inv_real(Sr, Si, write_r)
            # W = A ((1-f_R) P + f_R R); without steepening the combine
            # N = i gamma W happens right here (no W transform needed)
            for g in range(r):
                fac = one_m_fr * pr_ref[g * m:(g + 1) * m, :]
                if has_raman:
                    fac = fac + fr_f * pr_ref[t + g * m:t + (g + 1) * m, :]
                ar = src[2 * g * m:(2 * g + 1) * m, :]
                ai = src[(2 * g + 1) * m:2 * (g + 1) * m, :]
                if has_steep:
                    dst[2 * g * m:(2 * g + 1) * m, :] = ar * fac
                    dst[(2 * g + 1) * m:2 * (g + 1) * m, :] = ai * fac
                else:
                    dst[2 * g * m:(2 * g + 1) * m, :] = -gam * (ai * fac)
                    dst[(2 * g + 1) * m:2 * (g + 1) * m, :] = gam * (ar * fac)
            if has_steep:
                # dW/dt = IDFT( i omega DFT(W) ); the final combine
                # N = i gamma (W - (i/w0) dW/dt) fuses into the inverse write
                iw0 = np.float32(inv_w0)
                Sr, Si = fwd_cplx(lambda g: dst[2 * g * m:2 * (g + 1) * m, :])
                for c in range(r):
                    w_c = om_ref[c * m:(c + 1) * m, :]
                    Sr[c], Si[c] = -w_c * Si[c], w_c * Sr[c]

                def write_n(g, vr, vi):
                    wr_ = dst[2 * g * m:(2 * g + 1) * m, :]
                    wi_ = dst[(2 * g + 1) * m:2 * (g + 1) * m, :]
                    tr_ = wr_ + iw0 * vi          # W - (i/w0) V, V = dW/dt
                    ti_ = wi_ - iw0 * vr
                    dst[2 * g * m:(2 * g + 1) * m, :] = -gam * ti_
                    dst[(2 * g + 1) * m:2 * (g + 1) * m, :] = gam * tr_

                inv_cplx(Sr, Si, write_n)

        def nlsub(src, dst):
            """RK4 substep of length h = dz on N (``_nl_substep`` mirror);
            src must stay intact (it is the base state y)."""
            half = np.float32(0.5 * dz)
            full = np.float32(dz)
            sixth = np.float32(dz / 6.0)
            two = np.float32(2.0)
            nl_rhs(src, kt_ref)                                   # k1
            ka_ref[:, :] = kt_ref[:, :]
            st_ref[:, :] = src[:, :] + half * kt_ref[:, :]
            nl_rhs(st_ref, kt_ref)                                # k2
            ka_ref[:, :] = ka_ref[:, :] + two * kt_ref[:, :]
            st_ref[:, :] = src[:, :] + half * kt_ref[:, :]
            nl_rhs(st_ref, kt_ref)                                # k3
            ka_ref[:, :] = ka_ref[:, :] + two * kt_ref[:, :]
            st_ref[:, :] = src[:, :] + full * kt_ref[:, :]
            nl_rhs(st_ref, kt_ref)                                # k4
            dst[:, :] = src[:, :] + sixth * (ka_ref[:, :] + kt_ref[:, :])

        nl_sub = nlsub if nl_static is not None else kerr

        def peak_of(ref):
            """(1, blk) max over samples of |A|^2."""
            pk = None
            for g in range(r):
                ar = ref[2 * g * m:(2 * g + 1) * m, :]
                ai = ref[(2 * g + 1) * m:2 * (g + 1) * m, :]
                p = jnp.max(ar * ar + ai * ai, axis=0, keepdims=True)
                pk = p if pk is None else jnp.maximum(pk, p)
            return pk

        def steps_refs(k):
            """k fused symmetric split steps (``_chunk_stepper`` mirror):
            u -> v, ping-ponging through the scratch pair.  The affine
            half-step maps compose exactly into the full-step map, so the
            interior fusion is valid for the LLE variant too
            (``models/lle._lle_chunk_strang``)."""
            lin(u_ref, v_ref, lh_ref, 0)

            def body(_i, c):
                nl_sub(v_ref, u_ref)
                lin(u_ref, v_ref, lf_ref, 4)
                return c

            if k > 1:
                lax.fori_loop(0, k - 1, body, jnp.int32(0))
            nl_sub(v_ref, u_ref)
            lin(u_ref, v_ref, lh_ref, 0)

        def v_finite():
            v = v_ref[:, :]
            # NaN compares false against the f32-max bound, so this is the
            # same flag as an explicit isfinite reduction
            return jnp.all(jnp.abs(v) < np.float32(3.4e38),
                           axis=0, keepdims=True).astype(f32)

        ok0 = jnp.ones_like(gam[0:1, :])
        pk0 = peak_of(s_ref)

        def chunk(_c, carry):
            ok, pk = carry
            steps_refs(save_every)
            ok_n = ok * v_finite()
            # frozen lanes keep their last good chunk state in s (the scan
            # engine's where-freeze contract); u continues from the raw
            # chunk result either way (frozen lanes' values are masked)
            s_ref[:, :] = jnp.where(ok_n > np.float32(0.0),
                                    v_ref[:, :], s_ref[:, :])
            u_ref[:, :] = v_ref[:, :]
            pk = jnp.maximum(pk, peak_of(s_ref))
            return (ok_n, pk)

        ok, pk = lax.fori_loop(0, n_chunks, chunk, (ok0, pk0))
        if remainder > 0:
            # trailing partial steps: integrated (they can flip ok) but
            # unsaved (framework saved-grid convention)
            steps_refs(remainder)
            ok = ok * v_finite()
        pk_ref[:, :] = pk
        ok_ref[:, :] = ok

    return kernel


def _make_gnlse_call(n_steps: int, save_every: int, t: int, dz: float,
                     interpret: bool, block: int,
                     nl_static: "tuple[float, float] | None" = None,
                     affine: bool = False):
    from jax.experimental import pallas as pl

    m = M_SUB if t >= M_SUB else t
    # fft cross-group path: its butterflies are unit-modulus, so the 1/r
    # normalization folds into the IDFT_m matmul weights instead
    inv_extra = float(t // m) if _use_fft(t, m) else 1.0
    wfr, wfi, wir, wii = _dft_weight_blocks(m, inv_extra)
    kernel = _kernel_body(n_steps, save_every, t, m, dz, interpret, nl_static,
                          affine)
    weights = [jnp.asarray(w) for w in (wfr, wfi, wir, wii)]
    has_nl = nl_static is not None

    def call(lh, gam, y0, hrc=None, om=None, aff=None):
        from jax.experimental.pallas import tpu as pltpu

        B = y0.shape[1]
        blk = min(block, B)
        grid = (B // blk,)
        spec_kwargs = {}
        call_kwargs = {}
        if not interpret:
            spec_kwargs = {"memory_space": pltpu.VMEM}
            # the default 16 MB scoped-vmem budget is conservative (v5e has
            # 128 MB): the kernel's live set (3 state-sized scratch planes +
            # factor/state blocks + unrolled-DFT temporaries) wants ~24 MB
            # at T=1024 (4 more planes with nl); give Mosaic real headroom
            call_kwargs = {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)}
        r = t // m
        # explicit VMEM scratch: ping-pong state pair, derived full-step
        # factor, (r > 1) the lane-width-1 polyphase twiddles (the frozen
        # save-state reuses the ylast output block), and (nl) the RK4
        # planes [P|R], k-current, k-accumulator, stage input
        scratch = [pltpu.VMEM((2 * t, blk), jnp.float32) for _ in range(3)]
        if r > 1:
            scratch.append(pltpu.VMEM((2 * t, 1), jnp.float32))
        if has_nl:
            scratch += [pltpu.VMEM((2 * t, blk), jnp.float32)
                        for _ in range(4)]
        fixed = [
            pl.BlockSpec(w.shape, lambda i: (0, 0), **spec_kwargs)
            for w in weights
        ]
        per_b = [
            pl.BlockSpec((2 * t, blk), lambda i: (0, i), **spec_kwargs),   # lh
            pl.BlockSpec((1, blk), lambda i: (0, i), **spec_kwargs),       # gam
        ]
        args = [lh, gam]
        if affine:
            per_b.append(
                pl.BlockSpec((8, blk), lambda i: (0, i), **spec_kwargs))   # aff
            args.append(aff)
        if has_nl:
            per_b += [
                pl.BlockSpec((2 * t, 1), lambda i: (0, 0), **spec_kwargs),  # hrc
                pl.BlockSpec((t, 1), lambda i: (0, 0), **spec_kwargs),      # om
            ]
            args += [hrc, om]
        per_b.append(
            pl.BlockSpec((2 * t, blk), lambda i: (0, i), **spec_kwargs))    # y0
        args.append(y0)
        out_specs = (
            pl.BlockSpec((1, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((2 * t, blk), lambda i: (0, i), **spec_kwargs),
            pl.BlockSpec((1, blk), lambda i: (0, i), **spec_kwargs),
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=fixed + per_b,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((2 * t, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
            ),
            # y0's block is the dead initial value of ylast: alias them to
            # drop one (2T, blk) VMEM buffer
            input_output_aliases={len(weights) + len(per_b) - 1: 1},
            scratch_shapes=scratch,
            interpret=interpret,
            **call_kwargs,
        )(*weights, *args)

    return call


@functools.lru_cache(maxsize=32)
def _pallas_gnlse_solver(n_steps: int, save_every: int, t: int, dz: float,
                         interpret: bool, block: int,
                         nl_static=None):
    call = _make_gnlse_call(n_steps, save_every, t, dz, interpret, block,
                            nl_static)

    def fused(lh, gam, y0, *nl_args):
        B = y0.shape[1]
        # factors may arrive lane-shared (2T, 1): broadcast device-side so
        # the host never ships (2T, B) over the tunnel for shared coeffs
        lh = jnp.broadcast_to(lh, (lh.shape[0], B))
        pk, ylast, ok = call(lh, gam, y0, *nl_args)
        # one stacked output: each device->host fetch costs a ~30 ms tunnel
        # round trip regardless of size (docs/PERF.md rule 7)
        return jnp.concatenate([pk, ylast, ok], axis=0)

    return jax.jit(fused)


@functools.lru_cache(maxsize=16)
def _pallas_gnlse_solver_sharded(n_steps: int, save_every: int, t: int,
                                 dz: float, interpret: bool, block: int, mesh,
                                 nl_static=None):
    """shard_map wrapper: batch (lane) axis split over the mesh; weights are
    closure constants replicated per shard; nl planes (lane-width-1)
    replicated."""
    from jax.sharding import PartitionSpec

    call = _make_gnlse_call(n_steps, save_every, t, dz, interpret, block,
                            nl_static)

    def fused(lh, gam, y0, *nl_args):
        pk, ylast, ok = call(lh, gam, y0, *nl_args)
        return jnp.concatenate([pk, ylast, ok], axis=0)

    axes = tuple(mesh.axis_names)
    spec = PartitionSpec(None, axes if len(axes) > 1 else axes[0])
    rep = PartitionSpec(None, None)
    in_specs = (spec, spec, spec) + ((rep, rep) if nl_static is not None
                                     else ())
    return jax.jit(
        jax.shard_map(
            fused, mesh=mesh,
            in_specs=in_specs,
            out_specs=spec,
            check_vma=False,
        )
    ), spec


def solve_gnlse_batch_pallas(
    A0: np.ndarray,
    gamma,
    alpha,
    lin_phase,
    *,
    dz_m: float,
    n_steps: int,
    save_every: int,
    interpret: bool = False,
    block: int = None,
    mesh=None,
    nl=None,
):
    """Fused-kernel batched SSFM solve; contract mirrors
    ``models/gnlse._gnlse_reduce_solver`` (fixed-step, x32): returns host
    ``(peak_max (B,), A_last (B, T), ok (B,))``.

    ``A0`` is ``(B, T)`` complex; ``gamma`` broadcasts to ``(B,)``;
    ``alpha`` is flat (scalar / (B,)) or spectral ((T,) / (B, T),
    fft-ordered); ``lin_phase`` is ``(T,)`` or ``(B, T)`` [rad/m].  T must
    be a multiple of 128 and at most ``128 * MAX_R``; wider grids use the
    scan engine.  Pass ``mesh`` to shard the batch axis (``shard_map``,
    per-shard kernel launch, no collectives).  ``nl``
    (:class:`models.gnlse.NLTerms`, shared across the batch) switches the
    nonlinear substep from the exact Kerr rotation to the in-kernel RK4 on
    the generalized Raman/self-steepening operator.
    """
    A0 = np.asarray(A0, dtype=np.complex128)
    if A0.ndim != 2:
        raise ValueError(f"A0 must have shape (B, T), got {A0.shape}")
    B, T = A0.shape
    m = M_SUB
    if T % m != 0 or T < m:
        raise ValueError(
            f"T={T} is not a multiple of {m}: the fused SSFM kernel needs "
            f"polyphase groups of {m}; use the scan engine"
        )
    if T // m > MAX_R:
        raise ValueError(
            f"T={T} too wide for the fused SSFM kernel (max {m * MAX_R}); "
            "use the scan engine"
        )
    if block is None:
        # the generalized-NL body carries ~2-3x the live planes and blows
        # the remote-compile VMEM limits at the Kerr body's 512 (BLOCK note)
        block = NL_BLOCK if nl is not None else BLOCK

    gamma = np.broadcast_to(np.asarray(gamma, dtype=np.float64), (B,))
    al = np.asarray(alpha, dtype=np.float64)
    if al.ndim == 2 or (al.ndim == 1 and al.shape[0] == T and T != B):
        al = np.broadcast_to(al, (B, T))
    else:
        al = np.broadcast_to(al, (B,))[:, None]
    phase = np.asarray(lin_phase, dtype=np.float64)
    shared_fac = phase.ndim == 1 and al.shape == (B, 1) and np.all(
        al == al[0, 0])
    phase = np.broadcast_to(phase, (B, T)) if not shared_fac else phase[None, :]
    al_f = al[0:1] if shared_fac else np.broadcast_to(al, (B, T))

    def factor_planes(h):
        # exp((-alpha/2 + i phi) h), natural k order, stacked (2T, Bf) f32.
        # A runaway-gain lane (alpha < 0 large) overflows f32 to inf here by
        # design: the kernel's finite check then freezes that lane.
        with np.errstate(over="ignore"):
            dec = np.exp(-0.5 * al_f * h)
            ang = phase * h
            fr = (dec * np.cos(ang)).astype(np.float32)
            fi = (dec * np.sin(ang)).astype(np.float32)
        return np.concatenate([fr.T, fi.T], axis=0)   # (2T, Bf)

    # the kernel derives the full-step factor as Lh^2 in VMEM
    lh = factor_planes(0.5 * dz_m)

    nl_static = None
    nl_planes = ()
    if nl is not None:
        f_r = float(np.asarray(nl.f_r))
        inv_w0 = float(np.asarray(nl.inv_w0))
        nl_static = (f_r, inv_w0)
        # natural-k-order lane-width-1 planes: conj(H_R) stacked (2T, 1)
        # and omega (T, 1) -- fft bin order IS the kernel's natural k order
        hr_re = np.asarray(nl.hr_re, dtype=np.float64).reshape(T)
        hr_im = np.asarray(nl.hr_im, dtype=np.float64).reshape(T)
        hrc = np.concatenate([hr_re, -hr_im]).astype(np.float32)[:, None]
        om = np.asarray(nl.omega, dtype=np.float64).reshape(T).astype(
            np.float32)[:, None]
        nl_planes = (jnp.asarray(hrc), jnp.asarray(om))

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

    A0p = padded(A0)
    g = padded(gamma).astype(np.float32)[None, :]
    if lh.shape[1] != 1:
        lh = padded(lh, axis=1)

    y0 = _pack_grouped(A0p, T, m)                   # (2T, Bp)

    if mesh is None:
        solver = _pallas_gnlse_solver(
            int(n_steps), int(save_every), int(T), float(dz_m),
            bool(interpret), blk, nl_static,
        )
        args = (jnp.asarray(lh), jnp.asarray(g), jnp.asarray(y0)) + nl_planes
        with jax.enable_x64(False):
            out = jax.block_until_ready(solver(*args))
        out = np.asarray(out, np.float64)           # ONE fetch
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.mesh import fetch_global, put_global

        solver, spec = _pallas_gnlse_solver_sharded(
            int(n_steps), int(save_every), int(T), float(dz_m),
            bool(interpret), blk, mesh, nl_static,
        )
        sh = NamedSharding(mesh, spec)
        lhb = np.broadcast_to(lh, (2 * T, Bp))
        args = tuple(put_global(np.ascontiguousarray(x), sh)
                     for x in (lhb, g, y0))
        if nl_planes:
            rep_sh = NamedSharding(mesh, PartitionSpec(None, None))
            args += tuple(put_global(np.asarray(x), rep_sh)
                          for x in nl_planes)
        with jax.enable_x64(False):
            fused_out = jax.block_until_ready(solver(*args))
        out = np.asarray(fetch_global(fused_out), np.float64)

    pk = out[0, :B]
    ok = out[1 + 2 * T, :B] > 0.0
    A_last = _unpack_grouped(out[1:1 + 2 * T], T, m, B)
    return pk, A_last, ok
