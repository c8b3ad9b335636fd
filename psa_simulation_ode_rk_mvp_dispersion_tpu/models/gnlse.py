"""Generalized nonlinear Schrödinger (GNLSE) pulse-propagation model.

Extends the framework beyond discrete-wave models (``models/fwm4``,
``models/nwave``) to full field envelopes ``A(z, t)`` on a periodic time
window: Taylor dispersion to arbitrary order (reusing
:class:`~..ops.dispersion.DispersionParams`), Kerr self-phase modulation and
loss, in the co-moving frame

    dA/dz = -alpha/2 A - sum_{n>=2} beta_n (i^{n-1}/n!) d^n A/dt^n
            + i gamma |A|^2 A,

optionally generalized (:func:`make_nl_terms`) with the delayed Raman
response and self-steepening / optical-shock terms

    + i gamma (1 + (i/omega_0) d/dt)
      [ A ((1 - f_R)|A|^2 + f_R (h_R * |A|^2)) ].

The solver is the symmetric (Strang) split-step Fourier method, the standard
integrator for this equation (Agrawal ch. 2): the linear operator is diagonal
in the frequency domain,

    L(omega) = -alpha/2 + i sum_{n>=2} beta_n omega^n / n!

(with ``omega = 2 pi fftfreq`` and ``A_tilde = fft(A)``), the Kerr operator
is diagonal in the time domain (a pure phase rotation
``exp(i gamma |A|^2 h)``).  TPU-native design notes:

- one ``lax.scan`` chunk per ``save_every`` steps with the framework-wide
  save-decimation contract (row 0 + every save_every-th step; trailing
  partial steps integrated but unsaved);
- within a chunk the adjacent linear half-steps are fused into full steps
  (half, [NL, full]*(k-1), NL, half) -- one FFT pair per step;
- batched natively over a leading B axis (the FFT batches over it) and
  shardable over a device mesh with ``shard_map`` (embarrassingly SPMD --
  each device transforms its own batch shard, no collectives);
- every jitted boundary moves f32/i32 only (``utils/packing`` real/imag
  packs; the axon TPU attachment cannot transfer complex buffers), and
  complex factors are built with ``lax.complex`` (no weak-c128 constants).

The model has no counterpart in the reference (/root/reference is a 4-wave
ODE simulator); it realizes the same physics in the continuous-field limit:
a periodic-window GNLSE with discrete-line initial conditions IS the N-wave
comb ODE system, and ``tests/test_gnlse.py`` cross-validates the two
(plus closed-form oracles: dispersion-only Gaussian broadening, SPM-only
phase, the fundamental soliton, exp(-alpha z) loss).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from ..config import SimulationConfig, validate_config, reject_multistep
from ..ops.dispersion import DispersionParams
from ..ops.integrators import rk4ip_step
from ..utils.packing import (
    complex_to_ri,
    ri_pack_host,
    ri_to_complex,
    ri_unpack_host,
)
from ..utils.precision import real_dtype, require_non_df32, validate_precision


# ---------------------------------------------------------------------------
# Grids and parameters
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TimeGrid:
    """Uniform periodic time window: ``n_samples`` points spanning
    ``t_window_s`` seconds (centered on t=0)."""

    n_samples: int
    t_window_s: float

    def __post_init__(self):
        if self.n_samples < 2:
            raise ValueError("n_samples must be >= 2")
        if not (self.t_window_s > 0.0 and np.isfinite(self.t_window_s)):
            raise ValueError("t_window_s must be positive and finite")

    @property
    def dt_s(self) -> float:
        return float(self.t_window_s) / int(self.n_samples)

    def t(self) -> np.ndarray:
        """Sample times [s], centered: t_k = (k - n//2) dt."""
        n = int(self.n_samples)
        return (np.arange(n) - n // 2) * self.dt_s

    def omega(self) -> np.ndarray:
        """Angular baseband frequencies [rad/s], fft-ordered."""
        return 2.0 * np.pi * np.fft.fftfreq(int(self.n_samples), d=self.dt_s)

    @classmethod
    def for_pulse(cls, t0_s: float, *, n_samples: int = 1024,
                  window_t0: float = 40.0) -> "TimeGrid":
        """Window sized to a pulse of duration ``t0_s`` (default 40 T0)."""
        return cls(n_samples=int(n_samples), t_window_s=float(window_t0) * float(t0_s))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GNLSECoeffs:
    """Per-instance GNLSE coefficients (broadcastable over a leading B axis).

    ``lin_phase`` is the omega-domain phase rate sum beta_n omega^n / n!
    [rad/m] on the fft-ordered grid; ``gamma`` [1/(W m)]; ``alpha`` [1/m] --
    either flat (scalar / per-instance (B,)) or FREQUENCY-RESOLVED on the
    fft-ordered grid ((T,) single-run / (B, T) batched; applied in the
    frequency domain alongside the dispersion phase -- confinement-loss
    profiles, gain spectra, band edges).  Rank disambiguates: the runners
    normalize spectral alpha to a trailing-T axis, so a 2-D alpha is
    spectral and a 1-D alpha at the batch boundary is per-instance.
    """

    gamma: jax.Array      # () or (B,)
    alpha: jax.Array      # () / (B,) flat, or (T,) / (B, T) spectral
    lin_phase: jax.Array  # (T,) or (B, T)


def make_gnlse_coeffs(
    grid: TimeGrid,
    dispersion: Optional[DispersionParams] = None,
    *,
    gamma_W_m: float,
    alpha_1_m: float = 0.0,
    alpha_spec_1_m=None,
    max_order: Optional[int] = None,
    precision: str = "x64",
) -> GNLSECoeffs:
    """Build :class:`GNLSECoeffs` from the framework dispersion model.

    Orders 0 and 1 of ``dispersion`` are ignored (the co-moving frame removes
    the absolute phase and group delay, the same gauge as
    ``nwave.comb_beta_lin(remove_linear=True)``).

    ``alpha_spec_1_m`` (optional, (T,) on the fft-ordered ``grid.omega()``
    frequencies) adds a frequency-dependent loss profile on top of the flat
    ``alpha_1_m`` -- e.g. PCF confinement loss rising at the band edges.
    """
    import math

    prec = validate_precision(precision)
    rdt = real_dtype(prec)
    om = grid.omega()
    phase = np.zeros_like(om)
    if dispersion is not None:
        cf = np.asarray(dispersion.coeffs, dtype=np.float64)
        hi = len(cf) if max_order is None else min(len(cf), int(max_order) + 1)
        for n in range(2, hi):
            phase = phase + (cf[n] / math.factorial(n)) * om ** n
    if not np.all(np.isfinite(phase)):
        raise ValueError("dispersion phase must be finite on the grid")
    if alpha_spec_1_m is None:
        alpha_np = np.float64(alpha_1_m)
    else:
        sp = np.asarray(alpha_spec_1_m, dtype=np.float64)
        if sp.shape != om.shape:
            raise ValueError(
                f"alpha_spec_1_m must have shape {om.shape} (the fft-ordered "
                f"frequency grid), got {sp.shape}"
            )
        if not np.all(np.isfinite(sp)):
            raise ValueError("alpha_spec_1_m must be finite")
        alpha_np = np.float64(alpha_1_m) + sp
    if prec == "df32":
        # matched-tolerance tier: keep HOST f64 leaves -- the two-float
        # engine (ops/df32_gnlse.py) splits them exactly into (hi, lo) f32
        # pairs on the host; a cast to device f32 here would truncate the
        # dispersion phase before the compensated arithmetic ever sees it
        # (and f64 jnp arrays cannot be created in a TPU-default process)
        return GNLSECoeffs(
            gamma=np.float64(gamma_W_m),
            alpha=alpha_np,
            lin_phase=phase,
        )
    return GNLSECoeffs(
        gamma=jnp.asarray(float(gamma_W_m), dtype=rdt),
        alpha=jnp.asarray(alpha_np, dtype=rdt),
        lin_phase=jnp.asarray(phase, dtype=rdt),
    )


# ---------------------------------------------------------------------------
# Initial conditions
# ---------------------------------------------------------------------------

def gaussian_pulse(grid: TimeGrid, *, peak_W: float, t0_s: float,
                   chirp: float = 0.0) -> np.ndarray:
    """``sqrt(P0) exp(-(1+iC) t^2 / (2 T0^2))`` on the grid."""
    t = grid.t()
    u = t / float(t0_s)
    env = np.sqrt(float(peak_W)) * np.exp(-0.5 * (1.0 + 1j * float(chirp)) * u * u)
    return env.astype(np.complex128)


def sech_pulse(grid: TimeGrid, *, peak_W: float, t0_s: float) -> np.ndarray:
    """``sqrt(P0) sech(t/T0)`` (the soliton profile for beta2 < 0 when
    ``P0 = |beta2| / (gamma T0^2)``)."""
    t = grid.t()
    return (np.sqrt(float(peak_W)) / np.cosh(t / float(t0_s))).astype(np.complex128)


def soliton_peak_power(beta2_s2_m: float, gamma_W_m: float, t0_s: float) -> float:
    """Fundamental-soliton peak power ``|beta2| / (gamma T0^2)`` [W]."""
    if beta2_s2_m >= 0:
        raise ValueError("solitons require anomalous dispersion (beta2 < 0)")
    return abs(float(beta2_s2_m)) / (float(gamma_W_m) * float(t0_s) ** 2)


def comb_to_field(grid: TimeGrid, line_amps: np.ndarray, domega: float) -> np.ndarray:
    """Place comb lines (centered, spacing ``domega``) onto the time grid.

    Line j of N carries baseband frequency ``(j - N//2) domega``; the window
    must hold an integer number of beat periods (``domega`` a multiple of
    ``2 pi / t_window``).  Inverse of :func:`field_to_comb`.
    """
    amps = np.asarray(line_amps, dtype=np.complex128)
    n_lines = amps.shape[-1]
    spec = np.zeros(amps.shape[:-1] + (int(grid.n_samples),), dtype=np.complex128)
    idx = _comb_bins(grid, n_lines, domega)
    spec[..., idx] = amps
    # fft-convention synthesis: A = ifft(spec) * n (so |line amp| = |A| line)
    return np.fft.ifft(spec, axis=-1) * int(grid.n_samples)


def field_to_comb(grid: TimeGrid, A: np.ndarray, n_lines: int,
                  domega: float) -> np.ndarray:
    """Read centered comb-line amplitudes back out of a periodic field."""
    spec = np.fft.fft(np.asarray(A, dtype=np.complex128), axis=-1) / int(grid.n_samples)
    return spec[..., _comb_bins(grid, int(n_lines), domega)]


def _comb_bins(grid: TimeGrid, n_lines: int, domega: float) -> np.ndarray:
    step = float(domega) * float(grid.t_window_s) / (2.0 * np.pi)
    k = int(round(step))
    if abs(step - k) > 1e-9 or k < 1:
        raise ValueError(
            "domega must be a positive integer multiple of 2*pi/t_window "
            f"(got {step} bins/line)"
        )
    offs = (np.arange(n_lines) - n_lines // 2) * k
    if np.any(np.abs(offs) > grid.n_samples // 2 - 1):
        raise ValueError("comb does not fit in the grid bandwidth")
    return offs % int(grid.n_samples)


# ---------------------------------------------------------------------------
# Extended nonlinearity: Raman response + self-steepening
# ---------------------------------------------------------------------------

# standard silica single-damped-oscillator Raman model (Agrawal eq. 2.3.40)
RAMAN_TAU1_S = 12.2e-15
RAMAN_TAU2_S = 32.0e-15
RAMAN_FRACTION_SILICA = 0.18


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NLTerms:
    """Extended-nonlinearity terms: delayed Raman response and
    self-steepening.  When passed to a solver, the Kerr phase rotation is
    replaced by an RK4 substep on the full generalized nonlinear operator

        N(A) = i gamma (1 + (i/omega_0) d/dt)
               [ A ((1 - f_R)|A|^2 + f_R (h_R * |A|^2)) ].

    ``hr_re/hr_im`` hold H_R(omega) (the fft of the sampled response times
    dt, normalized so H_R(0) = 1) on the fft-ordered grid; ``inv_w0`` is
    1/omega_0 (0 disables self-steepening); ``f_r`` the Raman fraction.
    """

    f_r: jax.Array      # ()
    inv_w0: jax.Array   # ()
    omega: jax.Array    # (T,) fft-ordered [rad/s]
    hr_re: jax.Array    # (T,)
    hr_im: jax.Array    # (T,)


def raman_response(grid: TimeGrid, *, tau1_s: float = RAMAN_TAU1_S,
                   tau2_s: float = RAMAN_TAU2_S) -> np.ndarray:
    """Causal silica Raman response h_R(t) sampled on [0, t_window),
    normalized so the discrete integral (sum * dt) is exactly 1."""
    t = np.arange(int(grid.n_samples)) * grid.dt_s
    h = ((tau1_s**2 + tau2_s**2) / (tau1_s * tau2_s**2)
         * np.exp(-t / tau2_s) * np.sin(t / tau1_s))
    return h / (h.sum() * grid.dt_s)


def make_nl_terms(
    grid: TimeGrid,
    *,
    f_raman: float = RAMAN_FRACTION_SILICA,
    omega0: Optional[float] = None,
    tau1_s: float = RAMAN_TAU1_S,
    tau2_s: float = RAMAN_TAU2_S,
    precision: str = "x64",
) -> NLTerms:
    """Build :class:`NLTerms`.  ``omega0`` (the carrier frequency, e.g. the
    dispersion ``omega_ref``) enables self-steepening; None disables it.
    ``f_raman=0`` disables the Raman term (pure Kerr through the RK4 path).
    """
    prec = validate_precision(precision)
    if not (0.0 <= float(f_raman) < 1.0):
        raise ValueError("f_raman must be in [0, 1)")
    if omega0 is not None and not float(omega0) > 0.0:
        raise ValueError("omega0 must be positive (or None)")
    if float(f_raman) > 0.0:
        HR = np.fft.fft(raman_response(grid, tau1_s=tau1_s, tau2_s=tau2_s)) * grid.dt_s
    else:
        HR = np.zeros(int(grid.n_samples), dtype=np.complex128)
    if prec == "df32":
        # matched-tolerance tier: keep HOST f64 numpy leaves for the exact
        # two-float split (the df32 coeffs convention; f64 jnp arrays
        # cannot be created in a TPU-default process)
        return NLTerms(
            f_r=np.float64(f_raman),
            inv_w0=np.float64(0.0 if omega0 is None else 1.0 / float(omega0)),
            omega=np.asarray(grid.omega(), dtype=np.float64),
            hr_re=np.asarray(HR.real, dtype=np.float64),
            hr_im=np.asarray(HR.imag, dtype=np.float64),
        )
    rdt = real_dtype(prec)
    return NLTerms(
        f_r=jnp.asarray(float(f_raman), dtype=rdt),
        inv_w0=jnp.asarray(0.0 if omega0 is None else 1.0 / float(omega0), dtype=rdt),
        omega=jnp.asarray(grid.omega(), dtype=rdt),
        hr_re=jnp.asarray(HR.real, dtype=rdt),
        hr_im=jnp.asarray(HR.imag, dtype=rdt),
    )


def raman_t_r(grid: TimeGrid, nl: NLTerms) -> float:
    """First moment T_R = f_R * integral(t h_R(t) dt) [s] (the slope of
    Im H_R at omega=0; drives the Gordon soliton self-frequency shift)."""
    t = np.arange(int(grid.n_samples)) * grid.dt_s
    hr = np.asarray(
        np.fft.ifft(np.asarray(nl.hr_re) + 1j * np.asarray(nl.hr_im))
    ).real / grid.dt_s
    return float(np.asarray(nl.f_r)) * float((t * hr).sum() * grid.dt_s)


def _times_i(z):
    """i * z for complex z (no weak-c128 literal)."""
    return lax.complex(-z.imag, z.real)


def _nl_rhs(y, gamma, nl: NLTerms):
    """Generalized nonlinear operator N(A) over (..., T) complex state.

    The module's time axis is the REVERSE of Agrawal's retarded time T
    (the odd-order dispersion sign is pinned by the nwave-comb
    cross-oracle, ``test_gnlse_matches_nwave_comb``): under t = -T the
    causal Raman convolution becomes a correlation (conjugate H_R) and
    the optical-shock derivative flips sign.  Both signs are pinned by
    physics tests (Gordon red-shift; shock centroid drift).
    """
    P = y.real * y.real + y.imag * y.imag
    # delayed response: (h_R * P)(T) = correlation on the t axis.  P is a
    # REAL power waveform and h_R(t) is real (Hermitian H_R), so the
    # conjugated product spectrum is Hermitian too -- rfft/irfft computes
    # the identical convolution with half-length transforms (VERDICT r2
    # weak #2: the full complex fft pair here was half-wasted bandwidth).
    T = P.shape[-1]
    h = T // 2 + 1
    HRc_half = lax.complex(nl.hr_re[..., :h], -nl.hr_im[..., :h]).astype(
        jnp.complex64 if y.dtype == jnp.complex64 else jnp.complex128
    )
    R = jnp.fft.irfft(HRc_half * jnp.fft.rfft(P, axis=-1), n=T, axis=-1)
    W = y * ((1.0 - nl.f_r) * P + nl.f_r * R)
    # self-steepening (i/omega_0) dW/dT = -(i/omega_0) dW/dt,
    # with d/dt == multiply by (i omega) in the fft domain
    dWdt = jnp.fft.ifft(_times_i(nl.omega * jnp.fft.fft(W, axis=-1)), axis=-1)
    return _times_i(gamma * (W - nl.inv_w0 * _times_i(dWdt)))


def _nl_substep(y, gamma, h, nl):
    """One nonlinear split substep: exact Kerr rotation when ``nl`` is None,
    RK4 on the generalized operator otherwise."""
    if nl is None:
        return _kerr_step(y, gamma, h)
    k1 = _nl_rhs(y, gamma, nl)
    k2 = _nl_rhs(y + (0.5 * h) * k1, gamma, nl)
    k3 = _nl_rhs(y + (0.5 * h) * k2, gamma, nl)
    k4 = _nl_rhs(y + h * k3, gamma, nl)
    return y + (h / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)


def _cast_nl(nl: Optional[NLTerms], rdt) -> Optional[NLTerms]:
    if nl is None:
        return None
    return NLTerms(
        f_r=jnp.asarray(nl.f_r, dtype=rdt),
        inv_w0=jnp.asarray(nl.inv_w0, dtype=rdt),
        omega=jnp.asarray(nl.omega, dtype=rdt),
        hr_re=jnp.asarray(nl.hr_re, dtype=rdt),
        hr_im=jnp.asarray(nl.hr_im, dtype=rdt),
    )


# ---------------------------------------------------------------------------
# The split-step solver core
# ---------------------------------------------------------------------------

def _lin_factor(coeffs: GNLSECoeffs, h, rdt):
    """Frequency-domain one-step linear factor exp((-alpha/2 + i phi) h).

    ``alpha`` rank rule (normalized by the public runners): rank 2 is a
    spectral (B, T) loss profile used as-is; rank 1 is per-instance (B,)
    and gains the trailing time axis; rank 0 is a flat scalar."""
    al = jnp.asarray(coeffs.alpha, dtype=rdt)
    ph = jnp.asarray(coeffs.lin_phase, dtype=rdt)
    if al.ndim == 1:
        # batched flat alpha: add the trailing time axis so (B,) broadcasts
        # against lin_phase (T,) or (B, T) alike
        al = al[..., None]
    decay = jnp.exp(-0.5 * al * h)
    ang = ph * h
    return lax.complex(decay * jnp.cos(ang), decay * jnp.sin(ang))


def _kerr_step(y, gamma, h):
    """Time-domain Kerr phase rotation exp(i gamma |A|^2 h)."""
    P = y.real * y.real + y.imag * y.imag
    ang = gamma * P * h
    return y * lax.complex(jnp.cos(ang), jnp.sin(ang))


def _finite_mask(y):
    """Per-instance all-finite flag over trailing (time) axis."""
    m = jnp.isfinite(y.real) & jnp.isfinite(y.imag)
    return jnp.all(m, axis=-1)


@functools.lru_cache(maxsize=64)
def _gnlse_solver(n_steps: int, save_every: int, rdt_name: str,
                  method: str = "strang"):
    """Jitted batched SSFM: (B, T, 2) real pack -> saved trajectory pack.

    Returns ``(y_saved (S+1, B, T, 2), y_final (B, T, 2), ok (B,) i32)``;
    chunk-fused symmetric split-step (or RK4IP when ``method='rk4ip'``),
    per-instance NaN freeze at chunk boundaries.
    """
    rdt = jnp.dtype(rdt_name)
    n_chunks = n_steps // save_every
    remainder = n_steps - n_chunks * save_every
    make_stepper = _STEPPERS[method]

    def solve(y0_ri, coeffs: GNLSECoeffs, dz, nl):
        y0 = ri_to_complex(y0_ri)  # (B, T) complex
        h = jnp.asarray(dz, dtype=rdt)
        gamma = jnp.asarray(coeffs.gamma, dtype=rdt)
        if gamma.ndim:
            gamma = gamma[..., None]
        nl = _cast_nl(nl, rdt)
        Lh = _lin_factor(coeffs, 0.5 * h, rdt)
        Lf = _lin_factor(coeffs, h, rdt)

        ok0 = _finite_mask(y0)
        stepper = make_stepper(save_every)

        def chunk(carry, _):
            y, ok = carry
            y_new = stepper(y, Lh, Lf, gamma, h, nl)
            ok_new = ok & _finite_mask(y_new)
            y_out = jnp.where(ok_new[..., None], y_new, y)
            return (y_out, ok_new), complex_to_ri(y_out)

        if n_chunks > 0:
            (y, ok), ys = lax.scan(chunk, (y0, ok0), None, length=n_chunks)
        else:
            y, ok = y0, ok0
            ys = jnp.zeros((0,) + y0.shape + (2,), dtype=rdt)
        y_saved = jnp.concatenate(
            [complex_to_ri(y0)[None], ys], axis=0
        )
        # trailing partial steps: integrated (they can flip ok) but unsaved;
        # y_final stays at the last SAVED grid point (the framework-wide
        # saved-grid convention, matching _gnlse_reduce_solver)
        if remainder > 0:
            y_new = make_stepper(remainder)(y, Lh, Lf, gamma, h, nl)
            ok = ok & _finite_mask(y_new)
        y_final = complex_to_ri(y)
        return y_saved.astype(rdt), y_final.astype(rdt), ok.astype(jnp.int32)

    return jax.jit(solve)


@functools.lru_cache(maxsize=64)
def _gnlse_reduce_solver(n_steps: int, save_every: int, rdt_name: str,
                         method: str = "strang"):
    """Reduce-mode SSFM for large sweeps: no trajectory materialization.

    Returns ONE stacked ``(B, 1 + 2T + 1)`` rdt buffer
    ``[peak_max | y_last flat | ok]`` (split with ``_split_reduce_pack``;
    single device->host fetch, docs/PERF.md rule 7): the running max over
    saved samples of the instantaneous peak power max_t |A|^2, and the
    field at the last saved grid point (framework saved-grid convention).
    """
    rdt = jnp.dtype(rdt_name)
    n_chunks = n_steps // save_every
    remainder = n_steps - n_chunks * save_every
    make_stepper = _STEPPERS[method]

    def peak(y):
        return jnp.max(y.real * y.real + y.imag * y.imag, axis=-1)

    def solve(y0_ri, coeffs: GNLSECoeffs, dz, nl):
        y0 = ri_to_complex(y0_ri)
        h = jnp.asarray(dz, dtype=rdt)
        gamma = jnp.asarray(coeffs.gamma, dtype=rdt)
        if gamma.ndim:
            gamma = gamma[..., None]
        nl = _cast_nl(nl, rdt)
        Lh = _lin_factor(coeffs, 0.5 * h, rdt)
        Lf = _lin_factor(coeffs, h, rdt)

        stepper = make_stepper(save_every)
        ok0 = _finite_mask(y0)

        def chunk(carry, _):
            y, pk, ok = carry
            y_new = stepper(y, Lh, Lf, gamma, h, nl)
            ok_new = ok & _finite_mask(y_new)
            y_out = jnp.where(ok_new[..., None], y_new, y)
            pk = jnp.maximum(pk, peak(y_out))
            return (y_out, pk, ok_new), None

        if n_chunks > 0:
            (y, pk, ok), _ = lax.scan(
                chunk, (y0, peak(y0), ok0), None, length=n_chunks
            )
        else:
            y, pk, ok = y0, peak(y0), ok0
        # trailing partial steps: integrated (they can flip ok) but unsaved;
        # y stays at the last saved grid point (saved-grid convention)
        if remainder > 0:
            y_new = make_stepper(remainder)(y, Lh, Lf, gamma, h, nl)
            ok = ok & _finite_mask(y_new)
        y_ri = complex_to_ri(y).astype(rdt)
        # ONE stacked output: each device->host fetch costs a ~30 ms tunnel
        # round trip regardless of size (docs/PERF.md rule 7)
        return jnp.concatenate(
            [pk.astype(rdt)[:, None], y_ri.reshape(y_ri.shape[0], -1),
             ok.astype(rdt)[:, None]], axis=1)

    return jax.jit(solve)


def _chunk_stepper(k: int):
    """k fused symmetric split steps (shared by both solver modes)."""

    def run(y, Lh, Lf, gamma, h, nl=None):
        if k == 0:
            return y
        y = jnp.fft.ifft(Lh * jnp.fft.fft(y, axis=-1), axis=-1)

        def body(carry, _):
            c = _nl_substep(carry, gamma, h, nl)
            c = jnp.fft.ifft(Lf * jnp.fft.fft(c, axis=-1), axis=-1)
            return c, None

        if k > 1:
            y, _ = lax.scan(body, y, None, length=k - 1)
        y = _nl_substep(y, gamma, h, nl)
        return jnp.fft.ifft(Lh * jnp.fft.fft(y, axis=-1), axis=-1)

    return run


def _kerr_rhs(y, gamma):
    """Kerr-only nonlinear operator N(A) = i gamma |A|^2 A (the derivative
    form of :func:`_kerr_step`'s exact rotation -- RK4IP needs N itself)."""
    P = y.real * y.real + y.imag * y.imag
    return _times_i(gamma * P * y)


def _chunk_stepper_rk4ip(k: int):
    """k fused RK4IP steps (interaction-picture RK4; Hult, J. Lightwave
    Technol. 25(12):3770, 2007): change frame to the dispersion interaction
    picture at the step midpoint and run classic RK4 on the transformed
    nonlinear operator.  Global error is O(dz^4) vs Strang's O(dz^2), at
    4 half-step linear applications + 4 N evaluations per step -- an
    equal-accuracy throughput integrator for well-resolved pulse runs
    (``cfg.integrator='rk4ip'``).

    Same ``run`` signature as :func:`_chunk_stepper`; the IP change of
    frame needs only the half-step factor ``Lh`` (``Lf`` is unused).
    """

    def run(y, Lh, Lf, gamma, h, nl=None):
        if k == 0:
            return y

        def lin(a):  # exp(D h/2) in the frequency domain
            return jnp.fft.ifft(Lh * jnp.fft.fft(a, axis=-1), axis=-1)

        def N(a):
            return _kerr_rhs(a, gamma) if nl is None else _nl_rhs(a, gamma, nl)

        def body(carry, _):
            return rk4ip_step(lin, N, carry, h), None

        y, _ = lax.scan(body, y, None, length=k)
        return y

    return run


_STEPPERS = {"strang": _chunk_stepper, "rk4ip": _chunk_stepper_rk4ip}


def _ssfm_method(cfg) -> str:
    """Map ``cfg.integrator`` to the fixed-step SSFM stepper family
    ('rk4' is the reference-parity Strang split; 'rk4ip' the 4th-order
    interaction-picture RK4).  'rk45' is handled by the adaptive branch
    before this is consulted."""
    return "rk4ip" if cfg.integrator.lower() == "rk4ip" else "strang"


# ---------------------------------------------------------------------------
# Adaptive split-step (integrator='rk45'): step-doubling local-error control
# ---------------------------------------------------------------------------
#
# The "local error method" for SSFM (Sinkin et al., J. Lightwave Technol. 21,
# 2003): each attempt takes one coarse Strang step of size h and two fine
# steps of size h/2; their weighted-RMS distance estimates the O(h^3) local
# error of the second-order split, controls acceptance and the next step
# size (exponent 1/3), and the accepted state is the locally-extrapolated
# (4 y_fine - y_coarse)/3 (third order).  The controller is a self-masking
# lax.while_loop over batched lanes -- per-lane (z, dt, ok), finished or
# failed lanes are no-ops -- inside a lax.scan over save-grid segments, the
# same structure as ops/adaptive.py's Dormand-Prince controller.

_SSFM_SAFETY = 0.9
_SSFM_MIN_FACTOR = 0.2
_SSFM_MAX_FACTOR = 5.0


def _doubling_attempt(y, coeffs, gamma, hb, nl, rdt):
    """One step-doubling attempt: (coarse h step, two fused fine h/2 steps).

    The fine pair shares its middle full factor with the coarse half factor
    (both exp(L h/2)), and the ifft/fft round trip between the two fine
    half-steps fuses.  Round 5 (VERDICT r4 #4): ONE transcendental factor
    build per attempt -- exp(L h/2) is the exact square of exp(L h/4)
    (1-ulp class, far below the O(h^3) split error the controller
    measures) -- and the coarse/fine first transforms share one forward
    FFT: 9 FFTs + 1 build per attempt (was 10 + 2)."""
    def lfft(L, a):
        return jnp.fft.ifft(L * jnp.fft.fft(a, axis=-1), axis=-1)

    Lf = _lin_factor(coeffs, 0.25 * hb, rdt)   # exp(L h/4)
    Lc = Lf * Lf                               # exp(L h/2), exact square
    fy = jnp.fft.fft(y, axis=-1)               # shared forward transform
    yc = lfft(Lc, _nl_substep(jnp.fft.ifft(Lc * fy, axis=-1), gamma, hb,
                              nl))
    yf = _nl_substep(jnp.fft.ifft(Lf * fy, axis=-1), gamma, 0.5 * hb, nl)
    yf = _nl_substep(lfft(Lc, yf), gamma, 0.5 * hb, nl)
    yf = lfft(Lf, yf)
    return yc, yf


def _doubling_attempt_rk4ip(y, coeffs, gamma, hb, nl, rdt):
    """Step-doubling attempt on the RK4IP step (``integrator='rk4ip45'``):
    one coarse h step and two fused fine h/2 steps of the 4th-order
    interaction-picture RK4 (:func:`_chunk_stepper_rk4ip`'s body).  Local
    error is O(h^5), so the controller runs with ``order=4`` (exponent
    1/5, Richardson weight 16/15).  The coarse and fine first stages
    share N(y) (both need the nonlinear operator at the current state)."""
    def lfft(L, a):
        return jnp.fft.ifft(L * jnp.fft.fft(a, axis=-1), axis=-1)

    def N(a):
        return _kerr_rhs(a, gamma) if nl is None else _nl_rhs(a, gamma, nl)

    def ip_step(y, L, h, Ny):
        return rk4ip_step(lambda a: lfft(L, a), N, y, h, Ny)

    Lf = _lin_factor(coeffs, 0.25 * hb, rdt)   # exp(L h/4)
    Lc = Lf * Lf                               # exp(L h/2), exact square
    Ny = N(y)
    yc = ip_step(y, Lc, hb, Ny)
    yf = ip_step(y, Lf, 0.5 * hb, Ny)
    yf = ip_step(yf, Lf, 0.5 * hb, N(yf))
    return yc, yf


# (attempt builder, method order p) per adaptive scheme: local error is
# O(h^{p+1}), the controller exponent -1/(p+1), and the accepted state the
# Richardson pair (2^p yf - yc)/(2^p - 1)
_ADAPTIVE_ATTEMPTS = {
    "strang": (_doubling_attempt, 2),
    "rk4ip": (_doubling_attempt_rk4ip, 4),
}


def _adaptive_method(cfg) -> str:
    """Map ``cfg.integrator`` to the step-doubling attempt family
    ('rk45' -> Strang, 'rk4ip45' -> interaction-picture RK4)."""
    return "rk4ip" if cfg.integrator.lower() == "rk4ip45" else "strang"


def _lane_rms2(a):
    """Per-lane mean |a|^2 over every non-batch axis of a (B, ...) state."""
    return jnp.mean(a.real * a.real + a.imag * a.imag,
                    axis=tuple(range(1, a.ndim)))


def _lane_finite(a):
    """Per-lane all-finite flag over every non-batch axis."""
    return jnp.all(jnp.isfinite(a.real) & jnp.isfinite(a.imag),
                   axis=tuple(range(1, a.ndim)))


def _ssfm_error_norm(yc, yf, y_old, *, rtol, atol):
    """Per-lane GLOBAL relative error ||yf - yc|| / (atol + rtol ||y||)
    (RMS over the window; <= 1 means the step meets tolerance).

    Sinkin's norm, not the per-sample stiff-ODE scale: the FFTs mix
    roundoff across the whole window (absolute floor ~ eps * ||y||_inf),
    so a per-sample scale lets empty pulse-tail samples dominate and makes
    f32 solves reject unconditionally regardless of step size."""
    d = jnp.sqrt(_lane_rms2(yf - yc))
    s = jnp.sqrt(jnp.maximum(_lane_rms2(yf), _lane_rms2(y_old)))
    # floor the denominator so an all-zero lane (d=0, s=0) under atol=0 --
    # which validate_config allows -- yields enorm 0 (exact step), not 0/0
    denom = jnp.maximum(atol + rtol * s, jnp.finfo(d.dtype).tiny)
    return d / denom


def _gnlse_advance_segment(y, z, dt, ok, z_start, z_end, attempt,
                           rdt, *, rtol, atol, max_steps, order: int = 2):
    """Adaptively advance all lanes from z (>= z_start) to the shared
    ``z_end``; returns (y, z, dt, ok, n_accepted, n_rejected).

    State-rank-generic (any (B, ...) complex state): ``attempt(y, hb)``
    returns the (coarse, fine-doubled) pair for per-lane steps ``hb``
    already broadcast to the state rank.  Shared by the scalar GNLSE and
    the vector (two-polarization) solver.

    ``order`` is the method order p of the underlying step (2 for the
    Strang split, 4 for RK4IP): the step-doubling local error is
    O(h^{p+1}), so the controller exponent is -1/(p+1) and the accepted
    state the Richardson extrapolation (2^p yf - yc)/(2^p - 1)."""
    span = z_end - z_start + jnp.asarray(1.0, rdt)
    dt_min = jnp.asarray(1e-12, rdt) * span
    n0 = jnp.zeros(z.shape, jnp.int32)
    err_exp = -1.0 / (order + 1.0)
    rich = float(2 ** order)

    def cond(state):
        y_, z_, dt_, ok_, na_, nr_, it = state
        return jnp.any((z_ < z_end) & ok_) & (it < max_steps)

    def body(state):
        y_, z_, dt_, ok_, na_, nr_, it = state
        active = (z_ < z_end) & ok_
        clipped = (z_end - z_) < dt_                   # boundary-limited step
        h = jnp.minimum(dt_, z_end - z_)              # (B,)
        hb = h.reshape(h.shape + (1,) * (y_.ndim - 1))
        yc, yf = attempt(y_, hb)
        enorm = _ssfm_error_norm(yc, yf, y_, rtol=rtol, atol=atol)
        finite = jnp.isfinite(enorm) & _lane_finite(yf) & _lane_finite(yc)

        accept = active & finite & (enorm <= 1.0)
        y_new = (rich * yf - yc) / (rich - 1.0)        # local extrapolation
        # Runaway-gain escape: for a purely linear blowup the split error is
        # exactly zero at ANY step size, so the controller is blind to it --
        # a lane whose mean power passes 1e30 W is unrecoverable (refinement
        # cannot help; overflow is certain) and must fail NOW, not bounce
        # accept/reject until max_steps.
        escape = _lane_rms2(y_new) > jnp.asarray(1e30, rdt)
        accept = accept & ~escape
        factor = jnp.where(
            finite,
            jnp.clip(
                _SSFM_SAFETY * jnp.power(jnp.maximum(enorm, 1e-16), err_exp),
                _SSFM_MIN_FACTOR, _SSFM_MAX_FACTOR,
            ),
            jnp.asarray(0.5, rdt),
        )
        # Step-size update from the EXECUTED step h, except that an accepted
        # boundary-clipped step keeps the converged dt: its near-zero error
        # would otherwise grow dt by MAX_FACTOR off a tiny h and cause a
        # systematic rejection at the start of every save-grid segment.
        base = jnp.where(clipped & accept, dt_, h * factor)
        dt_next = jnp.where(active, jnp.maximum(base, dt_min), dt_)
        failed = active & (((~accept) & (h <= dt_min)) | escape)

        z_out = jnp.where(accept, z_ + h, z_)
        amask = accept.reshape(accept.shape + (1,) * (y_.ndim - 1))
        y_out = jnp.where(amask, y_new, y_)
        ok_out = ok_ & ~failed
        na = na_ + jnp.where(accept, 1, 0).astype(jnp.int32)
        nr = nr_ + jnp.where(active & ~accept, 1, 0).astype(jnp.int32)
        return (y_out, z_out, dt_next, ok_out, na, nr, it + 1)

    y, z, dt, ok, na, nr, _it = lax.while_loop(
        cond, body, (y, z, dt, ok, n0, n0, jnp.asarray(0, jnp.int32))
    )
    # a lane that exhausted max_steps short of z_end failed, not short-ran
    ok = ok & (z >= z_end)
    return y, z, dt, ok, na, nr


@functools.lru_cache(maxsize=64)
def _gnlse_adaptive_solver(rdt_name: str, rtol: float, atol: float,
                           max_steps: int, reduce_mode: bool,
                           method: str = "strang", has_tail: bool = False):
    """Jitted adaptive SSFM over a save grid: (B, T, 2) pack + (S+1,) grid.

    reduce_mode=True returns ONE stacked ``(B, 1 + 2T + 3)`` rdt buffer
    ``[peak_max | y_final flat | ok | n_accepted | n_rejected]`` (split with
    ``_split_reduce_pack(counters=True)``); reduce_mode=False returns the
    trajectory tuple ``(y_saved (S+1, B, T, 2), y_final, ok, na, nr)``.

    ``method``: 'strang' (integrator='rk45', 2nd-order split) or 'rk4ip'
    (integrator='rk4ip45', 4th-order interaction-picture RK4).

    ``has_tail`` realizes the save-decimation contract for the trailing
    ``n_steps % save_every`` partial span: one extra unsaved segment
    ``[z_grid[-1], z_end]`` is integrated and folded into ``ok``/``n_acc``/
    ``n_rej`` ONLY — saved rows, ``y_final`` and ``peak`` stay at the last
    saved grid point, exactly like the fixed-step remainder block.
    """
    rdt = jnp.dtype(rdt_name)
    attempt_fn, order = _ADAPTIVE_ATTEMPTS[method]

    def solve(y0_ri, coeffs: GNLSECoeffs, z_grid, dt0, nl, z_end=None):
        y0 = ri_to_complex(y0_ri)                      # (B, T)
        gamma = jnp.asarray(coeffs.gamma, dtype=rdt)
        if gamma.ndim:
            gamma = gamma[..., None]
        nl = _cast_nl(nl, rdt)
        B = y0.shape[0]
        ok0 = _finite_mask(y0)
        dt_init = jnp.full((B,), dt0, dtype=rdt)
        n0 = jnp.zeros((B,), jnp.int32)

        def attempt(y, hb):
            return attempt_fn(y, coeffs, gamma, hb, nl, rdt)

        def peak(y):
            return jnp.max(y.real * y.real + y.imag * y.imag, axis=-1)

        def seg(carry, z_pair):
            y, dt, ok, pk, na, nr = carry
            z_a, z_b = z_pair
            z = jnp.full((B,), z_a, dtype=rdt)
            y, _z, dt, ok, na_s, nr_s = _gnlse_advance_segment(
                y, z, dt, ok, z_a, z_b, attempt, rdt,
                rtol=rtol, atol=atol, max_steps=max_steps, order=order,
            )
            pk = jnp.maximum(pk, peak(y))
            out = None if reduce_mode else complex_to_ri(y)
            return (y, dt, ok, pk, na + na_s, nr + nr_s), out

        (y, dt, ok, pk, na, nr), ys = lax.scan(
            seg, (y0, dt_init, ok0, peak(y0), n0, n0),
            (z_grid[:-1], z_grid[1:]),
        )
        y_final = complex_to_ri(y).astype(rdt)
        if has_tail:
            z = jnp.full((B,), z_grid[-1], dtype=rdt)
            _yt, _zt, _dtt, ok, na_t, nr_t = _gnlse_advance_segment(
                y, z, dt, ok, z_grid[-1], z_end, attempt, rdt,
                rtol=rtol, atol=atol, max_steps=max_steps, order=order,
            )
            na = na + na_t
            nr = nr + nr_t
        if reduce_mode:
            # ONE stacked output (docs/PERF.md rule 7); counters ride the
            # rdt buffer (f32 is integer-exact to 2^24; beyond that na/nr
            # round -- they are diagnostics, not part of the solve)
            return jnp.concatenate(
                [pk.astype(rdt)[:, None],
                 y_final.reshape(y_final.shape[0], -1),
                 ok.astype(rdt)[:, None], na.astype(rdt)[:, None],
                 nr.astype(rdt)[:, None]], axis=1)
        first = jnp.concatenate([complex_to_ri(y0)[None], ys], axis=0)
        return first, y_final, ok.astype(jnp.int32), na, nr

    return jax.jit(solve)


def _split_reduce_pack(out, T, *, counters):
    """Host split of a fused reduce buffer (B, k + 2T [+2]): returns
    (pk (B, k), y_ri (B, T, 2), ok bool (B,)[, na, nr]) where k is
    whatever leads the 2T state columns."""
    out = np.asarray(out)
    tail = 3 if counters else 1
    k = out.shape[1] - 2 * int(T) - tail
    pk = out[:, :k]
    y_ri = out[:, k:k + 2 * int(T)].reshape(out.shape[0], int(T), 2)
    ok = out[:, k + 2 * int(T)] > 0.5
    if not counters:
        return pk, y_ri, ok
    na = out[:, -2].astype(np.int64)
    nr = out[:, -1].astype(np.int64)
    return pk, y_ri, ok, na, nr


@functools.lru_cache(maxsize=16)
def _gnlse_adaptive_reduce_solver_sharded(rdt_name: str, rtol: float,
                                          atol: float, max_steps: int, mesh,
                                          alpha_rank: int = 1,
                                          method: str = "strang",
                                          has_tail: bool = False):
    """shard_map wrapper of the adaptive reduce solver (batch axis over the
    mesh; grid/dt0/nl replicated)."""
    from jax.sharding import PartitionSpec

    inner = _gnlse_adaptive_solver(rdt_name, rtol, atol, max_steps, True,
                                   method, has_tail)
    axes = tuple(mesh.axis_names)
    ax = axes if len(axes) > 1 else axes[0]
    b = PartitionSpec(ax)
    bt = PartitionSpec(ax, None)
    btr = PartitionSpec(ax, None, None)
    return jax.jit(
        jax.shard_map(
            lambda y0, c, zg, dt0, nl, ze: inner(y0, c, zg, dt0, nl, ze),
            mesh=mesh,
            in_specs=(btr,
                      GNLSECoeffs(gamma=b,
                                  alpha=(bt if alpha_rank == 2 else b),
                                  lin_phase=bt),
                      PartitionSpec(), PartitionSpec(), PartitionSpec(),
                      PartitionSpec()),
            out_specs=bt,
            check_vma=False,
        )
    )


# ---------------------------------------------------------------------------
# Public runners
# ---------------------------------------------------------------------------

def run_gnlse_simulation(
    cfg: SimulationConfig,
    coeffs: GNLSECoeffs,
    A0: np.ndarray,
    *,
    length_unit: str = "m",
    nl: Optional[NLTerms] = None,
    z0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Integrate one envelope over [z0, z0 + z_max]; returns host
    ``(z_saved, A_saved (S+1, T))`` on the decimated save grid.

    ``nl`` (:func:`make_nl_terms`) switches the nonlinear substep from the
    exact Kerr rotation to an RK4 substep on the generalized operator with
    delayed Raman response and self-steepening.

    ``cfg.integrator`` dispatch: ``'rk4'`` is the fixed-step split-step
    Fourier method; ``'rk45'`` the adaptive split-step (step-doubling
    local-error control at ``cfg.rtol``/``cfg.atol``), landing on the SAME
    decimated save grid.

    Checkpoint/resume (reference analog io_fwm.py:297-328 bundles + SURVEY
    §5): pass the last saved row as ``A0`` and its coordinate as ``z0`` (in
    ``length_unit``) to continue an integration.  The co-moving GNLSE is
    autonomous in z (loss, dispersion phase, Kerr/Raman all z-independent),
    so a resumed fixed-step run reproduces the uninterrupted trajectory
    BITWISE from any saved grid point (chunks are not fused across save
    boundaries); rk45 resumes to tolerance (the step-size controller
    restarts from dz).  ``z0`` only offsets the returned z grid.

    Raises ``FloatingPointError`` on NaN/Inf when ``cfg.check_nan`` (eager
    single-run parity with the other model families).
    """
    from ..utils.units import length_scale_to_m

    validate_config(cfg)
    reject_multistep(cfg, "the GNLSE solvers")
    scale = length_scale_to_m(length_unit)
    prec = validate_precision(cfg.precision)
    rdt = real_dtype(prec)
    z0 = float(z0)
    if not np.isfinite(z0):
        raise ValueError("z0 must be finite")

    A0 = np.asarray(A0, dtype=np.complex128)
    if A0.ndim != 1:
        raise ValueError(f"A0 must be a 1-D envelope (T,), got {A0.shape}")
    al_nd = np.ndim(coeffs.alpha)
    spectral_alpha = al_nd == 1 and np.shape(coeffs.alpha)[0] == A0.shape[0]
    if (np.ndim(coeffs.lin_phase) > 1 or np.ndim(coeffs.gamma) > 0
            or (al_nd > 0 and not spectral_alpha)):
        raise ValueError(
            "run_gnlse_simulation takes unbatched coeffs (scalar gamma/alpha "
            "-- or a (T,) spectral alpha -- and (T,) lin_phase); use "
            "solve_gnlse_batch for batched solves"
        )
    if spectral_alpha:
        # normalize to the batched spectral rank (the internal solve is
        # B=1); df32 coeffs stay HOST numpy (f64 jnp arrays cannot be
        # created in a TPU-default process)
        wrap = np.asarray if prec == "df32" else jnp.asarray
        coeffs = GNLSECoeffs(
            gamma=coeffs.gamma,
            alpha=wrap(coeffs.alpha)[None, :],
            lin_phase=coeffs.lin_phase,
        )
    dz_m = float(cfg.dz) * scale
    n_steps = int(round(float(cfg.z_max) * scale / dz_m))
    n_chunks = n_steps // int(cfg.save_every)

    if prec == "df32":
        # matched-tolerance two-float trajectory solve (ops/df32_gnlse.py)
        if cfg.integrator.lower() != "rk4":
            raise ValueError(
                "precision='df32' GNLSE solves are fixed-step rk4 (Strang) "
                "only (use x32 for rk45/rk4ip, or x64 on CPU)"
            )
        from ..utils.precision import require_f64_leaves

        require_f64_leaves(
            "GNLSE df32", gamma=coeffs.gamma, alpha=coeffs.alpha,
            lin_phase=coeffs.lin_phase)
        if nl is not None:
            require_f64_leaves(
                "GNLSE df32 nl terms", hr_re=nl.hr_re, hr_im=nl.hr_im,
                omega=nl.omega)
        from ..ops.df32_gnlse import run_gnlse_traj_df32

        A_saved, ok = run_gnlse_traj_df32(
            A0[None], np.asarray(coeffs.gamma, dtype=float),
            np.asarray(coeffs.alpha, dtype=float),
            np.asarray(coeffs.lin_phase, dtype=float),
            dz_m=dz_m, n_steps=n_steps, save_every=int(cfg.save_every),
            nl=nl,
        )
        if cfg.check_nan and not bool(ok[0]):
            raise FloatingPointError(
                "NaN or Inf detected during GNLSE integration"
            )
        z = z0 + np.arange(n_chunks + 1, dtype=np.float64) * (
            int(cfg.save_every) * dz_m
        ) / scale
        return z, A_saved[:, 0, :]

    if cfg.integrator.lower() in ("rk45", "rk4ip45"):
        # adaptive split-step on the same decimated save grid (rk4-path
        # output contract, mirroring ops/adaptive.run_adaptive_trajectory);
        # trailing n_steps % save_every partial span integrated but unsaved
        # (folds into ok only -- the framework-wide decimation contract)
        remainder = n_steps - n_chunks * int(cfg.save_every)
        z_grid = np.arange(n_chunks + 1, dtype=np.float64) * (
            int(cfg.save_every) * dz_m
        )
        solver = _gnlse_adaptive_solver(
            np.dtype(rdt).name, float(cfg.rtol), float(cfg.atol),
            int(cfg.max_steps), False, _adaptive_method(cfg), remainder > 0,
        )
        ys, yf, ok, _na, _nr = jax.block_until_ready(
            solver(ri_pack_host(A0[None], rdt), coeffs,
                   jnp.asarray(z_grid, dtype=rdt),
                   jnp.asarray(dz_m, dtype=rdt), nl,
                   jnp.asarray(n_steps * dz_m, dtype=rdt))
        )
        if cfg.check_nan and int(np.asarray(ok)[0]) == 0:
            raise FloatingPointError(
                "NaN/Inf or step-size underflow during adaptive "
                f"({cfg.integrator}) GNLSE integration"
            )
        return z0 + z_grid / scale, ri_unpack_host(np.asarray(ys))[:, 0, :]

    solver = _gnlse_solver(n_steps, int(cfg.save_every), np.dtype(rdt).name,
                           _ssfm_method(cfg))
    ys, yf, ok = jax.block_until_ready(
        solver(ri_pack_host(A0[None], rdt), coeffs, jnp.asarray(dz_m, dtype=rdt), nl)
    )
    if cfg.check_nan and int(np.asarray(ok)[0]) == 0:
        raise FloatingPointError("NaN or Inf detected during GNLSE integration")
    z = z0 + np.arange(n_chunks + 1, dtype=np.float64) * (
        int(cfg.save_every) * dz_m
    ) / scale
    A_saved = ri_unpack_host(np.asarray(ys))[:, 0, :]
    return z, A_saved


def solve_gnlse_batch(
    cfg: SimulationConfig,
    coeffs: GNLSECoeffs,
    A0: np.ndarray,
    *,
    length_unit: str = "m",
    mesh=None,
    nl: Optional[NLTerms] = None,
    engine: str = "auto",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Solve B independent envelopes in one XLA program (reduce mode).

    ``A0`` is ``(B, T)`` complex; ``coeffs`` fields broadcast or carry a
    leading B axis.  Returns host ``(peak_max (B,), A_last (B, T), ok (B,))``
    -- running max over saved samples of the instantaneous peak power, and
    the field at the last saved grid point.  Pass ``mesh`` to shard the batch
    axis (``shard_map``; each device runs the FFTs on its own shard).
    ``nl`` (:func:`make_nl_terms`) enables Raman + self-steepening (shared
    across the batch; replicated over the mesh when sharded).

    ``engine``: 'scan' (XLA loop, any nonlinearity/integrator/precision),
    'pallas' (fused single-launch VMEM-resident SSFM kernel,
    ``ops/pallas_gnlse.py``: fixed-step, x32, T a multiple of 128 up to
    2048; Kerr rotation by default, in-kernel RK4 on the Raman/
    self-steepening operator with ``nl=``), or 'auto' (scan; the kernel
    is opt-in).

    ``cfg.integrator='rk45'`` runs the adaptive split-step (lockstep batched
    lanes, per-lane step size, frozen failed lanes); the peak reduction is
    over the same saved grid, and integration stops at the last saved grid
    point (adaptive-path parity with ``ops/adaptive``).

    Checkpoint/resume: ``A_last`` IS the restart state -- the equation is
    autonomous in z, so feeding a previous call's ``A_last`` back in as
    ``A0`` continues every lane bitwise (fixed-step; rk45 to tolerance).
    Combine segment peaks with ``np.maximum`` (each call's ``peak_max``
    covers its own saved grid including its row 0).
    """
    from ..utils.units import length_scale_to_m

    validate_config(cfg)
    reject_multistep(cfg, "the GNLSE solvers")
    scale = length_scale_to_m(length_unit)
    prec = validate_precision(cfg.precision)

    A0 = np.asarray(A0, dtype=np.complex128)
    if A0.ndim != 2:
        raise ValueError(f"A0 must have shape (B, T), got {A0.shape}")
    B, T = A0.shape
    dz_m = float(cfg.dz) * scale
    n_steps = int(round(float(cfg.z_max) * scale / dz_m))

    if engine not in ("auto", "scan", "pallas"):
        raise ValueError(
            f"engine must be 'auto', 'scan' or 'pallas', got {engine!r}"
        )
    if prec == "df32" and engine != "pallas":
        # matched-tolerance two-float SSFM (ops/df32_gnlse.py; ~1e-12 vs
        # the x64 solver over 10^3 steps on the f64-less v5e)
        if cfg.integrator.lower() != "rk4":
            raise ValueError(
                "precision='df32' GNLSE solves are fixed-step rk4 (Strang) "
                "only (use x32 for rk45/rk4ip, or x64 on CPU)"
            )
        from ..utils.precision import require_f64_leaves

        require_f64_leaves(
            "GNLSE df32", gamma=coeffs.gamma, alpha=coeffs.alpha,
            lin_phase=coeffs.lin_phase)
        if nl is not None:
            require_f64_leaves(
                "GNLSE df32 nl terms", hr_re=nl.hr_re, hr_im=nl.hr_im,
                omega=nl.omega)
        from ..ops.df32_gnlse import solve_gnlse_batch_df32

        return solve_gnlse_batch_df32(
            A0, np.asarray(coeffs.gamma, dtype=float),
            np.asarray(coeffs.alpha, dtype=float),
            np.asarray(coeffs.lin_phase, dtype=float),
            dz_m=dz_m, n_steps=n_steps, save_every=int(cfg.save_every),
            mesh=mesh, nl=nl,
        )
    rdt = real_dtype(require_non_df32(cfg.precision, family="GNLSE split-step"))
    if engine == "pallas":
        if validate_precision(cfg.precision) != "x32":
            raise ValueError("engine='pallas' SSFM kernel is x32 only")
        if cfg.integrator.lower() == "rk45":
            # fused adaptive (Sinkin step-doubling) kernel (round 5,
            # ops/pallas_ssfm_adaptive.py): Kerr only, flat per-lane loss
            if nl is not None:
                raise ValueError(
                    "the fused adaptive SSFM kernel is Kerr-only; use "
                    "engine='scan' for nl= with integrator='rk45'"
                )
            al = np.asarray(coeffs.alpha, dtype=float)
            if al.ndim == 2 or (al.ndim == 1 and al.shape[0] == T
                                and T != B):
                raise ValueError(
                    "the fused adaptive SSFM kernel supports flat "
                    "per-lane loss only (spectral alpha: engine='scan')"
                )
            from ..ops.pallas_ssfm_adaptive import (
                solve_gnlse_batch_rk45_pallas,
            )

            r = solve_gnlse_batch_rk45_pallas(
                A0, np.asarray(coeffs.gamma, dtype=float), al,
                np.asarray(coeffs.lin_phase, dtype=float),
                dz_m=dz_m, n_steps=n_steps,
                save_every=int(cfg.save_every), rtol=float(cfg.rtol),
                atol=float(cfg.atol), max_steps=int(cfg.max_steps),
                interpret=jax.default_backend() != "tpu", mesh=mesh,
            )
            return r.peak_max, r.A_end, r.ok
        if cfg.integrator.lower() != "rk4":
            raise ValueError(
                "engine='pallas' SSFM kernel implements the fixed-step "
                "Strang split (integrator='rk4') and the adaptive "
                "integrator='rk45' only"
            )
        from ..ops.pallas_gnlse import solve_gnlse_batch_pallas

        return solve_gnlse_batch_pallas(
            A0, np.asarray(coeffs.gamma, dtype=float),
            np.asarray(coeffs.alpha, dtype=float),
            np.asarray(coeffs.lin_phase, dtype=float),
            dz_m=dz_m, n_steps=n_steps, save_every=int(cfg.save_every),
            interpret=jax.default_backend() != "tpu", mesh=mesh, nl=nl,
        )

    gamma = np.broadcast_to(np.asarray(coeffs.gamma, dtype=float), (B,))
    al = np.asarray(coeffs.alpha, dtype=float)
    # spectral alpha (trailing-T axis) broadcasts to (B, T); flat to (B,).
    # A 1-D alpha is per-instance (B,) UNLESS it can only be spectral; with
    # B == T pass an explicit (B, T) to request the spectral reading.
    if al.ndim == 2 or (al.ndim == 1 and al.shape[0] == T and T != B):
        alpha = np.broadcast_to(al, (B, T))
    else:
        alpha = np.broadcast_to(al, (B,))
    phase = np.broadcast_to(np.asarray(coeffs.lin_phase, dtype=float), (B, T))

    n_orig = B
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, pad_batch, put_global

        ndev = int(np.prod(list(mesh.shape.values())))
        A0, n_orig = pad_batch(A0, ndev)
        gamma, _ = pad_batch(gamma, ndev)
        alpha, _ = pad_batch(alpha, ndev)
        phase, _ = pad_batch(phase, ndev)

    y0_ri = ri_pack_host(A0, rdt)

    use_rk45 = cfg.integrator.lower() in ("rk45", "rk4ip45")
    if use_rk45:
        n_chunks = n_steps // int(cfg.save_every)
        rk45_tail = (n_steps - n_chunks * int(cfg.save_every)) > 0
        z_grid = jnp.asarray(
            np.arange(n_chunks + 1, dtype=np.float64)
            * (int(cfg.save_every) * dz_m),
            dtype=rdt,
        )
        dt0 = jnp.asarray(dz_m, dtype=rdt)
        z_end = jnp.asarray(n_steps * dz_m, dtype=rdt)

    if mesh is None:
        coeffs_b = GNLSECoeffs(
            gamma=jnp.asarray(gamma, dtype=rdt),
            alpha=jnp.asarray(alpha, dtype=rdt),
            lin_phase=jnp.asarray(phase, dtype=rdt),
        )
        if use_rk45:
            solver = _gnlse_adaptive_solver(
                np.dtype(rdt).name, float(cfg.rtol), float(cfg.atol),
                int(cfg.max_steps), True, _adaptive_method(cfg), rk45_tail,
            )
            out = jax.block_until_ready(
                solver(jnp.asarray(y0_ri), coeffs_b, z_grid, dt0, nl, z_end)
            )
            pk, y_ri, ok, _na, _nr = _split_reduce_pack(out, T, counters=True)
        else:
            solver = _gnlse_reduce_solver(
                n_steps, int(cfg.save_every), np.dtype(rdt).name,
                _ssfm_method(cfg),
            )
            out = jax.block_until_ready(
                solver(jnp.asarray(y0_ri), coeffs_b, jnp.asarray(dz_m, dtype=rdt), nl)
            )
            pk, y_ri, ok = _split_reduce_pack(out, T, counters=False)
        pk = pk[:, 0]
    else:
        sh = batch_sharding(mesh)
        y0_dev = put_global(y0_ri, sh)
        cof_dev = GNLSECoeffs(
            gamma=put_global(np.asarray(gamma, dtype=rdt), sh),
            alpha=put_global(np.asarray(alpha, dtype=rdt), sh),
            lin_phase=put_global(np.asarray(phase, dtype=rdt), sh),
        )
        from ..parallel.mesh import fetch_global

        if use_rk45:
            solver = _gnlse_adaptive_reduce_solver_sharded(
                np.dtype(rdt).name, float(cfg.rtol), float(cfg.atol),
                int(cfg.max_steps), mesh, alpha.ndim, _adaptive_method(cfg),
                rk45_tail,
            )
            out = fetch_global(jax.block_until_ready(
                solver(y0_dev, cof_dev, z_grid, dt0, nl, z_end)
            ))
            pk, y_ri, ok, _na, _nr = _split_reduce_pack(out, T, counters=True)
        else:
            solver = _gnlse_reduce_solver_sharded(
                n_steps, int(cfg.save_every), np.dtype(rdt).name, mesh,
                alpha.ndim, _ssfm_method(cfg),
            )
            out = fetch_global(jax.block_until_ready(
                solver(y0_dev, cof_dev, jnp.asarray(dz_m, dtype=rdt), nl)
            ))
            pk, y_ri, ok = _split_reduce_pack(out, T, counters=False)
        pk = pk[:, 0]

    peak = np.asarray(pk, dtype=np.float64)[:n_orig]
    A_last = ri_unpack_host(np.asarray(y_ri))[:n_orig]
    return peak, A_last, np.asarray(ok)[:n_orig].astype(bool)


def solve_gnlse_batch_trajectories(
    cfg: SimulationConfig,
    coeffs: GNLSECoeffs,
    A0: np.ndarray,
    *,
    length_unit: str = "m",
    mesh=None,
    nl: Optional[NLTerms] = None,
    z0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched solve returning full decimated trajectories
    ``(z (S+1,), A (B, S+1, T) complex, ok (B,))`` -- the GNLSE analog of
    ``sweep.solve_batch_trajectories`` (use :func:`solve_gnlse_batch` for
    large sweeps; trajectories materialize S+1 copies of the batch state).
    ``mesh`` shards the batch axis via ``shard_map`` (per-shard local FFTs);
    ``z0`` offsets the returned grid (resume; the equation is autonomous).
    """
    from ..utils.units import length_scale_to_m

    validate_config(cfg)
    reject_multistep(cfg, "the GNLSE solvers")
    scale = length_scale_to_m(length_unit)
    prec = validate_precision(cfg.precision)
    z0 = float(z0)

    A0 = np.asarray(A0, dtype=np.complex128)
    if A0.ndim != 2:
        raise ValueError(f"A0 must have shape (B, T), got {A0.shape}")
    B, T = A0.shape
    dz_m = float(cfg.dz) * scale
    n_steps = int(round(float(cfg.z_max) * scale / dz_m))
    n_chunks = n_steps // int(cfg.save_every)

    if prec == "df32":
        # matched-tolerance two-float trajectory solve (ops/df32_gnlse.py;
        # unsharded -- trajectory mode is a small-batch inspection API)
        if cfg.integrator.lower() != "rk4":
            raise ValueError(
                "precision='df32' GNLSE solves are fixed-step rk4 (Strang) "
                "only (use x32 for rk45/rk4ip, or x64 on CPU)"
            )
        if mesh is not None:
            raise ValueError(
                "precision='df32' trajectories are unsharded; shard the "
                "reduce-mode solve_gnlse_batch instead"
            )
        from ..utils.precision import require_f64_leaves

        require_f64_leaves(
            "GNLSE df32", gamma=coeffs.gamma, alpha=coeffs.alpha,
            lin_phase=coeffs.lin_phase)
        if nl is not None:
            require_f64_leaves(
                "GNLSE df32 nl terms", hr_re=nl.hr_re, hr_im=nl.hr_im,
                omega=nl.omega)
        from ..ops.df32_gnlse import run_gnlse_traj_df32

        A_saved, ok = run_gnlse_traj_df32(
            A0, np.asarray(coeffs.gamma, dtype=float),
            np.asarray(coeffs.alpha, dtype=float),
            np.asarray(coeffs.lin_phase, dtype=float),
            dz_m=dz_m, n_steps=n_steps, save_every=int(cfg.save_every),
            nl=nl,
        )
        z = z0 + np.arange(n_chunks + 1, dtype=np.float64) * (
            int(cfg.save_every) * dz_m
        ) / scale
        return z, np.swapaxes(A_saved, 0, 1), ok
    rdt = real_dtype(prec)

    gamma = np.broadcast_to(np.asarray(coeffs.gamma, dtype=float), (B,))
    al = np.asarray(coeffs.alpha, dtype=float)
    # spectral alpha (trailing-T axis) broadcasts to (B, T); flat to (B,).
    # A 1-D alpha is per-instance (B,) UNLESS it can only be spectral; with
    # B == T pass an explicit (B, T) to request the spectral reading.
    if al.ndim == 2 or (al.ndim == 1 and al.shape[0] == T and T != B):
        alpha = np.broadcast_to(al, (B, T))
    else:
        alpha = np.broadcast_to(al, (B,))
    phase = np.broadcast_to(np.asarray(coeffs.lin_phase, dtype=float), (B, T))
    n_orig = B
    if mesh is not None:
        from ..parallel.mesh import pad_batch

        ndev = int(np.prod(list(mesh.shape.values())))
        A0, n_orig = pad_batch(A0, ndev)
        gamma, _ = pad_batch(gamma, ndev)
        alpha, _ = pad_batch(alpha, ndev)
        phase, _ = pad_batch(phase, ndev)

    z = z0 + np.arange(n_chunks + 1, dtype=np.float64) * (
        int(cfg.save_every) * dz_m
    ) / scale
    use_rk45 = cfg.integrator.lower() in ("rk45", "rk4ip45")
    rk45_tail = use_rk45 and (n_steps - n_chunks * int(cfg.save_every)) > 0
    z_end = jnp.asarray(n_steps * dz_m, dtype=rdt)

    y0_ri = ri_pack_host(A0, rdt)
    if mesh is None:
        cof = GNLSECoeffs(
            gamma=jnp.asarray(gamma, dtype=rdt),
            alpha=jnp.asarray(alpha, dtype=rdt),
            lin_phase=jnp.asarray(phase, dtype=rdt),
        )
        if use_rk45:
            z_grid = jnp.asarray(
                np.arange(n_chunks + 1, dtype=np.float64)
                * (int(cfg.save_every) * dz_m), dtype=rdt)
            solver = _gnlse_adaptive_solver(
                np.dtype(rdt).name, float(cfg.rtol), float(cfg.atol),
                int(cfg.max_steps), False, _adaptive_method(cfg), rk45_tail,
            )
            ys, _yf, ok, _na, _nr = jax.block_until_ready(
                solver(jnp.asarray(y0_ri), cof, z_grid,
                       jnp.asarray(dz_m, dtype=rdt), nl, z_end)
            )
        else:
            solver = _gnlse_solver(n_steps, int(cfg.save_every),
                                   np.dtype(rdt).name, _ssfm_method(cfg))
            ys, _yf, ok = jax.block_until_ready(
                solver(jnp.asarray(y0_ri), cof,
                       jnp.asarray(dz_m, dtype=rdt), nl)
            )
    else:
        from ..parallel.mesh import batch_sharding, fetch_global, put_global

        sh = batch_sharding(mesh)
        cof = GNLSECoeffs(
            gamma=put_global(np.asarray(gamma, dtype=rdt), sh),
            alpha=put_global(np.asarray(alpha, dtype=rdt), sh),
            lin_phase=put_global(np.asarray(phase, dtype=rdt), sh),
        )
        y0_dev = put_global(y0_ri, sh)
        if use_rk45:
            z_grid = jnp.asarray(
                np.arange(n_chunks + 1, dtype=np.float64)
                * (int(cfg.save_every) * dz_m), dtype=rdt)
            solver = _gnlse_traj_solver_sharded(
                np.dtype(rdt).name, float(cfg.rtol), float(cfg.atol),
                int(cfg.max_steps), mesh, True, alpha.ndim,
                _adaptive_method(cfg), rk45_tail,
            )
            out = jax.block_until_ready(
                solver(y0_dev, cof, z_grid, jnp.asarray(dz_m, dtype=rdt),
                       nl, z_end)
            )
            ys, ok = fetch_global(out[0]), fetch_global(out[1])
        else:
            solver = _gnlse_traj_solver_sharded_fixed(
                n_steps, int(cfg.save_every), np.dtype(rdt).name, mesh,
                alpha.ndim, _ssfm_method(cfg),
            )
            out = jax.block_until_ready(
                solver(y0_dev, cof, jnp.asarray(dz_m, dtype=rdt), nl)
            )
            ys, ok = fetch_global(out[0]), fetch_global(out[1])

    A = ri_unpack_host(np.asarray(ys)).transpose(1, 0, 2)[:n_orig]
    return z, A, np.asarray(ok)[:n_orig].astype(bool)


@functools.lru_cache(maxsize=16)
def _gnlse_traj_solver_sharded_fixed(n_steps: int, save_every: int,
                                     rdt_name: str, mesh, alpha_rank: int = 1,
                                     method: str = "strang"):
    """shard_map wrapper of the fixed-step trajectory solver (batch axis on
    axis 1 of the stacked output)."""
    from jax.sharding import PartitionSpec

    inner = _gnlse_solver(n_steps, save_every, rdt_name, method)
    axes = tuple(mesh.axis_names)
    ax = axes if len(axes) > 1 else axes[0]
    b = PartitionSpec(ax)
    bt = PartitionSpec(ax, None)
    btr = PartitionSpec(ax, None, None)

    def run(y0, c, dz, nl):
        ys, yf, ok = inner(y0, c, dz, nl)
        return ys, ok

    return jax.jit(
        jax.shard_map(
            run, mesh=mesh,
            in_specs=(btr,
                      GNLSECoeffs(gamma=b,
                                  alpha=(bt if alpha_rank == 2 else b),
                                  lin_phase=bt),
                      PartitionSpec(), PartitionSpec()),
            out_specs=(PartitionSpec(None, ax, None, None), b),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=16)
def _gnlse_traj_solver_sharded(rdt_name: str, rtol: float, atol: float,
                               max_steps: int, mesh, _traj: bool,
                               alpha_rank: int = 1, method: str = "strang",
                               has_tail: bool = False):
    """shard_map wrapper of the adaptive trajectory solver."""
    from jax.sharding import PartitionSpec

    inner = _gnlse_adaptive_solver(rdt_name, rtol, atol, max_steps, False,
                                   method, has_tail)
    axes = tuple(mesh.axis_names)
    ax = axes if len(axes) > 1 else axes[0]
    b = PartitionSpec(ax)
    bt = PartitionSpec(ax, None)
    btr = PartitionSpec(ax, None, None)

    def run(y0, c, zg, dt0, nl, ze):
        ys, yf, ok, _na, _nr = inner(y0, c, zg, dt0, nl, ze)
        return ys, ok

    return jax.jit(
        jax.shard_map(
            run, mesh=mesh,
            in_specs=(btr,
                      GNLSECoeffs(gamma=b,
                                  alpha=(bt if alpha_rank == 2 else b),
                                  lin_phase=bt),
                      PartitionSpec(), PartitionSpec(), PartitionSpec(),
                      PartitionSpec()),
            out_specs=(PartitionSpec(None, ax, None, None), b),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=16)
def _gnlse_reduce_solver_sharded(n_steps: int, save_every: int, rdt_name: str,
                                 mesh, alpha_rank: int = 1,
                                 method: str = "strang"):
    """shard_map-wrapped reduce solver: batch axis split over the mesh; the
    per-shard FFTs run on local (unsharded) buffers, so the XLA:CPU sharded-
    FFT limitation does not apply."""
    from jax.sharding import PartitionSpec

    inner = _gnlse_reduce_solver(n_steps, save_every, rdt_name, method)
    axes = tuple(mesh.axis_names)
    ax = axes if len(axes) > 1 else axes[0]
    b = PartitionSpec(ax)
    bt = PartitionSpec(ax, None)
    btr = PartitionSpec(ax, None, None)
    # nl terms are replicated on every device (pytree-prefix spec covers
    # both the None and the NLTerms structure)
    return jax.jit(
        jax.shard_map(
            lambda y0, c, dz, nl: inner(y0, c, dz, nl),
            mesh=mesh,
            in_specs=(btr,
                      GNLSECoeffs(gamma=b,
                                  alpha=(bt if alpha_rank == 2 else b),
                                  lin_phase=bt),
                      PartitionSpec(), PartitionSpec()),
            out_specs=bt,
            check_vma=False,
        )
    )


# ---------------------------------------------------------------------------
# Derived quantities
# ---------------------------------------------------------------------------

def pulse_energy(grid: TimeGrid, A: np.ndarray) -> np.ndarray:
    """Envelope energy integral |A|^2 dt [J] over the window."""
    return (np.abs(np.asarray(A)) ** 2).sum(axis=-1) * grid.dt_s


def spectrum_dbw(grid: TimeGrid, A: np.ndarray, *, floor_dbw: float = -200.0):
    """(omega sorted, |A(omega)|^2 in dBW-per-bin): fftshifted power spectrum
    normalized so a single comb line recovers its line power."""
    spec = np.fft.fft(np.asarray(A, dtype=np.complex128), axis=-1)
    P = np.abs(spec / int(grid.n_samples)) ** 2
    P = np.fft.fftshift(P, axes=-1)
    om = np.fft.fftshift(grid.omega())
    return om, 10.0 * np.log10(np.maximum(P, 10 ** (floor_dbw / 10.0)))
