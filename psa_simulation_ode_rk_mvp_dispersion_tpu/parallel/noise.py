"""Semiclassical (Wigner) quantum-noise Monte Carlo for the 4-wave model.

Estimates amplifier noise figures by brute-force ensemble simulation --
the measurement the reference's deterministic solver cannot make, and a
showcase of the batched-solve throughput (10^4-10^6 independent solves are
one XLA program; see ``parallel/sweep.solve_batch``).

Method (truncated-Wigner / semiclassical): each selected wave's input
amplitude receives an independent complex Gaussian perturbation with the
symmetric-ordering vacuum variance of HALF A PHOTON per mode,

    <|dA|^2> = (1/2) hbar omega / T_mode   [W],

where ``t_mode_s`` is the measurement mode duration (n = P T_mode / hbar
omega photons).  The ensemble is propagated through the full nonlinear
solve and photon-number statistics of the measured wave(s) give

    NF = SNR_in / SNR_out,   SNR = <n>^2 / Var(n).

For mean photon numbers >> 1 the Wigner symmetric-ordering corrections
(half-photon offsets) are negligible and this reproduces the standard
quantum limits, which serve as oracles (tests/test_noise.py):

- ideal phase-insensitive amplification (signal in, idler vacuum):
  NF -> 2 - 1/G  (3 dB at high gain);
- ideal phase-sensitive amplification (signal + idler seeded at the
  max-gain phase, joint measurement): NF -> 1  (0 dB) -- the noiseless
  amplifier quantum mechanics allows.

Lane 0 of the batch is kept noise-free, giving the exact mean-field gain
alongside the ensemble.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence, Tuple

import numpy as np

from ..config import SimulationConfig
from ..constants import hbar
from ..models.fwm4 import WAVE_ORDER, make_initial_amplitudes
from ..ops.rhs import RHSCoeffs
from .sweep import solve_batch

_WAVE_INDEX = {name: i for i, name in enumerate(WAVE_ORDER)}


@dataclasses.dataclass(frozen=True)
class NoiseFigureResult:
    """Monte-Carlo noise-figure estimate (all host scalars/arrays)."""

    nf_db: float             # SNR_in / SNR_out in dB for the measured wave(s)
    gain_db: float           # mean-field photon-number gain of the measurement
    snr_in_db: float
    snr_out_db: float
    n_in_photons: float      # mean-field input photon number (measured waves)
    n_out_photons: float
    n_samples: int           # noisy ensemble size (lane 0 excluded)
    ok_fraction: float
    t_mode_s: float
    measure: Tuple[str, ...]
    elapsed_s: float

    def __repr__(self) -> str:  # compact, the common interactive need
        return (
            f"NoiseFigureResult(nf={self.nf_db:.3f} dB, "
            f"gain={self.gain_db:.2f} dB, n_samples={self.n_samples}, "
            f"measure={'+'.join(self.measure)})"
        )


def _photon_stats(A: np.ndarray, omega: np.ndarray, idx: Sequence[int],
                  t_mode_s: float) -> Tuple[np.ndarray, float, float]:
    """Ensemble (mean, variance) of the summed photon number over ``idx``."""
    n = np.zeros(A.shape[0], dtype=np.float64)
    for j in idx:
        n = n + (np.abs(A[:, j]) ** 2) * t_mode_s / (hbar * float(omega[j]))
    return n, float(n.mean()), float(n.var(ddof=1) if n.size > 1 else 0.0)


def noise_figure_monte_carlo(
    cfg: SimulationConfig,
    *,
    gamma: float,
    alpha: float,
    omega: np.ndarray,
    p_in: np.ndarray,
    phase_in: Optional[np.ndarray] = None,
    delta_beta: float = 0.0,
    t_mode_s: float = 1e-9,
    n_samples: int = 8192,
    noisy_waves: Sequence[bool] = (True, True, True, True),
    measure: str = "signal",
    seed: int = 0,
    mesh=None,
    engine: str = "auto",
) -> NoiseFigureResult:
    """Monte-Carlo noise figure of a 4-wave parametric amplifier.

    All quantities in internal per-meter units (``gamma`` [1/(W m)],
    ``alpha`` [1/m], ``delta_beta`` [1/m]; ``cfg.z_max``/``cfg.dz`` in
    meters), matching :func:`~.sweep.solve_batch`'s contract -- compute
    ``delta_beta`` with :func:`psa.compute_phase_mismatch` for
    dispersion-aware runs.

    ``measure`` selects the detected mode(s): one of ``WAVE_ORDER`` or a
    '+'-joined combination (e.g. ``'signal+idler'`` for the joint PSA
    measurement).  ``noisy_waves`` masks which inputs receive vacuum noise
    (pumps can be kept noiseless to isolate the ideal-amplifier limit).
    ``t_mode_s`` sets the photon-number scale n = P T/(hbar omega); results
    are t_mode-independent as long as n >> 1.
    """
    omega = np.asarray(omega, dtype=np.float64).reshape(4)
    p_in = np.asarray(p_in, dtype=np.float64).reshape(4)
    if phase_in is None:
        phase_in = np.zeros(4)
    names = tuple(str(measure).split("+"))
    bad = [m for m in names if m not in _WAVE_INDEX]
    if bad:
        raise ValueError(
            f"measure must combine {WAVE_ORDER} with '+', got {bad}"
        )
    idx = [_WAVE_INDEX[m] for m in names]
    noisy = np.asarray(noisy_waves, dtype=bool).reshape(4)
    quiet = [m for m in names if not noisy[_WAVE_INDEX[m]]]
    if quiet:
        raise ValueError(
            f"measured wave(s) {quiet} receive no vacuum noise "
            "(noisy_waves masks them out), so the input ensemble variance "
            "is zero and SNR_in is undefined"
        )
    if int(n_samples) < 2:
        raise ValueError("n_samples must be >= 2")
    if not float(t_mode_s) > 0.0:
        raise ValueError("t_mode_s must be positive")

    A_mean = np.asarray(make_initial_amplitudes(p_in, phase_in),
                        dtype=np.complex128)

    # vacuum (Wigner) seeding: half a photon per mode, quarter per quadrature
    rng = np.random.default_rng(seed)
    sigma2 = 0.5 * hbar * omega / float(t_mode_s)          # <|dA|^2> [W]
    B = int(n_samples) + 1                                  # lane 0 noise-free
    xi = (rng.standard_normal((B, 4)) + 1j * rng.standard_normal((B, 4)))
    xi *= np.sqrt(sigma2 / 2.0)[None, :]
    xi[0] = 0.0
    xi[:, ~noisy] = 0.0
    A0 = A_mean[None, :] + xi

    coeffs = RHSCoeffs(
        gamma=np.full(B, float(gamma)),
        alpha=np.full(B, float(alpha)),
        delta_beta=np.full(B, float(delta_beta)),
    )
    t0 = time.perf_counter()
    res = solve_batch(cfg, coeffs, A0, mesh=mesh, engine=engine)
    elapsed = time.perf_counter() - t0

    ok = np.asarray(res.ok, dtype=bool)
    if not ok[0]:
        raise FloatingPointError(
            "mean-field (noise-free) lane diverged; noise figure undefined"
        )
    keep = ok.copy()
    keep[0] = False                                         # stats: noisy lanes
    if keep.sum() < 2:
        raise FloatingPointError(
            "fewer than 2 noisy lanes survived; cannot estimate variance"
        )

    _, n_in_mean, n_in_var = _photon_stats(A0[keep], omega, idx, t_mode_s)
    _, n_out_mean, n_out_var = _photon_stats(
        np.asarray(res.A_end)[keep], omega, idx, t_mode_s
    )
    # mean-field photon numbers from the noise-free lane
    _, n_in_mf, _ = _photon_stats(A0[:1], omega, idx, t_mode_s)
    _, n_out_mf, _ = _photon_stats(
        np.asarray(res.A_end)[:1], omega, idx, t_mode_s
    )
    if n_in_mf <= 0.0:
        raise ValueError(
            "measured wave(s) carry no input power; SNR_in undefined "
            "(seed the measured mode or measure a seeded one)"
        )

    snr_in = n_in_mean**2 / n_in_var
    snr_out = n_out_mean**2 / n_out_var
    return NoiseFigureResult(
        nf_db=10.0 * np.log10(snr_in / snr_out),
        gain_db=10.0 * np.log10(n_out_mf / n_in_mf),
        snr_in_db=10.0 * np.log10(snr_in),
        snr_out_db=10.0 * np.log10(snr_out),
        n_in_photons=n_in_mf,
        n_out_photons=n_out_mf,
        n_samples=int(keep.sum()),
        ok_fraction=float(ok.mean()),
        t_mode_s=float(t_mode_s),
        measure=names,
        elapsed_s=elapsed,
    )
