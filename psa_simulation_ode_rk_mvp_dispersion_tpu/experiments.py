"""Ready-made experiments wiring the full stack, and their default physics.

Capability parity with reference ``main.py``: ``main_single_simulation``
(:22-117), ``main_gain_spectrum`` (:119-203), ``main_gain_spectrum_dbeta``
(:206-280) -- with the same default physics (pump wavelengths, D/S values,
gamma, loss, powers) so a reference user lands on familiar numbers.  Unlike
the reference (experiments are edited source), every experiment takes keyword
overrides and is reachable from the CLI (``__main__.py``).

Extensions beyond the reference entry points: a mismatch scan (the working
version of the reference's stale ``scan_mismatch_seeded_signal``), a PSA
phase sweep, and a 2-D pump-power x wavelength gain map.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import plotting
from .config import custom_simulation_config
from .io_fwm import make_run_metadata, save_run_bundle, save_sweep_npz
from .models.fwm4 import run_single_simulation
from .ops.dispersion import DispersionParams, dispersion_params_from_D_S
from .ops.frequency_plan import (
    describe_plan,
    infer_symmetry_from_omegas,
    lambda_from_omega,
    plan_from_wavelengths,
)
from .ops.phase_matching import PhaseMatchingConfig, PhaseMatchingMethod
from .parallel import sweep as sweeps
from .utils.units import alpha_db_per_km_to_1_m

_PM_DEFAULT = PhaseMatchingConfig(
    method=PhaseMatchingMethod.SYMMETRIC_EVEN, even_orders=(2, 4), max_order=4,
    atol=0.0, rtol=1e-12,
)


def _dispersion_at_pump_center(lambda_p1, lambda_p2, lambda_signal0, *, D, S):
    """Build DispersionParams expanded at the pump-center frequency omega_c
    (the expansion point the symmetric-even formula assumes)."""
    omega = np.asarray(plan_from_wavelengths(lambda_p1, lambda_p2, lambda_signal0))
    sp = infer_symmetry_from_omegas(omega[0], omega[1], omega[2], omega[3])
    disp = dispersion_params_from_D_S(
        lambda_ref_m=float(lambda_from_omega(sp.omega_c)),
        D=D, S=S, dSdlmbd=0,
        D_units="ps/nm/km", S_units="ps/nm^2/km", dSdlmbd_units="ps/nm^3/km",
        omega_ref=float(np.asarray(sp.omega_c)),
    )
    return omega, sp, disp


def single_simulation(
    *,
    lambda_p1: float = 1550e-9,
    lambda_p2: float = 1560e-9,
    lambda_signal: float = 1555e-9,
    z_max_m: float = 1000.0,
    dz_m: float = 0.1,
    D: float = 0.02,
    S: float = 0.02,
    gamma_km: float = 11.5,
    alpha_db_per_km: float = 0.9,
    p_in=(0.5, 0.5, 1e-5, 1e-5),
    precision: str = "x64",
    integrator: str = "rk4",
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Single dual-pump run with dispersion-aware phase matching; prints the
    plan and result summary, plots powers in dBW.  Defaults reproduce
    reference ``main_single_simulation`` (main.py:22-117; 45.292 dB anchor)."""
    cfg = custom_simulation_config(
        z_max=z_max_m, dz=dz_m, precision=precision, integrator=integrator
    )
    omega, sp, disp = _dispersion_at_pump_center(
        lambda_p1, lambda_p2, lambda_signal, D=D, S=S
    )
    if verbose:
        print(describe_plan(omega))

    gamma_m = gamma_km / 1000.0
    alpha_m = alpha_db_per_km_to_1_m(alpha_db_per_km)
    p_in = np.asarray(p_in, dtype=float)

    z, A = run_single_simulation(
        cfg, gamma=gamma_m, alpha=alpha_m, omega=omega, p_in=p_in,
        phase_in=np.zeros(4), dispersion=disp, phase_matching_cfg=_PM_DEFAULT,
        length_unit="m", return_length_unit="m",
    )

    P_out = np.abs(A[-1]) ** 2
    gain_db = 10.0 * np.log10(P_out[2] / p_in[2])
    from .ops.dispersion import delta_beta_from_omegas, delta_beta_symmetric

    db = float(np.asarray(delta_beta_from_omegas(omega, disp)))
    db_sym = float(np.asarray(delta_beta_symmetric(sp.omega_c, sp.omega_d, sp.Omega, disp)))
    if verbose:
        print("\n--- Results ---")
        print(f"z_end = {z[-1]:.3f} m")
        print(f"P_in  [W] = {p_in}")
        print(f"P_out [W] = {P_out}")
        print(f"Signal gain = {gain_db:.3f} dB")
        print(f"dbeta = {db:.6g} m^-1   dbeta_sym = {db_sym:.6g} m^-1")
        print(f"gamma(P1 + P2) = {gamma_m * (p_in[0] + p_in[1]):.6g} m^-1")

    if save_dir is not None:
        save_run_bundle(
            save_dir, "single_simulation", z, A,
            metadata=make_run_metadata(
                {"gain_db": gain_db, "dbeta_1_m": db}, config=cfg
            ),
            overwrite=True,
        )
    plotting.plot_fwm_sbs_powers_forward(
        z, A, scale="dbW", z_unit="m", show=show,
        save_path=None if save_dir is None else f"{save_dir}/single_simulation.png",
    )
    return z, A


def gain_spectrum(
    *,
    lambda_p1: float = 1550e-9,
    lambda_p2: float = 1555e-9,
    lambda_signal_range: Tuple[float, float] = (1540e-9, 1650e-9),
    n_points: int = 100,
    z_max_m: float = 500.0,
    dz_m: float = 0.2,
    D: float = 0.2,
    S: float = 0.02,
    gamma_km: float = 11.5,
    alpha_db_per_km: float = 0.5,
    p_in=(0.5, 0.5, 1e-7, 1e-7),
    precision: str = "x64",
    integrator: str = "rk4",
    mesh=None,
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Signal-wavelength gain spectrum (defaults: reference
    ``main_gain_spectrum``, main.py:119-203) -- one batched solve."""
    cfg = custom_simulation_config(
        z_max=z_max_m, dz=dz_m, precision=precision, integrator=integrator
    )
    lam3 = np.linspace(*lambda_signal_range, n_points)
    _, _, disp = _dispersion_at_pump_center(lambda_p1, lambda_p2, float(lam3[0]), D=D, S=S)
    res = sweeps.gain_spectrum(
        cfg=cfg, lambda_p1_m=lambda_p1, lambda_p2_m=lambda_p2,
        lambda_signal_m=lam3, gamma=gamma_km / 1000.0,
        alpha=alpha_db_per_km_to_1_m(alpha_db_per_km),
        p_in=np.asarray(p_in, dtype=float), phase_in=np.zeros(4),
        dispersion=disp, phase_matching_cfg=_PM_DEFAULT,
        length_unit="m", gain_unit="dB", mesh=mesh, verbose=verbose,
    )
    if save_dir is not None:
        save_sweep_npz(f"{save_dir}/gain_spectrum.npz", res,
                       metadata=make_run_metadata(config=cfg), overwrite=True)
    plotting.plot_gain_spectrum(
        res, show=show,
        save_path=None if save_dir is None else f"{save_dir}/gain_spectrum.png",
    )
    return res


def gain_spectrum_dbeta(
    *,
    lambda_p1: float = 1550e-9,
    lambda_p2: float = 1558e-9,
    lambda_signal_range: Tuple[float, float] = (1540e-9, 1565e-9),
    n_points: int = 30,
    z_max_m: float = 500.0,
    dz_m: float = 0.2,
    D: float = 0.1,
    S: float = 0.02,
    gamma_km: float = 11.5,
    alpha_db_per_km: float = 0.5,
    p_in=(0.1, 0.1, 1e-7, 1e-7),
    precision: str = "x64",
    integrator: str = "rk4",
    mesh=None,
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Combined gain + dbeta spectrum with the -gamma(P1+P2) overlay
    (defaults: reference ``main_gain_spectrum_dbeta``, main.py:206-280)."""
    cfg = custom_simulation_config(
        z_max=z_max_m, dz=dz_m, precision=precision, integrator=integrator
    )
    lam3 = np.linspace(*lambda_signal_range, n_points)
    _, _, disp = _dispersion_at_pump_center(lambda_p1, lambda_p2, float(lam3[0]), D=D, S=S)
    p0 = np.asarray(p_in, dtype=float)
    gamma_m = gamma_km / 1000.0
    res = sweeps.gain_and_dbeta_spectrum(
        cfg=cfg, lambda_p1_m=lambda_p1, lambda_p2_m=lambda_p2,
        lambda_signal_m=lam3, gamma=gamma_m,
        alpha=alpha_db_per_km_to_1_m(alpha_db_per_km),
        p_in=p0, phase_in=np.zeros(4), dispersion=disp,
        phase_matching_cfg=_PM_DEFAULT, length_unit="m", gain_unit="dB",
        mesh=mesh, verbose=verbose,
    )
    if save_dir is not None:
        save_sweep_npz(f"{save_dir}/gain_spectrum_dbeta.npz", res,
                       metadata=make_run_metadata(config=cfg), overwrite=True)
    plotting.plot_gain_and_dbeta(
        res, gamma=gamma_m, p_pump_total=float(p0[0] + p0[1]), length_unit="m",
        show=show,
        save_path=None if save_dir is None else f"{save_dir}/gain_spectrum_dbeta.png",
    )
    return res


def mismatch_scan(
    *,
    span: float = 40.0,
    n_points: int = 200,
    z_max_km: float = 0.5,
    dz_km: float = 1e-3,
    gamma_km: float = 10.0,
    p_pump: float = 0.1,
    p_signal: float = 1e-5,
    gain_mode: str = "end",
    precision: str = "x64",
    integrator: str = "rk4",
    mesh=None,
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Gain vs provided phase mismatch (the working realization of the
    reference's stale ``scan_mismatch_seeded_signal``, scan_mismtach.py:43-259:
    same physics defaults, batched)."""
    cfg = custom_simulation_config(
        z_max=z_max_km, dz=dz_km, precision=precision, integrator=integrator
    )
    db = np.linspace(-span, span, n_points)
    sig, idl = sweeps.mismatch_scan(
        cfg=cfg, gamma=gamma_km, alpha=0.0,
        p_in=[p_pump, p_pump, p_signal, 0.0],
        delta_beta_values=db, gain_mode=gain_mode, gain_unit="linear",
        length_unit="km", mesh=mesh, verbose=verbose,
    )
    all_failed = not np.any(np.isfinite(sig.gain))
    if all_failed:
        if verbose:
            print("mismatch_scan: every instance failed (all gains NaN)")
        return sig, idl

    b = sig.best_index
    if verbose:
        print(f"best delta_beta = {db[b]:.6g} 1/km, Gs = {sig.gain[b]:.6g}")
        lo, hi = max(0, b - 3), min(len(db), b + 4)
        for j in range(lo, hi):
            print(f"  delta={db[j]: .6g}  Gs={sig.gain[j]: .6g}  Gi={idl.gain[j]: .6g}")
    if save_dir is not None:
        save_sweep_npz(f"{save_dir}/mismatch_scan.npz", sig,
                       metadata=make_run_metadata(config=cfg), overwrite=True)
    plotting.plot_mismatch_scan(
        sig, idl, length_unit="km", show=show,
        save_path=None if save_dir is None else f"{save_dir}/mismatch_scan.png",
    )

    if show or save_dir is not None:
        # re-run the best point and plot its trajectories (reference
        # scan_mismtach.py:222-246 behavior); skipped for purely programmatic
        # use where neither display nor artifacts are requested
        from .constants import c as _c

        omega0 = 2 * np.pi * _c / 1.55e-6
        z_b, A_b = run_single_simulation(
            cfg, gamma=gamma_km, alpha=0.0, omega=np.full(4, omega0),
            p_in=[p_pump, p_pump, p_signal, 0.0],
            phase_matching_cfg=PhaseMatchingConfig(
                method=PhaseMatchingMethod.PROVIDED,
                provided_delta_beta=float(db[b]),
            ),
            length_unit="km", return_length_unit="km",
        )
        plotting.plot_signal_and_idler(
            z_b, A_b, title=f"Best delta = {db[b]:.3g} 1/km", z_unit="km",
            show=show,
            save_path=None if save_dir is None else f"{save_dir}/mismatch_best_si.png",
        )
        plotting.plot_powers(
            z_b, A_b, title=f"Powers at best delta = {db[b]:.3g} 1/km",
            z_unit="km", show=show,
            save_path=None if save_dir is None else f"{save_dir}/mismatch_best_powers.png",
        )
    return sig, idl


def psa_phase_sweep(
    *,
    n_points: int = 181,
    z_max_km: float = 0.2,
    dz_km: float = 1e-3,
    gamma_km: float = 10.0,
    p_pump: float = 0.1,
    p_signal: float = 1e-4,
    p_idler: float = 1e-4,
    delta_beta_km: float = 0.0,
    precision: str = "x64",
    integrator: str = "rk4",
    mesh=None,
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Phase-sensitive gain vs input signal phase (BASELINE config 3)."""
    cfg = custom_simulation_config(
        z_max=z_max_km, dz=dz_km, precision=precision, integrator=integrator
    )
    phases = np.linspace(0.0, 2 * np.pi, n_points)
    res = sweeps.psa_phase_sweep(
        cfg=cfg, gamma=gamma_km, alpha=0.0,
        p_in=[p_pump, p_pump, p_signal, p_idler],
        signal_phases=phases, delta_beta=delta_beta_km,
        gain_unit="dB", length_unit="km", mesh=mesh,
    )
    if verbose:
        print(
            f"PSA extinction: max {np.nanmax(res.gain):.2f} dB, "
            f"min {np.nanmin(res.gain):.2f} dB"
        )
    if save_dir is not None:
        save_sweep_npz(f"{save_dir}/psa_phase_sweep.npz", res,
                       metadata=make_run_metadata(config=cfg), overwrite=True)
    plotting.plot_phase_sweep(
        res, show=show,
        save_path=None if save_dir is None else f"{save_dir}/psa_phase_sweep.png",
    )
    return res


def gain_map(
    *,
    lambda_p1: float = 1550e-9,
    lambda_p2: float = 1558e-9,
    lambda_signal_range: Tuple[float, float] = (1540e-9, 1575e-9),
    n_wavelengths: int = 100,
    pump_powers=(0.05, 0.1, 0.2, 0.4),
    z_max_m: float = 500.0,
    dz_m: float = 0.2,
    D: float = 0.1,
    S: float = 0.02,
    gamma_km: float = 11.5,
    alpha_db_per_km: float = 0.5,
    precision: str = "x64",
    integrator: str = "rk4",
    mesh=None,
    show: bool = True,
    save_dir: Optional[str] = None,
):
    """2-D pump-power x wavelength gain map (BASELINE config 4)."""
    cfg = custom_simulation_config(
        z_max=z_max_m, dz=dz_m, precision=precision, integrator=integrator
    )
    lam3 = np.linspace(*lambda_signal_range, n_wavelengths)
    _, _, disp = _dispersion_at_pump_center(lambda_p1, lambda_p2, float(lam3[0]), D=D, S=S)
    x, pows, gm = sweeps.gain_map_power_wavelength(
        cfg=cfg, lambda_p1_m=lambda_p1, lambda_p2_m=lambda_p2,
        lambda_signal_m=lam3, pump_powers_W=list(pump_powers),
        gamma=gamma_km / 1000.0, alpha=alpha_db_per_km_to_1_m(alpha_db_per_km),
        dispersion=disp, phase_matching_cfg=_PM_DEFAULT, length_unit="m",
        gain_unit="dB", mesh=mesh,
    )
    plotting.plot_gain_map(
        x, pows, gm, show=show,
        save_path=None if save_dir is None else f"{save_dir}/gain_map.png",
    )
    return x, pows, gm


def comb(
    *,
    n_lines: int = 64,
    line_spacing_hz: float = 100e9,
    lambda_center: float = 1550e-9,
    pump_power: float = 0.5,
    noise_floor_W: float = 1e-12,
    z_max_m: float = 100.0,
    dz_m: float = 1e-3,
    D: float = 0.5,
    S: float = 0.02,
    gamma_km: float = 11.5,
    alpha_db_per_km: float = 0.5,
    integrator: str = "rk45",
    coupling: str = "fft",
    precision: str = "x64",
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Dual-pump cascaded FWM comb generation (BASELINE config 5): two pump
    lines seed a cascade over ``n_lines`` comb lines; adaptive RK45 by
    default."""
    import numpy as _np

    from .models import nwave as nw
    from .ops.frequency_plan import omega_from_lambda

    omega_c = float(_np.asarray(omega_from_lambda(lambda_center)))
    grid = nw.CombGrid.centered(omega_c, 2 * _np.pi * line_spacing_hz, n_lines)
    disp = dispersion_params_from_D_S(
        lambda_ref_m=lambda_center, D=D, S=S, dSdlmbd=0,
        D_units="ps/nm/km", S_units="ps/nm^2/km", dSdlmbd_units="ps/nm^3/km",
        omega_ref=omega_c,
    )
    coeffs = nw.make_comb_coeffs(
        grid, disp, gamma_W_m=gamma_km / 1000.0,
        alpha_1_m=alpha_db_per_km_to_1_m(alpha_db_per_km),
        precision=precision,
    )
    c = n_lines // 2
    A0 = nw.seed_comb(
        grid, pump_lines={c - 1: pump_power, c + 1: pump_power},
        noise_floor_W=noise_floor_W,
    )
    cfg = custom_simulation_config(
        z_max=z_max_m, dz=dz_m, save_every=max(1, int(round(z_max_m / dz_m)) // 50),
        integrator=integrator, precision=precision,
    )
    z, A = nw.run_comb_simulation(cfg, coeffs, A0, coupling=coupling)
    if verbose:
        P_end = _np.abs(A[-1]) ** 2
        n_above = int((P_end > 1e-9).sum())
        print(f"comb: {n_above}/{n_lines} lines above 1 nW after {z_max_m} m")
    if save_dir is not None:
        save_run_bundle(
            save_dir, "comb", z, A,
            metadata=make_run_metadata(config=cfg),
            overwrite=True,
        )
    plotting.plot_comb_spectrum(
        [A[0], A[-1]], label=["input", "output"], show=show,
        save_path=None if save_dir is None else f"{save_dir}/comb.png",
    )
    return z, A


def gnlse_pulse(
    *,
    t0_ps: float = 1.0,
    n_soliton: float = 3.0,
    beta2_ps2_km: float = -20.0,
    gamma_km: float = 2.0,
    alpha_db_per_km: float = 0.0,
    n_periods: float = 1.0,
    n_samples: int = 1024,
    n_steps: int = 4000,
    lambda_center: float = 1550e-9,
    raman: bool = False,
    steepening: bool = False,
    f_raman: Optional[float] = None,  # default: gnlse.RAMAN_FRACTION_SILICA
    integrator: str = "rk4",
    precision: str = "x64",
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """GNLSE pulse propagation (``models/gnlse``): an N-soliton sech pulse
    over ``n_periods`` soliton periods -- N=1 is shape-invariant, N>=2
    breathes (periodic temporal compression), the classic split-step demo.
    ``raman``/``steepening`` switch on the generalized nonlinearity
    (silica delayed Raman response; optical-shock term at the carrier)."""
    import numpy as _np

    from .models import gnlse as gnl
    from .ops.frequency_plan import omega_from_lambda

    t0 = t0_ps * 1e-12
    beta2 = beta2_ps2_km * 1e-24 / 1e3  # ps^2/km -> s^2/m
    gamma = gamma_km / 1e3
    omega_c = float(_np.asarray(omega_from_lambda(lambda_center)))
    disp = DispersionParams.from_betas(omega_c, beta2=beta2)
    grid = gnl.TimeGrid.for_pulse(t0, n_samples=n_samples)
    coeffs = gnl.make_gnlse_coeffs(
        grid, disp, gamma_W_m=gamma,
        alpha_1_m=alpha_db_per_km_to_1_m(alpha_db_per_km), precision=precision,
    )
    P0 = float(n_soliton) ** 2 * gnl.soliton_peak_power(beta2, gamma, t0)
    z_period = 0.5 * _np.pi * t0**2 / abs(beta2)
    z_max = float(n_periods) * z_period
    cfg = custom_simulation_config(
        z_max=z_max, dz=z_max / n_steps,
        save_every=max(1, n_steps // 100), precision=precision,
        integrator=integrator,
    )
    nl = None
    if raman or steepening:
        if f_raman is None:
            f_raman = gnl.RAMAN_FRACTION_SILICA
        nl = gnl.make_nl_terms(
            grid,
            f_raman=float(f_raman) if raman else 0.0,
            omega0=omega_c if steepening else None,
            precision=precision,
        )
    z, A = gnl.run_gnlse_simulation(cfg, coeffs,
                                    gnl.sech_pulse(grid, peak_W=P0, t0_s=t0), nl=nl)
    if verbose:
        Pk = (_np.abs(A) ** 2).max(axis=-1)
        tags = (" +raman" if raman else "") + (" +steepening" if steepening else "")
        print(
            f"gnlse{tags}: N={n_soliton} soliton, P0={P0:.3f} W, "
            f"period {z_period:.1f} m; "
            f"peak power {Pk[0]:.2f} -> max {Pk.max():.2f} -> {Pk[-1]:.2f} W"
        )
    if save_dir is not None:
        # no CSV: the per-wave summary table is 4-wave-specific; the envelope
        # trajectory goes to NPZ with full provenance metadata
        from pathlib import Path

        from .io_fwm import save_result_npz

        out = Path(save_dir)
        out.mkdir(parents=True, exist_ok=True)
        save_result_npz(
            out / "gnlse.npz", z, A,
            metadata=make_run_metadata(config=cfg),
            overwrite=True,
        )
    plotting.plot_pulse_evolution(
        z, grid.t(), A, show=show,
        title=f"N={n_soliton:g} soliton evolution",
        save_path=None if save_dir is None else f"{save_dir}/gnlse.png",
    )
    return z, A


def noise_figure(
    *,
    z_max_m: float = 200.0,
    dz_m: float = 0.05,
    gamma_km: float = 5.0,
    p_pump_W: float = 0.5,
    p_signal_W: float = 1e-6,
    n_samples: int = 8192,
    t_mode_s: float = 1e-9,
    phase_points: int = 17,
    spectrum_points: int = 0,
    seed: int = 0,
    mesh=None,
    precision: str = "x64",
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Quantum-limited noise figures by Wigner Monte Carlo
    (``parallel/noise.py``): the PIA noise figure against the exact
    2 - 1/G law, the joint-detection PSA noise figure at the max-gain
    phase (the 0 dB quantum limit), and the NF-vs-input-phase curve --
    ``n_samples`` independent nonlinear solves per point, one batched XLA
    program each (the measurement the reference's deterministic solver
    cannot make)."""
    import numpy as _np

    from .models.fwm4 import make_initial_amplitudes
    from .ops.rhs import RHSCoeffs
    from .parallel import noise as nz
    from .parallel.sweep import solve_batch

    omega = _np.asarray(plan_from_wavelengths(1550e-9, 1552e-9, 1551.0e-9))
    cfg = custom_simulation_config(z_max=z_max_m, dz=dz_m, save_every=50,
                                   precision=precision)
    gam = gamma_km / 1e3
    common = dict(gamma=gam, alpha=0.0, omega=omega, delta_beta=0.0,
                  t_mode_s=t_mode_s, n_samples=n_samples,
                  noisy_waves=(False, False, True, True), mesh=mesh)

    pia = nz.noise_figure_monte_carlo(
        cfg, p_in=[p_pump_W, p_pump_W, p_signal_W, 0.0],
        measure="signal", seed=seed, **common,
    )
    G = 10.0 ** (pia.gain_db / 10.0)
    pia_theory = 10.0 * _np.log10(2.0 - 1.0 / G)

    # max-gain phase from a mean-field scan, then the joint-detection PSA NF
    phases = _np.linspace(0.0, 2.0 * _np.pi, 65)
    A0 = _np.stack([
        _np.asarray(make_initial_amplitudes(
            [p_pump_W, p_pump_W, p_signal_W / 2, p_signal_W / 2],
            [0, 0, ph, 0]))
        for ph in phases
    ])
    co = RHSCoeffs(gamma=_np.full(65, gam), alpha=_np.zeros(65),
                   delta_beta=_np.zeros(65))
    mf = solve_batch(cfg, co, A0)
    ph_max = float(phases[_np.argmax(mf.P_end[:, 2] + mf.P_end[:, 3])])
    psa_r = nz.noise_figure_monte_carlo(
        cfg, p_in=[p_pump_W, p_pump_W, p_signal_W / 2, p_signal_W / 2],
        phase_in=[0, 0, ph_max, 0], measure="signal+idler",
        seed=seed + 1, **common,
    )
    if verbose:
        print(
            f"PIA:  gain {pia.gain_db:6.2f} dB  NF {pia.nf_db:6.3f} dB  "
            f"(theory 2-1/G: {pia_theory:.3f} dB)  [{pia.n_samples} samples]"
        )
        print(
            f"PSA:  gain {psa_r.gain_db:6.2f} dB  NF {psa_r.nf_db:6.3f} dB  "
            f"(quantum limit: 0 dB)  at phase {_np.rad2deg(ph_max):.1f} deg"
        )

    if save_dir is not None:
        from pathlib import Path

        Path(save_dir).mkdir(parents=True, exist_ok=True)
    curve = None
    if phase_points and phase_points > 0:
        ph_grid = _np.linspace(0.0, _np.pi, int(phase_points))
        nf_c, g_c = [], []
        for k, ph in enumerate(ph_grid):
            r = nz.noise_figure_monte_carlo(
                cfg, p_in=[p_pump_W, p_pump_W, p_signal_W / 2, p_signal_W / 2],
                phase_in=[0, 0, float(ph), 0], measure="signal+idler",
                seed=seed + 100 + k, **common,
            )
            nf_c.append(r.nf_db)
            g_c.append(r.gain_db)
        curve = (ph_grid, _np.asarray(nf_c), _np.asarray(g_c))
        if save_dir is not None:
            _np.savez(
                f"{save_dir}/noise_figure.npz",
                phase_rad=ph_grid, nf_db=curve[1], gain_db=curve[2],
                pia_nf_db=pia.nf_db, pia_gain_db=pia.gain_db,
                pia_nf_theory_db=pia_theory,
                psa_nf_db=psa_r.nf_db, psa_gain_db=psa_r.gain_db,
                n_samples=n_samples,
            )
        plotting.plot_noise_figure_sweep(
            ph_grid, curve[1], curve[2], pia_nf_db=pia_theory, show=show,
            save_path=None if save_dir is None else f"{save_dir}/noise_figure.png",
        )

    spec = None
    if spectrum_points and spectrum_points > 0:
        # NF(lambda) across a dispersion-shaped gain band (PIA measurement);
        # dispersion expanded at the pump-center frequency, the expansion
        # point the symmetric-even delta-beta formula assumes
        lam3 = _np.linspace(1545e-9, 1640e-9, int(spectrum_points))
        _, _, disp = _dispersion_at_pump_center(
            1550e-9, 1555e-9, float(lam3[0]), D=0.2, S=0.02
        )
        spec = nz.noise_figure_spectrum(
            cfg,
            lambda_p1_m=1550e-9, lambda_p2_m=1555e-9, lambda_signal_m=lam3,
            gamma=gam, alpha=0.0, p_in=[p_pump_W, p_pump_W, p_signal_W, 0.0],
            dispersion=disp, length_unit="m", t_mode_s=t_mode_s,
            n_samples=n_samples, measure="signal",
            seed=seed + 10_000_019,  # disjoint from the phase-curve seeds
            mesh=mesh,
        )
        G_l = 10.0 ** (spec.gain_db / 10.0)
        nf_t = 10.0 * _np.log10(2.0 - 1.0 / _np.maximum(G_l, 1.0 + 1e-12))
        if verbose:
            dev = _np.nanmax(_np.abs(spec.nf_db - nf_t))
            print(
                f"NF spectrum: {int(spectrum_points)} wavelengths, max "
                f"|NF - (2-1/G)| = {dev:.3f} dB"
            )
        if save_dir is not None:
            _np.savez(f"{save_dir}/noise_figure_spectrum.npz",
                      wavelength=spec.wavelength, nf_db=spec.nf_db,
                      gain_db=spec.gain_db, dbeta_1_m=spec.dbeta_1_m,
                      nf_theory_db=nf_t, n_samples=n_samples)
        plotting.plot_noise_figure_spectrum(
            spec.wavelength, spec.nf_db, spec.gain_db, nf_theory_db=nf_t,
            show=show,
            save_path=None if save_dir is None
            else f"{save_dir}/noise_figure_spectrum.png",
        )
    return pia, psa_r, curve, spec


def vector_pulse(
    *,
    t0_ps: float = 1.0,
    n_soliton: float = 1.0,
    theta_deg: float = 30.0,
    beta2_ps2_km: float = -20.0,
    gamma_km: float = 2.0,
    coupling: str = "manakov",    # 'manakov' | 'cnlse' | 'isotropic'
    dbeta1_ps_km: float = 0.0,
    n_periods: float = 1.0,
    n_samples: int = 1024,
    n_steps: int = 4000,
    integrator: str = "rk4",
    precision: str = "x64",
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Vector (two-polarization) pulse propagation (``models/vgnlse``): a
    sech pulse split at ``theta_deg`` onto the polarization axes under the
    Manakov (random-birefringence) or cnlse (linear-birefringence, b=2/3)
    coupling, optionally with group-velocity walk-off ``dbeta1_ps_km``.
    At N=1 under 'manakov' the vector soliton is shape-invariant at any
    angle (the integrable limit); under 'cnlse' the same split deforms."""
    import numpy as _np

    from .models import gnlse as gnl
    from .models import vgnlse as vgl

    t0 = t0_ps * 1e-12
    beta2 = beta2_ps2_km * 1e-24 / 1e3
    gamma = gamma_km / 1e3
    disp = DispersionParams.from_betas(1.2e15, beta2=beta2)
    grid = gnl.TimeGrid.for_pulse(t0, n_samples=n_samples)
    coeffs = vgl.make_vgnlse_coeffs(
        grid, disp, gamma_W_m=gamma, coupling=coupling,
        dbeta1_s_m=dbeta1_ps_km * 1e-12 / 1e3, precision=precision,
    )
    P0 = (float(n_soliton) ** 2
          * vgl.manakov_soliton_peak_power(beta2, gamma, t0))
    z_period = 0.5 * _np.pi * t0**2 / abs(beta2)
    z_max = float(n_periods) * z_period
    cfg = custom_simulation_config(
        z_max=z_max, dz=z_max / n_steps,
        save_every=max(1, n_steps // 100), precision=precision,
        integrator=integrator,
    )
    A0 = vgl.polarized_pulse(
        gnl.sech_pulse(grid, peak_W=P0, t0_s=t0), _np.deg2rad(theta_deg)
    )
    z, A = vgl.run_vgnlse_simulation(cfg, coeffs, A0)
    if verbose:
        dop = vgl.degree_of_polarization(grid, A[-1])
        Pk = (_np.abs(A) ** 2).sum(axis=1).max(axis=-1)
        print(
            f"vgnlse [{coupling}] theta={theta_deg:g} deg: N={n_soliton:g}, "
            f"P0={P0:.3f} W; total peak {Pk[0]:.2f} -> {Pk[-1]:.2f} W; "
            f"output DOP {dop:.4f}"
        )
    if save_dir is not None:
        from pathlib import Path

        from .io_fwm import save_result_npz

        out = Path(save_dir)
        out.mkdir(parents=True, exist_ok=True)
        save_result_npz(out / "vgnlse.npz", z, A.reshape(A.shape[0], -1),
                        metadata=make_run_metadata(config=cfg), overwrite=True)
    plotting.plot_pulse_evolution(
        z, grid.t(), _np.sqrt((_np.abs(A) ** 2).sum(axis=1)), show=show,
        title=f"Vector pulse ({coupling}, theta={theta_deg:g} deg): total power",
        save_path=None if save_dir is None else f"{save_dir}/vgnlse.png",
    )
    return z, A


# classic PCF supercontinuum parameters (Dudley, Genty & Coen, Rev. Mod.
# Phys. 78, 1135 (2006), Fig. 3): 835 nm pump, betas in ps^n/km
_SC_BETAS_PS_KM = {
    2: -11.830, 3: 8.1038e-2, 4: -9.5205e-5, 5: 2.0737e-7,
    6: -5.3943e-10, 7: 1.3486e-12,
}


def supercontinuum(
    *,
    t0_fs: float = 28.4,
    peak_kW: float = 10.0,
    lambda_pump: float = 835e-9,
    gamma_W_m: float = 0.11,
    length_m: float = 0.15,
    f_raman: Optional[float] = None,  # default: gnlse.RAMAN_FRACTION_SILICA
    n_samples: int = 8192,
    window_ps: float = 10.0,
    rtol: float = 1e-6,
    n_saved: int = 100,
    integrator: str = "rk45",
    precision: str = "x64",
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Supercontinuum generation by soliton fission in a photonic-crystal
    fiber: the classic GNLSE showcase (Dudley et al., RMP 2006, Fig. 3) --
    a femtosecond pump in the anomalous regime splits into fundamental
    solitons that red-shift by the Raman effect while shedding blue
    dispersive waves, spanning more than an octave in 15 cm.  Exercises
    every generalized-nonlinearity ingredient at once: dispersion orders
    2-7, delayed Raman response, self-steepening, adaptive stepping."""
    import numpy as _np

    from .models import gnlse as gnl
    from .ops.frequency_plan import omega_from_lambda

    t0 = float(t0_fs) * 1e-15
    omega_c = float(_np.asarray(omega_from_lambda(lambda_pump)))
    # ps^n/km -> s^n/m
    betas = {n: b * (1e-12 ** n) * 1e-3 for n, b in _SC_BETAS_PS_KM.items()}
    disp = DispersionParams.from_betas(omega_c, extra=betas)
    grid = gnl.TimeGrid(n_samples=int(n_samples),
                        t_window_s=float(window_ps) * 1e-12)
    coeffs = gnl.make_gnlse_coeffs(grid, disp, gamma_W_m=float(gamma_W_m),
                                   precision=precision)
    if f_raman is None:
        f_raman = gnl.RAMAN_FRACTION_SILICA
    nl = gnl.make_nl_terms(grid, f_raman=float(f_raman), omega0=omega_c,
                           precision=precision)
    P0 = float(peak_kW) * 1e3
    n_sol = _np.sqrt(
        float(gamma_W_m) * P0 * t0**2 / abs(betas[2])
    )
    n_steps = int(n_saved) * 100
    cfg = custom_simulation_config(
        z_max=float(length_m), dz=float(length_m) / n_steps,
        save_every=n_steps // int(n_saved), precision=precision,
        integrator=integrator, rtol=float(rtol), atol=1e-12,
    )
    z, A = gnl.run_gnlse_simulation(cfg, coeffs,
                                    gnl.sech_pulse(grid, peak_W=P0, t0_s=t0),
                                    nl=nl)
    if verbose:
        S0 = _np.abs(_np.fft.fft(A[0])) ** 2
        S1 = _np.abs(_np.fft.fft(A[-1])) ** 2

        def bw30(S):
            keep = S > S.max() * 1e-3
            om = _np.fft.fftshift(grid.omega())
            sh = _np.fft.fftshift(keep)
            idx = _np.nonzero(sh)[0]
            return (om[idx[-1]] - om[idx[0]]) / (2 * _np.pi) * 1e-12
        print(
            f"supercontinuum: N={n_sol:.1f} soliton input, "
            f"-30 dB bandwidth {bw30(S0):.1f} -> {bw30(S1):.1f} THz "
            f"over {length_m*100:.0f} cm"
        )
    if save_dir is not None:
        from pathlib import Path

        from .io_fwm import save_result_npz

        out = Path(save_dir)
        out.mkdir(parents=True, exist_ok=True)
        save_result_npz(out / "supercontinuum.npz", z, A,
                        metadata=make_run_metadata(config=cfg), overwrite=True)
    plotting.plot_spectral_evolution(
        z, grid.omega(), A, lambda0_m=lambda_pump,
        title="Supercontinuum generation (soliton fission)", show=show,
        save_path=None if save_dir is None else f"{save_dir}/supercontinuum.png",
    )
    plotting.plot_pulse_evolution(
        z, grid.t(), A, t_unit="ps", show=show,
        title="Supercontinuum temporal evolution",
        save_path=None if save_dir is None else f"{save_dir}/supercontinuum_t.png",
    )
    return z, A


def fwm_sbs(
    *,
    z_max_m: float = 200.0,
    dz_m: float = 0.02,
    gamma_km: float = 11.5,
    alpha_db_per_km: float = 0.5,
    g_B_km: float = 150.0,
    delta_beta: float = 0.0,
    p_in=(0.5, 0.5, 1e-5, 0.0),
    p_stokes_seed=(1e-6, 1e-6, 0.0, 0.0),
    n_iterations: int = 40,
    damping: float = 1.0,
    tol: float = 0.0,
    max_iterations=None,
    show: bool = True,
    save_dir: Optional[str] = None,
    verbose: bool = True,
):
    """Coupled FWM + SBS forward/backward solve (the A/B two-wave view the
    reference's plotting layer anticipates, plotting.py:552-613)."""
    from .models import sbs as sbs_model

    cfg = custom_simulation_config(z_max=z_max_m, dz=dz_m, save_every=50)
    res = sbs_model.run_sbs_simulation(
        cfg, gamma=gamma_km / 1000.0,
        alpha=alpha_db_per_km_to_1_m(alpha_db_per_km),
        g_B=g_B_km / 1000.0, delta_beta=delta_beta,
        p_in=list(p_in), p_stokes_seed=list(p_stokes_seed),
        length_unit="m", n_iterations=n_iterations, damping=damping,
        tol=tol, max_iterations=max_iterations,
    )
    if verbose:
        print(f"SBS relaxation: residual {res.residual:.2e} after {res.n_iterations} sweeps")
        print(f"Stokes reflectivity per wave: {np.round(res.reflectivity, 4)}")
    if save_dir is not None:
        save_run_bundle(save_dir, "fwm_sbs_forward", res.z, res.A,
                        metadata=make_run_metadata(config=cfg), overwrite=True)
        save_run_bundle(save_dir, "fwm_sbs_backward", res.z, res.B,
                        metadata=make_run_metadata(config=cfg), overwrite=True)
    sp = None if save_dir is None else f"{save_dir}/fwm_sbs_totals.png"
    plotting.plot_total_powers_AB(res.z, res.A, res.B, scale="log", show=show,
                                  save_path=sp)
    plotting.plot_fwm_sbs_powers_forward(
        res.z, res.A, scale="dbW", z_unit="m", show=show,
        save_path=None if save_dir is None else f"{save_dir}/fwm_sbs_fwd.png")
    plotting.plot_fwm_sbs_powers_backward(
        res.z, res.B, scale="dbW", z_unit="m", show=show,
        save_path=None if save_dir is None else f"{save_dir}/fwm_sbs_bwd.png")
    return res
