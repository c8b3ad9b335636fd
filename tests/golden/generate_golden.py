"""Generate golden regression data by EXECUTING the reference implementation.

The reference NumPy simulator (mounted read-only at /root/reference) is run
through its public API; its numerical outputs are recorded here as data files
so the test suite can validate this framework's <=1e-9 parity target without
needing the reference on sys.path at test time.

Run manually (requires /root/reference):
    python tests/golden/generate_golden.py

Outputs (committed):
    golden_scalars.json  -- dispersion coefficients, delta_beta values, plans
    golden_zero_signal.npz, golden_seeded.npz, golden_anchor.npz -- trajectories
    golden_spectrum.npz  -- 16-point gain+dbeta spectrum sweep
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REF = "/root/reference"
OUT = Path(__file__).parent

sys.path.insert(0, REF)

import dispersion as rdisp  # noqa: E402
import frequency_plan as rfp  # noqa: E402
import phase_matching as rpm  # noqa: E402
import simulation as rsim  # noqa: E402
from config import custom_simulation_config  # noqa: E402


def main() -> None:
    scalars = {}

    # ---- frequency plan -------------------------------------------------
    om = rfp.plan_from_wavelengths(1550e-9, 1560e-9, 1555e-9)
    scalars["plan_1550_1560_1555_omegas"] = om.tolist()
    sp = rfp.infer_symmetry_from_omegas(
        omega1=om[0], omega2=om[1], omega3=om[2], omega4=om[3]
    )
    scalars["plan_symmetric"] = {
        "omega_c": sp.omega_c, "omega_d": sp.omega_d, "Omega": sp.Omega,
    }
    scalars["lambda_c"] = rfp.lambda_from_omega(sp.omega_c)

    # ---- dispersion builders -------------------------------------------
    lc = scalars["lambda_c"]
    cases = []
    for (D, S, dS) in [(0.02, 0.02, 0.0), (0.1, 0.02, 0.0), (0.2, 0.06, 0.5), (-1.5, 0.058, 0.0)]:
        d = rdisp.dispersion_params_from_D_S(
            lambda_ref_m=lc, D=D, S=S, dSdlmbd=dS,
            D_units="ps/nm/km", S_units="ps/nm^2/km", dSdlmbd_units="ps/nm^3/km",
            omega_ref=sp.omega_c,
        )
        cases.append({
            "D": D, "S": S, "dSdlmbd": dS,
            "beta2": d.beta2, "beta3": d.beta3, "beta4": d.beta4,
        })
    scalars["dispersion_from_D_S"] = cases

    # correct-formula witnesses for beta builders (direct function calls)
    scalars["beta2_from_D"] = rdisp.beta2_from_D(lc, 2e-8)
    scalars["beta3_from_D_S"] = rdisp.beta3_from_D_S(lc, 2e-8, 20.0)
    scalars["beta4_from_D_S"] = rdisp.beta4_from_D_S(lc, 2e-8, 20.0, 5e11)

    # ---- beta_taylor / delta_beta --------------------------------------
    d0 = rdisp.dispersion_params_from_D_S(
        lambda_ref_m=lc, D=0.1, S=0.02, dSdlmbd=0,
        D_units="ps/nm/km", S_units="ps/nm^2/km", dSdlmbd_units="ps/nm^3/km",
        omega_ref=sp.omega_c,
    )
    omegas_test = np.linspace(0.98, 1.02, 7) * sp.omega_c
    scalars["beta_taylor_omegas"] = omegas_test.tolist()
    scalars["beta_taylor_values"] = [
        rdisp.beta_taylor(w, d0, max_order=4) for w in omegas_test
    ]
    scalars["delta_beta_from_omegas"] = rdisp.delta_beta_from_omegas(om, d0, max_order=4)
    scalars["delta_beta_symmetric_24"] = rdisp.delta_beta_symmetric(
        omega_c=sp.omega_c, omega_d=sp.omega_d, Omega=sp.Omega, disp=d0,
        even_orders=(2, 4),
    )
    res = rpm.compute_phase_mismatch(
        omegas=om, disp=d0,
        cfg=rpm.PhaseMatchingConfig(method=rpm.PhaseMatchingMethod.GENERAL_TAYLOR, max_order=4),
    )
    scalars["pm_general_taylor"] = res.delta_beta

    with open(OUT / "golden_scalars.json", "w") as f:
        json.dump(scalars, f, indent=1)

    # ---- trajectories ---------------------------------------------------
    z, A = rsim.example_zero_signal()
    np.savez_compressed(OUT / "golden_zero_signal.npz", z=z, A=A)

    z, A = rsim.custom_seeded_signal()
    np.savez_compressed(OUT / "golden_seeded.npz", z=z, A=A)

    # anchor: the main_single_simulation configuration (main.py:27-96)
    cfg = custom_simulation_config(z_max=1000.0, dz=0.1)
    gamma_m = 11.5 / 1000.0
    alpha_m = (np.log(10.0) / 10.0) * 0.9 / 1000.0
    disp_a = rdisp.dispersion_params_from_D_S(
        lambda_ref_m=lc, D=0.02, S=0.02, dSdlmbd=0,
        D_units="ps/nm/km", S_units="ps/nm^2/km", dSdlmbd_units="ps/nm^3/km",
        omega_ref=sp.omega_c,
    )
    pm_cfg = rpm.PhaseMatchingConfig(
        method=rpm.PhaseMatchingMethod.SYMMETRIC_EVEN, even_orders=(2, 4), max_order=4
    )
    p_in = np.array([0.5, 0.5, 1e-5, 1e-5])
    z, A = rsim.run_single_simulation(
        cfg, gamma=gamma_m, alpha=alpha_m, omega=om, p_in=p_in,
        phase_in=np.zeros(4), dispersion=disp_a, phase_matching_cfg=pm_cfg,
        length_unit="m", return_length_unit="m",
    )
    np.savez_compressed(
        OUT / "golden_anchor.npz", z=z, A=A, p_in=p_in,
        gain_db=10 * np.log10(np.abs(A[-1, 2]) ** 2 / p_in[2]),
    )

    # ---- small gain+dbeta spectrum (main_gain_spectrum_dbeta shape) -----
    lam1, lam2 = 1550e-9, 1558e-9
    lam3 = np.linspace(1540e-9, 1565e-9, 16)
    cfg = custom_simulation_config(z_max=500.0, dz=0.2)
    disp_s = rdisp.dispersion_params_from_D_S(
        lambda_ref_m=lc, D=0.1, S=0.02, dSdlmbd=0,
        D_units="ps/nm/km", S_units="ps/nm^2/km", dSdlmbd_units="ps/nm^3/km",
        omega_ref=sp.omega_c,
    )
    alpha_s = (np.log(10.0) / 10.0) * 0.5 / 1000.0
    p_in_s = np.array([0.1, 0.1, 1e-7, 1e-7])
    gain = np.full(lam3.shape, np.nan)
    dbeta = np.full(lam3.shape, np.nan)
    for i, l3 in enumerate(lam3):
        try:
            om_i = rfp.plan_from_wavelengths(lam1, lam2, float(l3), lambda4_m=None)
            dbeta[i] = rpm.compute_phase_mismatch(
                omegas=om_i, disp=disp_s, cfg=pm_cfg
            ).delta_beta
            zi, Ai = rsim.run_single_simulation(
                cfg, gamma=gamma_m, alpha=alpha_s, omega=om_i, p_in=p_in_s,
                phase_in=np.zeros(4), dispersion=disp_s, phase_matching_cfg=pm_cfg,
                length_unit="m", return_length_unit="m",
            )
            P3 = np.abs(Ai[:, 2]) ** 2
            if np.all(np.isfinite(P3)):
                g = float(np.max(P3) / p_in_s[2])
                if np.isfinite(g) and g > 0:
                    gain[i] = 10 * np.log10(g)
        except Exception:
            pass
    np.savez_compressed(
        OUT / "golden_spectrum.npz",
        lam1=lam1, lam2=lam2, lam3=lam3, gain_db=gain, dbeta=dbeta,
        p_in=p_in_s, gamma=gamma_m, alpha=alpha_s,
        D=0.1, S=0.02, lambda_c=lc, omega_c=sp.omega_c,
    )

    # ---- the BENCH configuration (main_gain_spectrum, main.py:119-203) ----
    lam1b, lam2b = 1550e-9, 1555e-9
    lam3b = np.linspace(1540e-9, 1650e-9, 16)
    om_b = rfp.plan_from_wavelengths(lam1b, lam2b, float(lam3b[0]), lambda4_m=None)
    sp_b = rfp.infer_symmetry_from_omegas(
        omega1=om_b[0], omega2=om_b[1], omega3=om_b[2], omega4=om_b[3]
    )
    lc_b = rfp.lambda_from_omega(sp_b.omega_c)
    disp_b = rdisp.dispersion_params_from_D_S(
        lambda_ref_m=lc_b, D=0.2, S=0.02, dSdlmbd=0,
        D_units="ps/nm/km", S_units="ps/nm^2/km", dSdlmbd_units="ps/nm^3/km",
        omega_ref=sp_b.omega_c,
    )
    alpha_b = (np.log(10.0) / 10.0) * 0.5 / 1000.0
    p_in_b = np.array([0.5, 0.5, 1e-7, 1e-7])
    gain_b = np.full(lam3b.shape, np.nan)
    for i, l3 in enumerate(lam3b):
        try:
            om_i = rfp.plan_from_wavelengths(lam1b, lam2b, float(l3), lambda4_m=None)
            zi, Ai = rsim.run_single_simulation(
                cfg, gamma=gamma_m, alpha=alpha_b, omega=om_i, p_in=p_in_b,
                phase_in=np.zeros(4), dispersion=disp_b, phase_matching_cfg=pm_cfg,
                length_unit="m", return_length_unit="m",
            )
            P3 = np.abs(Ai[:, 2]) ** 2
            if np.all(np.isfinite(P3)):
                g = float(np.max(P3) / p_in_b[2])
                if np.isfinite(g) and g > 0:
                    gain_b[i] = 10 * np.log10(g)
        except Exception:
            pass
    np.savez_compressed(
        OUT / "golden_bench_config.npz",
        lam1=lam1b, lam2=lam2b, lam3=lam3b, gain_db=gain_b,
        p_in=p_in_b, gamma=gamma_m, alpha=alpha_b,
        D=0.2, S=0.02, lambda_c=lc_b, omega_c=sp_b.omega_c,
    )
    print("golden data written to", OUT)


if __name__ == "__main__":
    main()
