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


def gen_sbs_bvp() -> None:
    """Independent oracle for the FWM+SBS two-point BVP (models/sbs.py):
    scipy.integrate.solve_bvp on the fully-coupled, pump-depleted system
    (54% pump-1 depletion, 63% Stokes reflectivity), with the FWM part
    EXECUTED from the reference (yaman_model.py:10).

    System (16 real components = 4 forward + 4 backward complex waves):
        dA/dz = rhs_yaman_simplified(z, A) - (gB/2) |B|^2 A
        dB/dz = +(alpha/2) B - (gB/2) |A|^2 B
    BCs: A(0) = sqrt(p_in), B(L) = sqrt(p_stokes_seed).
    Continuation in g_B then in tol keeps the collocation Jacobian
    well-conditioned down to tol=1e-10.
    """
    from types import SimpleNamespace

    from scipy.integrate import solve_bvp

    import yaman_model as rym

    gamma, alpha, g_B, delta_beta = 0.5, 0.01, 3.0, 0.5
    L = 2.0
    p_in = np.array([0.5, 0.4, 1e-3, 0.0])
    p_stokes = np.array([0.05, 0.02, 0.0, 0.0])

    params = SimpleNamespace(
        fiber=SimpleNamespace(gamma_W_m=gamma, alpha_1_m=alpha),
        cache=SimpleNamespace(delta_beta_1_m=delta_beta),
    )

    def make_fun(gB):
        def fun(x, y):
            out = np.empty_like(y)
            for k in range(x.size):
                A = y[0:4, k] + 1j * y[4:8, k]
                B = y[8:12, k] + 1j * y[12:16, k]
                dA = rym.rhs_yaman_simplified(float(x[k]), A, params)
                dA = dA - 0.5 * gB * (np.abs(B) ** 2) * A
                dB = 0.5 * alpha * B - 0.5 * gB * (np.abs(A) ** 2) * B
                out[0:4, k] = dA.real
                out[4:8, k] = dA.imag
                out[8:12, k] = dB.real
                out[12:16, k] = dB.imag
            return out
        return fun

    A0 = np.sqrt(p_in)
    BL = np.sqrt(p_stokes)

    def bc(ya, yb):
        return np.concatenate([
            ya[0:4] - A0, ya[4:8],      # A(0) = sqrt(p_in), real
            yb[8:12] - BL, yb[12:16],   # B(L) = sqrt(p_stokes), real
        ])

    x = np.linspace(0.0, L, 201)
    y0 = np.zeros((16, x.size))
    y0[0:4] = A0[:, None]
    y0[8:12] = BL[:, None]

    sol = None
    for gB in (0.0, 1.0, 2.0, g_B):
        sol = solve_bvp(make_fun(gB), bc, x, y0, tol=1e-6, max_nodes=400_000)
        assert sol.success, f"gB={gB}: {sol.message}"
        x, y0 = sol.x, sol.y
    for tol in (1e-8, 1e-10):
        sol = solve_bvp(make_fun(g_B), bc, x, y0, tol=tol, max_nodes=400_000)
        assert sol.success, f"tol={tol}: {sol.message}"
        x, y0 = sol.x, sol.y

    # evaluate on the framework's save grid (dz=0.002, save_every=50)
    z_save = np.arange(0.0, L + 1e-12, 0.1)
    Y = sol.sol(z_save)
    A = (Y[0:4] + 1j * Y[4:8]).T     # (S, 4)
    B = (Y[8:12] + 1j * Y[12:16]).T
    np.savez_compressed(
        OUT / "golden_sbs_bvp.npz",
        z=z_save, A_re=A.real, A_im=A.imag, B_re=B.real, B_im=B.imag,
        gamma=gamma, alpha=alpha, g_B=g_B, delta_beta=delta_beta, L=L,
        p_in=p_in, p_stokes=p_stokes,
        bvp_rms_residual=float(np.max(sol.rms_residuals)),
    )
    print("golden_sbs_bvp.npz written; max rms residual",
          float(np.max(sol.rms_residuals)))


if __name__ == "__main__":
    main()
    gen_sbs_bvp()
