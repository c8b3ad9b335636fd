"""Diagnose the large-batch (steady-state) df32 lane — VERDICT r4 weak #1.

The round-4 driver capture recorded the 250k-point df32 sweep at 36,140
points/s while the 10^4-point headline in the SAME capture implied a
>=~80k pts/s compute rate.  This script decomposes the lane into

    host-prep  (numpy lowering: pad/two-float split/plane packing)
    H2D        (jnp.asarray of coef+y0 through the tunnel)
    device     (the fused grouped df32 pallas kernel, block_until_ready)
    D2H        (np.asarray of the single stacked output)

across batch sizes, times the full public `gain_spectrum` path alongside,
and records the framework's first jax.profiler trace of the device call.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_steady_state.py
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/psa_tpu_jax_cache")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from psa_simulation_ode_rk_mvp_dispersion_tpu.utils.precision import (
        enable_compile_cache,
    )

    enable_compile_cache()

    import psa_tpu as psa
    from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel import sweep as sw
    from psa_simulation_ode_rk_mvp_dispersion_tpu.ops import pallas_df32 as pk
    from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.lane_groups import (
        grouped_pad_target,
        pad_rows,
        plane_state,
        rows_scalar,
    )

    backend = jax.default_backend()
    print(f"# backend={backend}", file=sys.stderr)

    # --- the bench's physics (bench.py main_gain_spectrum configuration) ---
    lam_p1, lam_p2 = 1550e-9, 1555e-9
    gamma_v = 11.5 / 1000.0
    alpha_v = (np.log(10.0) / 10.0) * 0.5 / 1000.0
    p_in = np.array([0.5, 0.5, 1e-7, 1e-7])
    n_steps, save_every, dz_m = 2500, 10, 0.2

    omega_ref = np.asarray(
        psa.plan_from_wavelengths(lam_p1, lam_p2, 1540e-9)
    )
    sp = psa.infer_symmetry_from_omegas(*omega_ref)
    disp = psa.dispersion_params_from_D_S(
        lambda_ref_m=float(psa.lambda_from_omega(sp.omega_c)),
        D=0.2, S=0.02, dSdlmbd=0,
        D_units="ps/nm/km", S_units="ps/nm^2/km", dSdlmbd_units="ps/nm^3/km",
        omega_ref=float(np.asarray(sp.omega_c)),
    )
    pm = psa.PhaseMatchingConfig(
        method=psa.PhaseMatchingMethod.SYMMETRIC_EVEN,
        even_orders=(2, 4), max_order=4,
    )
    common = dict(
        lambda_p1_m=lam_p1, lambda_p2_m=lam_p2,
        gamma=gamma_v, alpha=alpha_v,
        p_in=p_in, phase_in=np.zeros(4),
        dispersion=disp, phase_matching_cfg=pm,
        length_unit="m", gain_unit="dB", frame="rotating",
    )

    g, block = pk.GROUP, pk.BLOCK_GROUPED
    G = 4 * g
    solver = pk._pallas_df32_solver_grouped(n_steps, save_every, False, block, g)

    def prep(B: int):
        """Replicate _solve_grouped's host prep, timed."""
        A0 = np.sqrt(p_in)[None, :] * np.ones((B, 1))
        A0 = A0.astype(np.complex128)
        ga = np.full(B, gamma_v)
        al = np.full(B, alpha_v)
        db = np.linspace(-2e-3, 2e-3, B)

        t0 = time.perf_counter()
        Bp = grouped_pad_target(B, g=g, block=block, ndev=1)
        pad = Bp - B
        A0p = pad_rows(A0, pad)
        gap, alp, dbp = (pad_rows(x, pad) for x in (ga, al, db))
        Bl = Bp // g
        det_inst = np.stack(
            [-0.5 * dbp, -0.5 * dbp, np.zeros(Bp), np.zeros(Bp)], axis=-1
        )
        coef = np.zeros((8 * G + 6, Bl), dtype=np.float32)
        for k, rows in enumerate(
            (rows_scalar(gap, g), rows_scalar(2.0 * gap, g),
             rows_scalar(-0.5 * alp, g), plane_state(det_inst, g))
        ):
            hi, lo = pk._split_rows_f64(rows)
            coef[2 * k * G:(2 * k + 1) * G] = hi
            coef[(2 * k + 1) * G:(2 * k + 2) * G] = lo
        base = 8 * G
        for k, cst in enumerate([0.5 * dz_m, float(dz_m), dz_m / 6.0]):
            hi = np.float32(cst)
            coef[base + 2 * k] = hi
            coef[base + 2 * k + 1] = np.float32(np.float64(cst) - np.float64(hi))
        re_hi, re_lo = pk._split_rows_f64(plane_state(A0p.real, g))
        im_hi, im_lo = pk._split_rows_f64(plane_state(A0p.imag, g))
        y0 = np.concatenate([re_hi, re_lo, im_hi, im_lo], axis=0)
        t_prep = time.perf_counter() - t0
        return coef, y0, t_prep

    results = []
    trace_done = False
    for B in (10_240, 51_200, 102_400, 250_000):
        rec = {"B": B}
        coef, y0, t_prep = prep(B)
        rec["t_prep_s"] = round(t_prep, 4)
        rec["coef_mb"] = round(coef.nbytes / 2**20, 1)
        rec["y0_mb"] = round(y0.nbytes / 2**20, 1)

        # H2D
        t0 = time.perf_counter()
        coef_dev = jax.block_until_ready(jnp.asarray(coef))
        y0_dev = jax.block_until_ready(jnp.asarray(y0))
        rec["t_h2d_s"] = round(time.perf_counter() - t0, 4)

        # device compute (compile excluded via warm call)
        with jax.enable_x64(False):
            t0 = time.perf_counter()
            out = jax.block_until_ready(solver(coef_dev, y0_dev))
            rec["t_warm_s"] = round(time.perf_counter() - t0, 4)
            devs = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = jax.block_until_ready(solver(coef_dev, y0_dev))
                devs.append(time.perf_counter() - t0)
        rec["t_dev_s"] = [round(t, 4) for t in devs]
        t_dev = float(np.median(devs))
        rec["dev_points_per_s"] = round(B / t_dev, 1)

        # D2H
        t0 = time.perf_counter()
        host_out = np.asarray(out)
        rec["t_d2h_s"] = round(time.perf_counter() - t0, 4)
        rec["out_mb"] = round(host_out.nbytes / 2**20, 1)

        # profiler trace at the biggest B (first recorded use)
        if B == 250_000 and not trace_done:
            trace_dir = "/tmp/psa_trace_steady"
            try:
                jax.profiler.start_trace(trace_dir)
                with jax.enable_x64(False):
                    jax.block_until_ready(solver(coef_dev, y0_dev))
                jax.profiler.stop_trace()
                rec["trace_dir"] = trace_dir
                trace_done = True
            except Exception as e:  # noqa: BLE001
                rec["trace_error"] = str(e)[:200]

        # full public path (gain_spectrum), warm + 2 reps
        lam3 = np.linspace(1540e-9, 1650e-9, B)
        cfg = psa.custom_simulation_config(
            z_max=500.0, dz=0.2, save_every=10, precision="df32",
        )
        kw = {**common, "cfg": cfg}
        _ = sw.gain_spectrum(lambda_signal_m=lam3, **kw)
        fulls = []
        for _ in range(2):
            t0 = time.perf_counter()
            _ = sw.gain_spectrum(lambda_signal_m=lam3, **kw)
            fulls.append(time.perf_counter() - t0)
        rec["t_full_s"] = [round(t, 4) for t in fulls]
        rec["full_points_per_s"] = round(B / float(np.median(fulls)), 1)

        results.append(rec)
        print(json.dumps(rec), flush=True)

    # linear fit of device time vs B: t = a + b*B
    Bs = np.array([r["B"] for r in results], float)
    ts = np.array([float(np.median(r["t_dev_s"])) for r in results])
    bfit, afit = np.polyfit(Bs, ts, 1)
    print(json.dumps({
        "fit_dev": {"fixed_ms": round(afit * 1e3, 1),
                    "us_per_point": round(bfit * 1e6, 3)},
    }), flush=True)


if __name__ == "__main__":
    main()
