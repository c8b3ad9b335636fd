"""On-chip A/B: fused adaptive SSFM kernel vs the scan adaptive engines
(VERDICT r4 #4).  Measures the bench_lle rk45 lane shape and the
bench_gnlse rk45 lane shape, kernel vs scan, same session, plus accuracy
vs an x64 CPU-computed truth shipped in via npz (optional).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_ssfm_adaptive.py
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

    from psa_simulation_ode_rk_mvp_dispersion_tpu.utils.precision import (
        enable_compile_cache,
    )

    enable_compile_cache()
    import psa_tpu as psa
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import lle

    print(f"# backend={jax.default_backend()}", file=sys.stderr)

    # --- LLE lane (bench_lle rk45 shape: T=256, B=512, 2000 steps eq) ---
    T = 256
    grid = lle.TimeGrid(n_samples=T, t_window_s=20.0)
    B45 = 512
    detunings = np.linspace(3.5, 4.5, B45)
    co = lle.make_lle_coeffs(grid, detuning=detunings, pump=2.2, d2=-1.0,
                             precision="x32")
    psi0 = np.stack([lle.soliton_ansatz(grid, d, 2.2, -1.0)
                     for d in detunings])
    cfg = psa.custom_simulation_config(
        z_max=20.0, dz=0.01, save_every=200, precision="x32",
        integrator="rk45", rtol=1e-5, atol=1e-8,
    )
    for engine in ("scan", "pallas"):
        try:
            t0 = time.perf_counter()
            pk, yl, ok = lle.solve_lle_batch(cfg, co, psi0, engine=engine)
            warm = time.perf_counter() - t0
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                pk, yl, ok = lle.solve_lle_batch(cfg, co, psi0,
                                                 engine=engine)
                ts.append(time.perf_counter() - t0)
            el = float(np.median(ts))
            print(json.dumps({
                "lane": "lle_rk45", "engine": engine,
                "warm_s": round(warm, 1),
                "cavities_per_s": round(B45 / el, 1),
                "ok_frac": float(np.mean(ok)),
                "mean_peak": float(np.mean(pk)),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"lane": "lle_rk45", "engine": engine,
                              "error": str(e)[:400]}), flush=True)

    # --- GNLSE lane (bench_gnlse rk45 shape: T=1024, B=512) -------------
    Tg = 1024
    gridg = gn.TimeGrid.for_pulse(1e-12, n_samples=Tg)
    disp = psa.DispersionParams.from_betas(2 * np.pi * 193.1e12,
                                           beta2=-2.0e-26, beta3=1e-40)
    cog = gn.make_gnlse_coeffs(gridg, disp, gamma_W_m=1.3e-3,
                               alpha_1_m=5e-5, precision="x32")
    Bg = 512
    peaks = np.linspace(30.0, 90.0, Bg)
    A0 = np.stack([np.asarray(gn.sech_pulse(gridg, peak_W=p, t0_s=1e-12))
                   for p in peaks])
    cfgg = psa.custom_simulation_config(
        z_max=20.0, dz=0.02, save_every=100, precision="x32",
        integrator="rk45", rtol=1e-5, atol=1e-9,
    )
    for engine in ("scan", "pallas"):
        try:
            t0 = time.perf_counter()
            pk, yl, ok = gn.solve_gnlse_batch(cfgg, cog, A0, engine=engine)
            warm = time.perf_counter() - t0
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                pk, yl, ok = gn.solve_gnlse_batch(cfgg, cog, A0,
                                                  engine=engine)
                ts.append(time.perf_counter() - t0)
            el = float(np.median(ts))
            print(json.dumps({
                "lane": "gnlse_rk45", "engine": engine,
                "warm_s": round(warm, 1),
                "envelopes_per_s": round(Bg / el, 1),
                "ok_frac": float(np.mean(ok)),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"lane": "gnlse_rk45", "engine": engine,
                              "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
