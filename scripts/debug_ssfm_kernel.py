"""Ablation driver for the adaptive SSFM kernel's TPU fault (round 5).

Each variant runs in a SUBPROCESS (axon faults poison the process).
Usage:
  driver:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_ssfm_kernel.py
  one:     ... debug_ssfm_kernel.py one <name>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/psa_tpu_jax_cache")

import numpy as np

VARIANTS = {
    # name: (family, B, T, n_steps, save_every, max_steps, block)
    # blk=256 is a measured Mosaic compile limit (SIGABRT, "limits[i] <=
    # dim(i) (2 vs. 1)") -- _auto_block caps at 128 since round 5.
    "lle_tiny_b128": ("lle", 128, 256, 4, 2, 50, 128),
    "gnlse_tiny": ("gnlse", 128, 256, 4, 2, 50, 128),
    "lle_mid": ("lle", 128, 256, 200, 100, 10000, 128),
    "lle_bench_blk128": ("lle", 512, 256, 2000, 200, 100000, 128),
    "gnlse_bench_blk128": ("gnlse", 512, 1024, 200, 100, 100000, 128),
}


def run_one(name: str) -> None:
    family, B, T, n_steps, save_every, max_steps, block = VARIANTS[name]
    import jax

    from psa_simulation_ode_rk_mvp_dispersion_tpu.utils.precision import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import lle
    from psa_simulation_ode_rk_mvp_dispersion_tpu.ops import (
        pallas_ssfm_adaptive as pa,
    )

    grid = lle.TimeGrid(n_samples=T, t_window_s=20.0)
    t0 = time.perf_counter()
    if family == "lle":
        dets = np.linspace(3.8, 4.2, B)
        psi0 = np.stack([lle.soliton_ansatz(grid, d, 2.0, -1.0)
                         for d in dets])
        co = lle.make_lle_coeffs(grid, detuning=dets, pump=2.0, d2=-1.0)
        r = pa.solve_lle_batch_rk45_pallas(
            psi0, dets, np.broadcast_to(np.asarray(co.pump_re, float), (B,)),
            np.broadcast_to(np.asarray(co.pump_im, float), (B,)),
            np.asarray(co.lin_phase, float),
            dt=0.01, n_steps=n_steps, save_every=save_every,
            rtol=1e-5, atol=1e-8, max_steps=max_steps, block=block)
    else:
        import psa_tpu as psa

        disp = psa.DispersionParams.from_betas(2 * np.pi * 193.1e12,
                                               beta2=-2e-26)
        gg = gn.TimeGrid.for_pulse(1e-12, n_samples=T)
        co = gn.make_gnlse_coeffs(gg, disp, gamma_W_m=1.3e-3,
                                  alpha_1_m=5e-5)
        A0 = np.stack([np.asarray(gn.sech_pulse(gg, peak_W=50.0,
                                                t0_s=1e-12))] * B)
        r = pa.solve_gnlse_batch_rk45_pallas(
            A0, 1.3e-3, 5e-5, np.asarray(co.lin_phase, float),
            dz_m=0.02, n_steps=n_steps, save_every=save_every,
            rtol=1e-5, atol=1e-8, max_steps=max_steps, block=block)
    el = time.perf_counter() - t0
    print(json.dumps({
        "variant": name, "status": "ok", "elapsed_s": round(el, 1),
        "ok_frac": float(np.mean(r.ok)),
        "na_mean": float(np.mean(r.n_accepted)),
    }), flush=True)


def main() -> None:
    for name in VARIANTS:
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, __file__, "one", name],
            capture_output=True, text=True, timeout=900,
        )
        el = time.perf_counter() - t0
        if p.returncode == 0 and '"status": "ok"' in p.stdout:
            print(p.stdout.strip().splitlines()[-1], flush=True)
        else:
            tail = (p.stderr or p.stdout).strip().splitlines()[-6:]
            print(json.dumps({
                "variant": name, "status": "FAIL", "elapsed_s": round(el, 1),
                "tail": tail,
            }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(sys.argv[2])
    else:
        main()
