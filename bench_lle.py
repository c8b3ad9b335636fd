"""LLE benchmark: batched Kerr-cavity soliton propagation + detuning scans.

Round 3's flagship family (``models/lle.py``) gets the same measurement
rigor as the comb (``bench_comb.py``): B independent normalized LLE
cavities integrate in one XLA program with the Strang split (exact affine
linear+drive substep, exact Kerr rotation).  Engines measured:

- ``scan``   : XLA fori/scan SSFM (any integrator/precision),
- ``pallas`` : fused single-launch VMEM-resident kernel
  (``ops/pallas_lle.py``, polyphase MXU DFTs, x32),
- ``df32``   : matched-tolerance two-float engine (``ops/df32_lle.py``),
- ``rk45``   : adaptive step-doubling lane,
- ``detuning_scan``: the user-facing soliton-existence-range scan
  (points/s, the LLE analog of the 4-wave gain spectrum).

Physics: bright-soliton propagation at Delta in [3.6, 4.4], F = 2,
d2 = -1 (Herr et al. soliton-existence range; the ansatz converges to the
stationary soliton, so ok must stay 1.0 and the final peak matches the
x64 CPU solver on a subset).

Prints ONE JSON line:

    {"metric": "lle_strang_instance_steps_per_s", "value": ...,
     "unit": ..., "vs_baseline": ..., "below_floor": ...}

vs_baseline: the reference has no cavity model at all; the conservative
denominator is its single-core 4-wave RK4 step rate (~8,600 steps/s,
BASELINE.md) -- an LLE step does ~64x more state work (T=256 complex
samples + 2 FFTs vs 4 ODE lines), so the ratio understates the speedup.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python bench_lle.py
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

BASELINE_STEPS_PER_S = 8_600.0   # reference 4-wave RK4 steps/s (BASELINE.md)

T_SAMPLES = 256
BATCH = 4096
N_STEPS = 2000
SAVE_EVERY = 200
DT = 0.01                        # z_max = 20 photon lifetimes
N_REPS = 3                       # median of k reps (CLAUDE.md policy)
PUMP_F = 2.0
DET_LO, DET_HI = 3.6, 4.4
V5E_BF16_PEAK_FLOPS = 197e12

# regression floor (CLAUDE.md): record 10.3M (pallas kernel, 2026-08-19,
# mid-grade window -- the same session's first capture medianed 7.1M with
# 2x rep spread).  Floor = 7M (~0.68x record): under it on a window whose
# bench.py calibration is healthy = a real regression (BENCH_LLE.md)
FLOOR_INSTANCE_STEPS_PER_S = 7_000_000


def _flops_per_strang_step(t: int) -> float:
    """Algorithmic real-FLOP estimate per instance per Strang step: two
    complex FFTs (~5 t log2 t real flops each), the frequency-domain
    linear multiply (~6 t), the detuning/drive affine update (~10 t) and
    the exact Kerr rotation (|psi|^2, sin/cos ~ 10 flops, complex rotate:
    ~20 t)."""
    return 10.0 * t * math.log2(t) + 36.0 * t


def main() -> None:
    from bench import _tpu_attempt, _tunnel_preflight, floor_retry

    if _tpu_attempt():
        ok_pf, reason = _tunnel_preflight()
        if not ok_pf:
            print(f"# TPU preflight failed: {reason}", file=sys.stderr)
            print(json.dumps({
                "metric": "lle_strang_instance_steps_per_s",
                "value": 0.0,
                "unit": "instance-steps/s",
                "vs_baseline": 0.0,
                "error": reason,
            }))
            return

    import jax

    from psa_simulation_ode_rk_mvp_dispersion_tpu.utils.precision import (
        enable_compile_cache,
    )

    enable_compile_cache()

    import psa_tpu as psa
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import lle

    backend = jax.default_backend()
    precision = "x32" if backend == "tpu" else "x64"

    grid = lle.TimeGrid(n_samples=T_SAMPLES, t_window_s=20.0)
    detunings = np.linspace(DET_LO, DET_HI, BATCH)
    coeffs = lle.make_lle_coeffs(
        grid, detuning=detunings, pump=PUMP_F, d2=-1.0, precision=precision
    )
    # deterministic per-lane soliton seeds (no noise): every lane converges
    # to its stationary soliton, so accuracy subsets are reproducible
    psi0 = np.stack(
        [lle.soliton_ansatz(grid, d, PUMP_F, -1.0) for d in detunings]
    )
    cfg = psa.custom_simulation_config(
        z_max=N_STEPS * DT, dz=DT, save_every=SAVE_EVERY, precision=precision
    )

    def entry_for(el_reps, ok):
        el = float(np.median(el_reps))
        inst_steps = BATCH * N_STEPS / el
        flops = inst_steps * _flops_per_strang_step(T_SAMPLES)
        return {
            "elapsed_s": round(el, 4),
            "rep_times_s": [round(r, 4) for r in el_reps],
            "instance_steps_per_s": round(inst_steps),
            "est_tflops_per_s": round(flops / 1e12, 3),
            "mfu_algorithmic_pct": round(
                100.0 * flops / V5E_BF16_PEAK_FLOPS, 2),
            "ok_fraction": float(np.mean(ok)),
        }

    def timed(engine: str, n_rep: int = N_REPS):
        lle.solve_lle_batch(cfg, coeffs, psi0, engine=engine)   # warm-up
        reps = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            pk, psi_last, ok = lle.solve_lle_batch(
                cfg, coeffs, psi0, engine=engine
            )
            reps.append(time.perf_counter() - t0)
        return reps, pk, psi_last, ok

    results = {}
    engines = ["scan"] + (["pallas"] if backend == "tpu" else [])
    psi_by_engine = {}
    for engine in engines:
        try:
            reps, pk, psi_last, ok = timed(engine)
            results[engine] = entry_for(reps, ok)
            psi_by_engine[engine] = psi_last
        except Exception as e:  # noqa: BLE001
            print(f"# lle engine {engine} skipped: {e}", file=sys.stderr)

    # matched-tolerance (df32) lane -- smaller batch, existence + honest
    # rate (the compensated arithmetic runs on the VPU)
    if backend == "tpu":
        try:
            import dataclasses as _dc

            B_df = 512
            cfg_df = _dc.replace(cfg, precision="df32")
            c_df = lle.make_lle_coeffs(
                grid, detuning=detunings[:B_df], pump=PUMP_F, d2=-1.0,
                precision="df32",
            )
            lle.solve_lle_batch(cfg_df, c_df, psi0[:B_df])      # warm-up
            t0 = time.perf_counter()
            _, _, ok_df = lle.solve_lle_batch(cfg_df, c_df, psi0[:B_df])
            el_df = time.perf_counter() - t0
            results["df32_twofloat"] = {
                "elapsed_s": round(el_df, 4),
                "batch": B_df,
                "instance_steps_per_s": round(B_df * N_STEPS / el_df),
                "ok_fraction": float(np.mean(ok_df)),
                "note": "matched-tolerance tier (<=1e-9 vs x64; on-chip "
                        "parity lane in tests/test_df32_lle.py)",
            }
        except Exception as e:  # noqa: BLE001
            print(f"# df32 lle lane skipped: {e}", file=sys.stderr)

    # rk45 adaptive lane (smaller batch; soliton transient sets the step
    # controller's work, so this is a *cavities/s* rate, not steps/s).
    # Round 5 (VERDICT r4 #4): scan AND the fused adaptive SSFM kernel
    # (ops/pallas_ssfm_adaptive.py) race; the headline field is the best.
    rk45_cavities_per_s = None
    rk45_ok = None
    rk45_by_engine = {}
    try:
        B45 = 512
        cfg45 = psa.custom_simulation_config(
            z_max=N_STEPS * DT, dz=DT, save_every=SAVE_EVERY,
            precision=precision, integrator="rk45",
            rtol=1e-5 if precision == "x32" else 1e-8,
            atol=1e-8 if precision == "x32" else 1e-11,
        )
        c45 = lle.make_lle_coeffs(
            grid, detuning=detunings[:B45], pump=PUMP_F, d2=-1.0,
            precision=precision,
        )
        rk45_engines = ["scan"] + (["pallas"] if backend == "tpu" else [])
        for eng45 in rk45_engines:
            try:
                lle.solve_lle_batch(cfg45, c45, psi0[:B45],
                                    engine=eng45)               # warm-up
                t0 = time.perf_counter()
                _, _, ok45 = lle.solve_lle_batch(cfg45, c45, psi0[:B45],
                                                 engine=eng45)
                el45 = time.perf_counter() - t0
                rk45_by_engine[eng45] = {
                    "cavities_per_s": round(B45 / el45, 1),
                    "ok_fraction": float(np.mean(ok45)),
                }
            except Exception as e:  # noqa: BLE001
                print(f"# lle rk45 engine {eng45} skipped: {e}",
                      file=sys.stderr)
        if rk45_by_engine:
            best45 = max(rk45_by_engine.values(),
                         key=lambda r: r["cavities_per_s"])
            rk45_cavities_per_s = best45["cavities_per_s"]
            rk45_ok = best45["ok_fraction"]
    except Exception as e:  # noqa: BLE001
        print(f"# lle rk45 lane skipped: {e}", file=sys.stderr)

    # rk4ip45 adaptive lane (round 5, VERDICT r4 #4): step-doubling on the
    # 4th-order interaction-picture step at the SAME tolerance -- fewer
    # accepted steps (h ~ tol^{1/5} vs tol^{1/3}) is the equal-tolerance
    # speed mechanism; endpoint error vs x64 recorded in meta alongside.
    rk4ip45_cavities_per_s = None
    rk4ip45_ok = None
    try:
        B45 = 512
        cfgip = psa.custom_simulation_config(
            z_max=N_STEPS * DT, dz=DT, save_every=SAVE_EVERY,
            precision=precision, integrator="rk4ip45",
            rtol=1e-5 if precision == "x32" else 1e-8,
            atol=1e-8 if precision == "x32" else 1e-11,
        )
        cip = lle.make_lle_coeffs(
            grid, detuning=detunings[:B45], pump=PUMP_F, d2=-1.0,
            precision=precision,
        )
        lle.solve_lle_batch(cfgip, cip, psi0[:B45])             # warm-up
        t0 = time.perf_counter()
        _, psi_ip, okip = lle.solve_lle_batch(cfgip, cip, psi0[:B45])
        elip = time.perf_counter() - t0
        rk4ip45_cavities_per_s = round(B45 / elip, 1)
        rk4ip45_ok = float(np.mean(okip))
    except Exception as e:  # noqa: BLE001
        print(f"# lle rk4ip45 lane skipped: {e}", file=sys.stderr)

    # the user-facing scan: MI -> soliton detuning sweep (noisy CW seeds)
    scan_points_per_s = None
    try:
        n_scan = 4096
        lle.detuning_scan(cfg, grid, detunings=np.linspace(0.5, 4.5, n_scan),
                          pump=PUMP_F, d2=-1.0)                 # warm-up
        t0 = time.perf_counter()
        _, _, _, _, ok_sc = lle.detuning_scan(
            cfg, grid, detunings=np.linspace(0.5, 4.5, n_scan),
            pump=PUMP_F, d2=-1.0,
        )
        el_sc = time.perf_counter() - t0
        scan_points_per_s = round(n_scan / el_sc, 1)
    except Exception as e:  # noqa: BLE001
        print(f"# lle detuning-scan lane skipped: {e}", file=sys.stderr)

    # --- accuracy: subset of final soliton states vs the x64 CPU solver ---
    max_rel_err = {}
    try:
        cpu = jax.devices("cpu")
        if precision != "x64" and cpu:
            sub = 8
            with jax.default_device(cpu[0]):
                cfg64 = psa.custom_simulation_config(
                    z_max=N_STEPS * DT, dz=DT, save_every=SAVE_EVERY,
                    precision="x64",
                )
                c64 = lle.make_lle_coeffs(
                    grid, detuning=detunings[:sub], pump=PUMP_F, d2=-1.0,
                )
                _, psi_ref, _ = lle.solve_lle_batch(cfg64, c64, psi0[:sub])
            P_ref = np.abs(psi_ref) ** 2
            for engine, psi_e in psi_by_engine.items():
                P = np.abs(np.asarray(psi_e)[:sub]) ** 2
                err = float(np.max(np.abs(P - P_ref)) / np.max(P_ref))
                results[engine]["max_rel_power_err_vs_x64"] = err
                max_rel_err[engine] = err
    except Exception as e:  # noqa: BLE001
        print(f"# lle accuracy cross-check skipped: {e}", file=sys.stderr)

    best = max(results, key=lambda k: results[k]["instance_steps_per_s"]
               if k in ("scan", "pallas") else -1)

    # in-band calibration + bounded retry-on-degraded (VERDICT r4 #6):
    # every attempt's probe/RTT ride in meta so a below_floor record is
    # diagnosable from the artifact alone
    def _remeasure():
        reps, _pk, _psi, ok = timed(best)
        results[best] = {**results[best], **entry_for(reps, ok)}
        return results[best]["instance_steps_per_s"]

    best_rate, floor_attempts, calibration = floor_retry(
        results[best]["instance_steps_per_s"], _remeasure,
        FLOOR_INSTANCE_STEPS_PER_S, backend)
    best_rate = round(best_rate)

    meta = {
        "backend": backend,
        "precision": precision,
        "t_samples": T_SAMPLES,
        "batch": BATCH,
        "strang_steps": N_STEPS,
        "detuning_range": [DET_LO, DET_HI],
        "pump": PUMP_F,
        "engines": results,
        "best_engine": best,
        "rk45_cavities_per_s": rk45_cavities_per_s,
        "rk45_ok_fraction": rk45_ok,
        "rk45_by_engine": rk45_by_engine,
        "rk4ip45_cavities_per_s": rk4ip45_cavities_per_s,
        "rk4ip45_ok_fraction": rk4ip45_ok,
        "detuning_scan_points_per_s": scan_points_per_s,
        "floor_instance_steps_per_s": FLOOR_INSTANCE_STEPS_PER_S,
        "calibration": calibration,
        "floor_attempts": floor_attempts,
    }
    below_floor = bool(
        backend == "tpu" and best_rate < FLOOR_INSTANCE_STEPS_PER_S
    )
    meta["below_floor"] = below_floor
    if below_floor:
        print(
            f"# REGRESSION WARNING: lle {best_rate} inst-steps/s is below "
            f"the {FLOOR_INSTANCE_STEPS_PER_S} floor", file=sys.stderr,
        )
    print(f"# {json.dumps(meta)}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "lle_strang_instance_steps_per_s",
                "value": best_rate,
                "unit": f"instance-steps/s (T={T_SAMPLES})",
                "vs_baseline": round(best_rate / BASELINE_STEPS_PER_S, 1),
                "below_floor": below_floor,
                "env_degraded": bool(calibration and calibration["degraded"]),
            }
        )
    )


if __name__ == "__main__":
    main()
