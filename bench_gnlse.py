"""GNLSE benchmark: batched split-step Fourier pulse propagation.

Third workload profile after ``bench.py`` (4-wave, tiny-state/VPU-bound) and
``bench_comb.py`` (N-wave dense coupling, MXU-bound): B independent field
envelopes of T samples advancing through the symmetric split-step method in
one XLA program (``models/gnlse.py``) -- an FFT-throughput-bound workload.
Lanes: fixed-step Kerr-only (scan + fused pallas kernel), fixed-step
generalized nonlinearity (silica Raman response + self-steepening; 4 extra
FFT pairs per step inside the RK4 substep -- scan + in-kernel RK4), the
matched-tolerance df32 tier, and the adaptive (rk45) solver; plus an
accuracy cross-check of a subset against the x64 CPU solver.

Prints ONE JSON line:

    {"metric": "gnlse_ssfm_instance_steps_per_s", "value": ..., "unit": ...,
     "vs_baseline": ...}

vs_baseline divides by the single-core NumPy 4-wave reference's step rate
(~8,600 RK4 steps/s, BASELINE.md) -- very conservative, since one SSFM step
here transforms a T=1024-sample field, not a 4-vector (the reference has no
field-propagation model at all).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python bench_gnlse.py
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

BASELINE_STEPS_PER_S = 8_600.0

T_SAMPLES = 1024
BATCH = 2048
N_STEPS = 1000
SAVE_EVERY = 100
N_REPS = 3                    # median of k reps (VERDICT r2 weak #1)
V5E_HBM_PEAK_BYTES_S = 819e9  # one v5e chip HBM bandwidth
T0_S = 1e-12
BETA2 = -2.0e-26
GAMMA = 2e-3
OMEGA0 = 1.2e15


def _bytes_per_step(t: int, nl: bool, itemsize: int = 8) -> float:
    """HBM-traffic estimate per instance per fused split step (complex64 =
    8 B/sample), assuming each FFT and each fused elementwise chain reads +
    writes the full (T,) field once (XLA fuses pointwise chains between
    transforms).  Kerr-only: 1 FFT pair + 1 fused NL block ~= 3 round trips.
    Raman+steepening adds 4 RK4 substep evals x (1 rfft pair at half cost +
    1 fft pair + ~2 fused blocks) ~= 4 x 4.5 round trips.  Rough -- used for
    a bandwidth-utilization signal, not an exact roofline."""
    rt = 2.0 * t * itemsize            # one read+write round trip of (T,)
    if not nl:
        return 3.0 * rt
    return 3.0 * rt + 4.0 * 4.5 * rt


def _flops_per_step(t: int, nl: bool) -> float:
    """Algorithmic real-FLOP estimate per instance per fused split step.

    One complex length-t FFT ~ 5 t log2 t real flops.  Kerr-only fused step:
    1 FFT pair + phase rotation (~20 t).  Generalized nonlinearity: the RK4
    substep evaluates N(A) 4 times, each costing 3 FFTs (Raman convolution
    pair + one for the shock derivative... implemented as 2 pairs) plus
    ~40 t elementwise.
    """
    fft = 5.0 * t * math.log2(t)
    if not nl:
        return 2.0 * fft + 20.0 * t
    rhs = 4.0 * fft + 40.0 * t
    return 2.0 * fft + 4.0 * rhs + 30.0 * t


def main() -> None:
    from bench import _tpu_attempt, _tunnel_preflight

    if _tpu_attempt():
        ok_pf, reason = _tunnel_preflight()
        if not ok_pf:
            print(f"# TPU preflight failed: {reason}", file=sys.stderr)
            print(json.dumps({
                "metric": "gnlse_ssfm_instance_steps_per_s",
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

    enable_compile_cache()  # axon remote compiles are minutes on slow days

    import psa_tpu as psa
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn

    backend = jax.default_backend()
    precision = "x32" if backend == "tpu" else "x64"

    grid = gn.TimeGrid.for_pulse(T0_S, n_samples=T_SAMPLES)
    disp = psa.DispersionParams.from_betas(OMEGA0, beta2=BETA2)
    co = gn.make_gnlse_coeffs(grid, disp, gamma_W_m=GAMMA, alpha_1_m=5e-5,
                              precision=precision)
    nl = gn.make_nl_terms(grid, f_raman=0.18, omega0=OMEGA0,
                          precision=precision)
    P0 = gn.soliton_peak_power(BETA2, GAMMA, T0_S)
    scales = np.linspace(0.5, 1.5, BATCH)
    A0 = (np.sqrt(scales * P0)[:, None]
          / np.cosh(grid.t()[None, :] / T0_S)).astype(np.complex128)

    cfg = psa.custom_simulation_config(
        z_max=10.0, dz=10.0 / N_STEPS, save_every=SAVE_EVERY,
        precision=precision,
    )

    def timed(nl_terms, n_reps: int = N_REPS):
        gn.solve_gnlse_batch(cfg, co, A0, nl=nl_terms)  # warm-up compile
        reps = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            pk, Af, ok = gn.solve_gnlse_batch(cfg, co, A0, nl=nl_terms)
            reps.append(time.perf_counter() - t0)
        return reps, ok

    results = {}
    for name, nl_terms in (("kerr", None), ("raman_steepening", nl)):
        reps, ok = timed(nl_terms)
        el = float(np.median(reps))
        inst_steps = BATCH * N_STEPS / el
        is_nl = nl_terms is not None
        bw = inst_steps * _bytes_per_step(T_SAMPLES, is_nl)
        results[name] = {
            "elapsed_s": round(el, 4),
            "rep_times_s": [round(r, 4) for r in reps],
            "instance_steps_per_s": round(inst_steps),
            "est_tflops_per_s": round(
                inst_steps * _flops_per_step(T_SAMPLES, is_nl) / 1e12, 3,
            ),
            "est_hbm_gb_per_s": round(bw / 1e9, 1),
            "hbm_utilization_pct": round(
                100.0 * bw / V5E_HBM_PEAK_BYTES_S, 1),
            "ok_fraction": float(np.mean(ok)),
        }

    # --- rk4ip lanes (4th-order interaction-picture RK4; reported but
    # EXCLUDED from the Kerr best-engine headline/floor: per-step transform
    # cost is ~2x Strang's and the method's value is equal-ACCURACY
    # throughput -- O(dz^4) lets it take ~5-10x larger steps at the same
    # error, which a fixed-step-count rate cannot express) -------------------
    import dataclasses as _dc

    cfg_ip = _dc.replace(cfg, integrator="rk4ip")
    for name, nl_terms in (("rk4ip_kerr", None), ("rk4ip_raman", nl)):
        try:
            gn.solve_gnlse_batch(cfg_ip, co, A0, nl=nl_terms)  # warm-up
            reps = []
            for _ in range(N_REPS):
                t0 = time.perf_counter()
                _, _, okk = gn.solve_gnlse_batch(cfg_ip, co, A0, nl=nl_terms)
                reps.append(time.perf_counter() - t0)
            el = float(np.median(reps))
            results[name] = {
                "elapsed_s": round(el, 4),
                "rep_times_s": [round(r, 4) for r in reps],
                "instance_steps_per_s": round(BATCH * N_STEPS / el),
                "ok_fraction": float(np.mean(okk)),
                "integrator": "rk4ip",
                "note": (
                    "O(dz^4) interaction-picture RK4: steps/s not "
                    "comparable to the Strang rows (different per-step "
                    "cost AND equal-accuracy step count); excluded from "
                    "the best-engine floor"
                ),
            }
        except Exception as e:  # noqa: BLE001
            print(f"# {name} lane skipped: {e}", file=sys.stderr)

    # --- fused pallas SSFM kernel (VMEM-resident, MXU group-split DFTs) -----
    if backend == "tpu":
        from psa_simulation_ode_rk_mvp_dispersion_tpu.ops import pallas_gnlse

        # the kernel's DFT cost model: 2 group-split transforms per step,
        # each 2*T*M_SUB complex MACs = 8*T*M_SUB real FLOPs per instance
        dft_flops = 2.0 * 8.0 * T_SAMPLES * pallas_gnlse.M_SUB

        try:
            gn.solve_gnlse_batch(cfg, co, A0, engine="pallas")  # warm-up
            repsk = []
            for _ in range(N_REPS):
                t0 = time.perf_counter()
                _, _, okk = gn.solve_gnlse_batch(cfg, co, A0, engine="pallas")
                repsk.append(time.perf_counter() - t0)
            elk = float(np.median(repsk))
            instk = BATCH * N_STEPS / elk
            results["kerr_pallas"] = {
                "elapsed_s": round(elk, 4),
                "rep_times_s": [round(r, 4) for r in repsk],
                "instance_steps_per_s": round(instk),
                "dot_alg": pallas_gnlse.DOT_ALG,
                "xgroup": pallas_gnlse.XGROUP,
                "mxu_tflops_per_s": round(instk * dft_flops / 1e12, 2),
                "ok_fraction": float(np.mean(okk)),
            }
        except Exception as e:  # noqa: BLE001
            print(f"# kerr_pallas lane skipped: {e}", file=sys.stderr)

        # generalized nonlinearity in-kernel (RK4 on the Raman/steepening
        # operator, every transform VMEM-resident -- round 3)
        try:
            gn.solve_gnlse_batch(cfg, co, A0, nl=nl, engine="pallas")
            repsn = []
            for _ in range(N_REPS):
                t0 = time.perf_counter()
                _, _, okn = gn.solve_gnlse_batch(cfg, co, A0, nl=nl,
                                                 engine="pallas")
                repsn.append(time.perf_counter() - t0)
            eln = float(np.median(repsn))
            instn = BATCH * N_STEPS / eln
            # per step: 2 linear transforms + 4 RK4 stages x (0.5 real fwd +
            # 0.5 real-part inv + 1 fwd + 1 inv) = 2 + 12 transform-equiv.
            results["raman_pallas"] = {
                "elapsed_s": round(eln, 4),
                "rep_times_s": [round(r, 4) for r in repsn],
                "instance_steps_per_s": round(instn),
                "dot_alg": pallas_gnlse.DOT_ALG,
                "xgroup": pallas_gnlse.XGROUP,
                "mxu_tflops_per_s": round(instn * 7.0 * dft_flops / 1e12, 2),
                "ok_fraction": float(np.mean(okn)),
            }
        except Exception as e:  # noqa: BLE001
            print(f"# raman_pallas lane skipped: {e}", file=sys.stderr)

    # --- vector (2-pol Manakov) lanes: scan vs fused pallas kernel ----------
    # Same grid/physics, B/2 instances of 2 polarizations each (same total
    # field samples as the scalar lanes).
    if backend == "tpu":
        try:
            from psa_simulation_ode_rk_mvp_dispersion_tpu.models import (
                vgnlse as vgn,
            )

            Bv = BATCH // 2
            co_v = vgn.make_vgnlse_coeffs(grid, disp, gamma_W_m=GAMMA,
                                          alpha_1_m=5e-5, coupling="manakov",
                                          precision="x32")
            th = 0.4
            A0v = np.stack([np.cos(th) * A0[:Bv], np.sin(th) * A0[:Bv]],
                           axis=1)
            for lane, eng in (("manakov_scan", "scan"),
                              ("manakov_pallas", "pallas")):
                vgn.solve_vgnlse_batch(cfg, co_v, A0v, engine=eng)
                repsv = []
                for _ in range(N_REPS):
                    t0 = time.perf_counter()
                    _, _, okv = vgn.solve_vgnlse_batch(cfg, co_v, A0v,
                                                       engine=eng)
                    repsv.append(time.perf_counter() - t0)
                elv = float(np.median(repsv))
                results[lane] = {
                    "elapsed_s": round(elv, 4),
                    "rep_times_s": [round(x, 4) for x in repsv],
                    "batch": Bv,
                    "instance_steps_per_s": round(Bv * N_STEPS / elv),
                    "ok_fraction": float(np.mean(okv)),
                }
        except Exception as e:  # noqa: BLE001
            print(f"# vector gnlse lanes skipped: {e}", file=sys.stderr)

    # --- matched-tolerance (df32) lane: two-float SSFM ----------------------
    # The tier that meets the <=1e-9 BASELINE bar on the f64-less v5e
    # (ops/df32_gnlse.py, round 3).  Smaller batch + fewer steps: the
    # compensated arithmetic runs on the VPU (~20x the x32 cost); this row
    # is about existence + honest rate, not the record.
    if backend == "tpu":
        try:
            import dataclasses as _dc

            B_df, S_df = 256, 200
            cfg_df = _dc.replace(cfg, precision="df32",
                                 z_max=10.0 * S_df / N_STEPS)
            co_df = gn.make_gnlse_coeffs(grid, disp, gamma_W_m=GAMMA,
                                         alpha_1_m=5e-5, precision="df32")
            gn.solve_gnlse_batch(cfg_df, co_df, A0[:B_df])   # warm-up
            t0 = time.perf_counter()
            _, _, ok_df = gn.solve_gnlse_batch(cfg_df, co_df, A0[:B_df])
            el_df = time.perf_counter() - t0
            results["df32_twofloat_ssfm"] = {
                "elapsed_s": round(el_df, 4),
                "batch": B_df,
                "split_steps": S_df,
                "instance_steps_per_s": round(B_df * S_df / el_df),
                "ok_fraction": float(np.mean(ok_df)),
                "note": "matched-tolerance tier (<=1e-9 vs the x64 solver; "
                        "TPU parity test in tests/test_df32_gnlse.py)",
            }
        except Exception as e:  # noqa: BLE001
            print(f"# df32 gnlse lane skipped: {e}", file=sys.stderr)

    # --- adaptive (rk45) lane: envelopes/s at matched physics.
    # Round 5 (VERDICT r4 #4): scan AND the fused adaptive SSFM kernel
    # (ops/pallas_ssfm_adaptive.py) race; rk45_envelopes_per_s is the best.
    cfg45 = psa.custom_simulation_config(
        z_max=10.0, dz=10.0 / N_STEPS, save_every=SAVE_EVERY,
        precision=precision, integrator="rk45",
        rtol=1e-5 if precision == "x32" else 1e-9,
        atol=1e-9 if precision == "x32" else 1e-12,
    )
    B45 = min(512, BATCH)
    rk45_by_engine = {}
    for eng45 in ["scan"] + (["pallas"] if backend == "tpu" else []):
        try:
            gn.solve_gnlse_batch(cfg45, co, A0[:B45], engine=eng45)
            t0 = time.perf_counter()
            _, _, ok45_e = gn.solve_gnlse_batch(cfg45, co, A0[:B45],
                                                engine=eng45)
            el45_e = time.perf_counter() - t0
            rk45_by_engine[eng45] = {
                "envelopes_per_s": round(B45 / el45_e, 1),
                "ok_fraction": float(np.mean(ok45_e)),
            }
            if eng45 == "scan":
                el45, ok45 = el45_e, ok45_e
        except Exception as e:  # noqa: BLE001
            print(f"# gnlse rk45 engine {eng45} skipped: {e}",
                  file=sys.stderr)
    rk45_best = (max(rk45_by_engine.values(),
                     key=lambda r: r["envelopes_per_s"])
                 if rk45_by_engine else
                 {"envelopes_per_s": None, "ok_fraction": None})

    # --- adaptive equal-ACCURACY A/B: rk45 (2nd-order Strang doubling) vs
    # rk4ip45 (4th-order interaction-picture doubling) at the SAME
    # rtol/atol -- the honest comparison for adaptive methods (the
    # 4th-order controller converges in far fewer accepted steps)
    adaptive_ab = None
    try:
        cfg_ip45 = psa.custom_simulation_config(
            z_max=10.0, dz=10.0 / N_STEPS, save_every=SAVE_EVERY,
            precision=precision, integrator="rk4ip45",
            rtol=cfg45.rtol, atol=cfg45.atol,
        )
        gn.solve_gnlse_batch(cfg_ip45, co, A0[:B45])    # warm-up
        t0 = time.perf_counter()
        _, _, ok_ip = gn.solve_gnlse_batch(cfg_ip45, co, A0[:B45])
        el_ip = time.perf_counter() - t0
        adaptive_ab = {
            "rtol": cfg45.rtol,
            "rk45_envelopes_per_s": round(B45 / el45, 1),
            "rk4ip45_envelopes_per_s": round(B45 / el_ip, 1),
            "rk4ip45_speedup": round(el45 / el_ip, 2),
            "rk4ip45_ok_fraction": float(np.mean(ok_ip)),
            "note": (
                "regime-dependent: the 4th-order controller wins at TIGHT "
                "tolerances (rtol 1e-9: 8.4x fewer accepted steps, "
                "docs/PERF.md) -- at the loose x32 tolerance used on TPU "
                "the 2nd-order Strang attempt's 2.4x-lower per-attempt "
                "cost dominates"
            ),
        }
    except Exception as e:  # noqa: BLE001
        print(f"# rk4ip45 adaptive A/B skipped: {e}", file=sys.stderr)

    # --- accuracy: subset vs x64 CPU (fixed-step, Kerr) ---------------------
    # two thresholds: the pulse core (>= 1% of peak power) and the deep
    # tails (>= 1e-6 of peak, where f32 absolute roundoff dominates)
    max_rel_err = core_rel_err = None
    try:
        cpu = jax.devices("cpu")
        sub = 8
        if precision != "x64" and cpu:
            _, A_fast, _ = gn.solve_gnlse_batch(cfg, co, A0[:sub])
            A_pal = None
            if "kerr_pallas" in results:
                _, A_pal, _ = gn.solve_gnlse_batch(cfg, co, A0[:sub],
                                                   engine="pallas")
            with jax.default_device(cpu[0]):
                cfg64 = psa.custom_simulation_config(
                    z_max=10.0, dz=10.0 / N_STEPS, save_every=SAVE_EVERY,
                    precision="x64",
                )
                co64 = gn.make_gnlse_coeffs(grid, disp, gamma_W_m=GAMMA,
                                            alpha_1_m=5e-5, precision="x64")
                _, A_ref, _ = gn.solve_gnlse_batch(cfg64, co64, A0[:sub])
            P_fast = np.abs(A_fast) ** 2
            P_ref = np.abs(A_ref) ** 2
            rel = np.abs(P_fast / np.maximum(P_ref, 1e-300) - 1.0)
            max_rel_err = float(rel[P_ref > 1e-6 * P_ref.max()].max())
            core_rel_err = float(rel[P_ref > 1e-2 * P_ref.max()].max())
            if A_pal is not None:
                relp = np.abs(np.abs(A_pal) ** 2
                              / np.maximum(P_ref, 1e-300) - 1.0)
                results["kerr_pallas"]["subset_max_rel_power_err_vs_x64"] = (
                    float(relp[P_ref > 1e-6 * P_ref.max()].max()))
                results["kerr_pallas"]["subset_core_rel_power_err_vs_x64"] = (
                    float(relp[P_ref > 1e-2 * P_ref.max()].max()))
    except Exception as e:  # noqa: BLE001
        print(f"# gnlse accuracy cross-check skipped: {e}", file=sys.stderr)

    meta = {
        "backend": backend,
        "precision": precision,
        "t_samples": T_SAMPLES,
        "batch": BATCH,
        "split_steps": N_STEPS,
        "paths": results,
        "rk45_envelopes_per_s": rk45_best["envelopes_per_s"],
        "rk45_ok_fraction": rk45_best["ok_fraction"],
        "rk45_by_engine": rk45_by_engine,
        "adaptive_equal_accuracy_ab": adaptive_ab,
        "subset_max_rel_power_err_vs_x64": max_rel_err,
        "subset_core_rel_power_err_vs_x64": core_rel_err,
        "flops_note": "algorithmic real-FLOPs (5 t log2 t per complex FFT)",
    }
    # headline = best Kerr engine (scan vs fused pallas kernel); regression
    # floor (CLAUDE.md): median best-engine Kerr rate on TPU >= 0.9M
    kerr_engines = [k for k in results if k.startswith("kerr")]
    best = max(kerr_engines,
               key=lambda k: results[k]["instance_steps_per_s"])
    best_rate = results[best]["instance_steps_per_s"]
    meta["best_path"] = best

    # in-band calibration + bounded retry-on-degraded (VERDICT r4 #6)
    def _remeasure():
        engine = "pallas" if best == "kerr_pallas" else "scan"
        reps = []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            _, _, _okk = gn.solve_gnlse_batch(cfg, co, A0, engine=engine)
            reps.append(time.perf_counter() - t0)
        rate = round(BATCH * N_STEPS / float(np.median(reps)))
        results[best] = {**results[best],
                         "rep_times_s": [round(r, 4) for r in reps],
                         "instance_steps_per_s": rate}
        return rate

    from bench import floor_retry

    # raised 0.9M -> 1.3M in round 4 (VERDICT r3 #8: ~0.75x the 1.78M
    # record; the measured +-25% day band keeps a mid-grade healthy day
    # above it -- same-session A/B 2026-08-19 measured 1.33M vs 1.10M)
    FLOOR = 1_300_000
    best_rate, floor_attempts, calibration = floor_retry(
        best_rate, _remeasure, FLOOR, backend)
    best_rate = round(best_rate)
    meta["calibration"] = calibration
    meta["floor_attempts"] = floor_attempts
    meta["floor_instance_steps_per_s"] = FLOOR
    meta["below_floor"] = bool(
        backend == "tpu" and best_rate < meta["floor_instance_steps_per_s"]
    )
    if meta["below_floor"]:
        print(
            f"# REGRESSION WARNING: gnlse {best_rate} inst-steps/s is below "
            f"the 1.3M floor (record 1.78M scan)", file=sys.stderr,
        )
    print(f"# {json.dumps(meta)}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "gnlse_ssfm_instance_steps_per_s",
                "value": best_rate,
                "unit": f"instance-steps/s (T={T_SAMPLES} samples)",
                "vs_baseline": round(best_rate / BASELINE_STEPS_PER_S, 1),
                "below_floor": meta["below_floor"],
                "env_degraded": bool(calibration and calibration["degraded"]),
            }
        )
    )


if __name__ == "__main__":
    main()
