"""Comb benchmark: batched N-wave cascaded-FWM solves (BASELINE.json config 5).

The headline ``bench.py`` measures the 4-wave sweep -- a tiny-state,
VPU/latency-bound workload.  This second bench measures the framework's
MXU-relevant workload: B independent N-line combs integrating in one XLA
program, with the cubic coupling evaluated either as padded FFTs or as dense
DFT matmuls (``models/nwave.py``).  It reports achieved throughput, an
algorithmic-FLOP/s estimate, and an accuracy cross-check of a subset against
the x64 CPU solver.

Prints ONE JSON line:

    {"metric": "comb_rk4_instance_steps_per_s", "value": ..., "unit": ...,
     "vs_baseline": ...}

vs_baseline is measured against the single-core NumPy 4-wave reference's
step rate (~8,600 RK4 steps/s, BASELINE.md) scaled by state size: a fair
"equivalent reference steps/s" for an N-line comb would be even slower, so
this is a conservative denominator.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python bench_comb.py
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

# reference single-core 4-wave RK4 step rate (BASELINE.md); conservative
# denominator for an N-line comb (the reference has no comb model at all)
BASELINE_STEPS_PER_S = 8_600.0

N_LINES = 64
BATCH = 4096
N_STEPS = 1000
SAVE_EVERY = 100
Z_MAX_M = 500.0
N_REPS = 3                      # median of k reps (one bad tunnel day must
                                # not rewrite the record; VERDICT r2 weak #1)
V5E_BF16_PEAK_FLOPS = 197e12    # one v5e chip, bf16 MXU peak
HIGHEST_PASSES = 6              # f32 matmul at Precision.HIGHEST = 6 bf16
                                # MXU passes (3-term bf16 operand splits)


def _flops_per_rk4_step(n: int, L: int, coupling: str) -> float:
    """Algorithmic real-FLOP estimate per instance per RK4 step.

    dft: two complex matmuls per RHS eval -- (1,n)x(n,L) and (1,L)x(L,n) --
    at 8 real flops per complex MAC, plus the elementwise triple product
    (~13L) and linear terms (~16n).  fft: 3 complex FFTs at ~5 L log2 L real
    flops each.  RK4 = 4 RHS evals + ~4 axpy state updates (~8n each).
    """
    if coupling == "dft":
        rhs = 16.0 * n * L + 13.0 * L + 16.0 * n
    else:
        rhs = 15.0 * L * math.log2(L) + 13.0 * L + 16.0 * n
    return 4.0 * rhs + 32.0 * n


def main() -> None:
    from bench import _tpu_attempt, _tunnel_preflight

    if _tpu_attempt():
        ok_pf, reason = _tunnel_preflight()
        if not ok_pf:
            print(f"# TPU preflight failed: {reason}", file=sys.stderr)
            print(json.dumps({
                "metric": "comb_rk4_instance_steps_per_s",
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
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import nwave as nw

    backend = jax.default_backend()
    precision = "x32" if backend == "tpu" else "x64"

    # --- physics: two 0.5 W pumps, 50 GHz spacing, weak anomalous beta2 ----
    omega_c = 2.0 * np.pi * 193.1e12
    domega = 2.0 * np.pi * 50e9
    grid = nw.CombGrid.centered(omega_c, domega, N_LINES)
    disp = psa.DispersionParams.from_betas(
        omega_c, beta2=-1.0e-27, beta3=1.2e-41
    )
    coeffs1 = nw.make_comb_coeffs(
        grid, disp, gamma_W_m=10e-3, alpha_1_m=5e-5, precision=precision
    )
    c = N_LINES // 2
    A0_1 = nw.seed_comb(
        grid, pump_lines={c - 8: 0.5, c + 8: 0.5}, noise_floor_W=1e-9, seed=0
    )

    # batch: replicate the comb over a gamma grid (a realistic sweep)
    gammas = np.linspace(5e-3, 15e-3, BATCH)
    coeffs = nw.NWaveCoeffs(
        gamma=gammas, alpha=np.full(BATCH, 5e-5),
        beta_lin=np.broadcast_to(np.asarray(coeffs1.beta_lin, float), (BATCH, N_LINES)),
    )
    A0 = np.broadcast_to(A0_1, (BATCH, N_LINES)).copy()

    cfg = psa.custom_simulation_config(
        z_max=Z_MAX_M, dz=Z_MAX_M / N_STEPS, save_every=SAVE_EVERY,
        precision=precision,
    )

    def entry_for(el_reps, coupling, ok, matmul_formulation):
        """Per-engine result row: median wall-clock, algorithmic TFLOP/s and
        MFU (vs the 197 TFLOPS v5e bf16 peak).  For matmul (dft) engines the
        hardware pass rate is ~HIGHEST_PASSES x the algorithmic f32 rate
        (multi-pass bf16), reported separately as mxu_pass_tflops/-pct so
        both the honest FLOP number and the hardware utilization are
        visible (VERDICT r2 next #1)."""
        el = float(np.median(el_reps))
        inst_steps = BATCH * N_STEPS / el
        L = nw._fft_len(N_LINES)
        flops = inst_steps * _flops_per_rk4_step(N_LINES, L, coupling)
        row = {
            "elapsed_s": round(el, 4),
            "rep_times_s": [round(r, 4) for r in el_reps],
            "instance_steps_per_s": round(inst_steps),
            "est_tflops_per_s": round(flops / 1e12, 3),
            "mfu_algorithmic_pct": round(
                100.0 * flops / V5E_BF16_PEAK_FLOPS, 2),
            "ok_fraction": float(np.mean(ok)),
        }
        if matmul_formulation:
            # matmul share of the algorithmic flops (16 n L of the RHS)
            L = nw._fft_len(N_LINES)
            mm_share = (16.0 * N_LINES * L) / (
                _flops_per_rk4_step(N_LINES, L, "dft") / 4.0)
            mm_flops = flops * mm_share
            row["mxu_pass_tflops_per_s"] = round(
                HIGHEST_PASSES * mm_flops / 1e12, 2)
            row["mxu_pass_utilization_pct"] = round(
                100.0 * HIGHEST_PASSES * mm_flops / V5E_BF16_PEAK_FLOPS, 2)
        return row

    def timed(coupling: str, n_rep: int = N_REPS):
        # warm-up compiles the program; then median of n_rep timed calls
        nw.solve_comb_batch(cfg, coeffs, A0, coupling=coupling)
        reps = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            P_max, A_fin, ok = nw.solve_comb_batch(cfg, coeffs, A0, coupling=coupling)
            reps.append(time.perf_counter() - t0)
        return reps, P_max, A_fin, ok

    results = {}
    for coupling in ("fft", "dft"):
        reps, P_max, A_fin, ok = timed(coupling)
        results[coupling] = entry_for(reps, coupling, ok, coupling == "dft")

    # fused single-launch VMEM kernel (ops/pallas_comb.py): TPU x32 only.
    # Two dot paths: 'highest' (6-pass bf16 = f32-class) and 'x3' (3-pass
    # compensated hi/lo-bf16 split: ~2x the MXU pass rate, ~3x the
    # accumulated rounding -- per-lane accuracy recorded below).
    pallas_A = {}
    if backend == "tpu":
        from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.pallas_comb import (
            solve_comb_batch_pallas,
        )

        pk = dict(
            gamma=gammas, alpha=np.full(BATCH, 5e-5),
            beta_lin=np.broadcast_to(
                np.asarray(coeffs1.beta_lin, float), (BATCH, N_LINES)
            ),
            dz_m=Z_MAX_M / N_STEPS, n_steps=N_STEPS, save_every=SAVE_EVERY,
        )
        # multistep rows (ab4 = 1 RHS eval/step vs RK4's 4) are reported but
        # EXCLUDED from the best-engine headline/floor: per-step cost differs,
        # so their inst-steps/s is not comparable to the rk4 rows.  On-chip
        # A/B 2026-08-18: ab4_x3 18.1M vs rk4_x3 15.2M (+19%) at the same
        # ~2e-4 rounding-dominated accuracy; 'highest'+multistep crashes the
        # Mosaic remote compile (same compiler-limit family as the width
        # limits in ops/pallas_comb.py), hence x3-only here.
        for lane, mxu, integ in (
            ("pallas", "highest", "rk4"),
            ("pallas_x3", "x3", "rk4"),
            ("pallas_ab4_x3", "x3", "ab4"),
        ):
            try:
                solve_comb_batch_pallas(
                    A0, mxu_precision=mxu, integrator=integ, **pk
                )
                reps = []
                for _ in range(N_REPS):
                    t0 = time.perf_counter()
                    _, A_p, okk = solve_comb_batch_pallas(
                        A0, mxu_precision=mxu, integrator=integ, **pk
                    )
                    reps.append(time.perf_counter() - t0)
                row = entry_for(reps, "dft", okk, True)
                if mxu == "x3":
                    # x3 = 3 bf16 passes per f32 matmul, not 6
                    for k in ("mxu_pass_tflops_per_s",
                              "mxu_pass_utilization_pct"):
                        row[k] = round(row[k] / 2.0, 2)
                if integ != "rk4":
                    row["integrator"] = integ
                    row["note"] = (
                        "1 RHS eval/step (vs rk4's 4): steps/s not comparable "
                        "to the rk4 rows; excluded from best-engine/floor"
                    )
                    # the FLOP estimate assumes 4 evals/step
                    for k in ("est_tflops_per_s", "mfu_algorithmic_pct",
                              "mxu_pass_tflops_per_s",
                              "mxu_pass_utilization_pct"):
                        row.pop(k, None)
                results[lane] = row
                pallas_A[lane] = np.asarray(A_p)
            except Exception as e:  # noqa: BLE001
                print(f"# {lane} comb kernel skipped: {e}", file=sys.stderr)

    # matched-tolerance (df32) lane: the two-float FFT engine -- the tier
    # that meets the <=1e-9 BASELINE bar on the f64-less v5e (round 3).
    # Smaller batch: the compensated arithmetic runs on the VPU (~20x the
    # x32 cost); this row is about existence + honest rate, not the record.
    if backend == "tpu":
        try:
            import dataclasses as _dc

            B_df = 1024
            cfg_df = _dc.replace(cfg, precision="df32")
            c_df = nw.NWaveCoeffs(
                gamma=gammas[:B_df], alpha=np.full(B_df, 5e-5),
                beta_lin=np.broadcast_to(
                    np.asarray(coeffs1.beta_lin, float), (B_df, N_LINES)
                ),
            )
            nw.solve_comb_batch(cfg_df, c_df, A0[:B_df])   # warm-up
            t0 = time.perf_counter()
            _, _, ok_df = nw.solve_comb_batch(cfg_df, c_df, A0[:B_df])
            el_df = time.perf_counter() - t0
            results["df32_twofloat_fft"] = {
                "elapsed_s": round(el_df, 4),
                "batch": B_df,
                "instance_steps_per_s": round(B_df * N_STEPS / el_df),
                "ok_fraction": float(np.mean(ok_df)),
                "note": "matched-tolerance tier (<=1e-9 vs f64 reference; "
                        "TPU parity test in tests/test_df32_comb.py)",
            }
        except Exception as e:  # noqa: BLE001
            print(f"# df32 comb lane skipped: {e}", file=sys.stderr)

    best = max(
        (k for k in results
         if k != "df32_twofloat_fft"
         and results[k].get("integrator", "rk4") == "rk4"),
        key=lambda k: results[k]["instance_steps_per_s"],
    )
    best_rate = results[best]["instance_steps_per_s"]

    # in-band calibration + bounded retry-on-degraded (VERDICT r4 #6)
    _PALLAS_SPEC = {"pallas": ("highest", "rk4"), "pallas_x3": ("x3", "rk4")}

    def _remeasure():
        if best in ("fft", "dft"):
            reps, _pm, _af, okk = timed(best)
            results[best] = {**results[best],
                             **entry_for(reps, best, okk, best == "dft")}
        else:
            mxu, integ = _PALLAS_SPEC[best]
            reps = []
            for _ in range(N_REPS):
                t0 = time.perf_counter()
                _, _ap, okk = solve_comb_batch_pallas(
                    A0, mxu_precision=mxu, integrator=integ, **pk)
                reps.append(time.perf_counter() - t0)
            row = entry_for(reps, "dft", okk, True)
            results[best] = {**results[best], **row}
        return results[best]["instance_steps_per_s"]

    from bench import floor_retry

    FLOOR_INSTANCE_STEPS_PER_S = 15_000_000
    best_rate, floor_attempts, calibration = floor_retry(
        best_rate, _remeasure, FLOOR_INSTANCE_STEPS_PER_S, backend)
    best_rate = round(best_rate)
    # rk45/accuracy lanes need a *coupling* (the pallas entry is an engine)
    best_coupling = max(
        ("fft", "dft"), key=lambda k: results[k]["instance_steps_per_s"]
    )

    # --- rk45 adaptive lane (smaller batch; wall-clock depends on stiffness)
    cfg45 = psa.custom_simulation_config(
        z_max=Z_MAX_M, dz=Z_MAX_M / N_STEPS, save_every=SAVE_EVERY,
        precision=precision, integrator="rk45",
        rtol=1e-6 if precision == "x32" else 1e-9,
        atol=1e-10 if precision == "x32" else 1e-12,
    )
    B45 = min(512, BATCH)
    c45 = nw.NWaveCoeffs(
        gamma=gammas[:B45], alpha=np.full(B45, 5e-5),
        beta_lin=np.broadcast_to(np.asarray(coeffs1.beta_lin, float), (B45, N_LINES)),
    )
    nw.solve_comb_batch(cfg45, c45, A0[:B45], coupling=best_coupling)
    t0 = time.perf_counter()
    _, _, ok45 = nw.solve_comb_batch(cfg45, c45, A0[:B45], coupling=best_coupling)
    el45 = time.perf_counter() - t0
    rk45_combs_per_s = B45 / el45

    # rk45 fused DP45 kernel lane (round 4, ops/pallas_comb_adaptive.py);
    # large batch -- the adaptive kernel amortizes launch overhead
    rk45_kernel_combs_per_s = None
    if backend == "tpu":
        try:
            c45k = nw.NWaveCoeffs(
                gamma=gammas, alpha=np.full(BATCH, 5e-5),
                beta_lin=np.broadcast_to(
                    np.asarray(coeffs1.beta_lin, float), (BATCH, N_LINES)),
            )
            nw.solve_comb_batch(cfg45, c45k, A0, engine="pallas")
            t0 = time.perf_counter()
            _, _, ok45k = nw.solve_comb_batch(cfg45, c45k, A0,
                                              engine="pallas")
            el45k = time.perf_counter() - t0
            rk45_kernel_combs_per_s = round(BATCH / el45k, 1)
        except Exception as e:  # noqa: BLE001
            print(f"# rk45 kernel lane skipped: {e}", file=sys.stderr)

    # --- accuracy: subset vs x64 CPU (FFT coupling, reference-parity path) --
    max_rel_err = None
    try:
        cpu = jax.devices("cpu")
        sub = 8
        csub = nw.NWaveCoeffs(
            gamma=gammas[:sub], alpha=np.full(sub, 5e-5),
            beta_lin=np.broadcast_to(
                np.asarray(coeffs1.beta_lin, float), (sub, N_LINES)
            ),
        )
        _, A_fast, _ = nw.solve_comb_batch(cfg, csub, A0[:sub], coupling=best_coupling)
        if precision != "x64" and cpu:
            with jax.default_device(cpu[0]):
                cfg64 = psa.custom_simulation_config(
                    z_max=Z_MAX_M, dz=Z_MAX_M / N_STEPS, save_every=SAVE_EVERY,
                    precision="x64",
                )
                _, A_ref, _ = nw.solve_comb_batch(
                    cfg64, csub, A0[:sub], coupling="fft"
                )
            P_ref = np.abs(A_ref) ** 2
            sig = P_ref > 1e-6  # compare lines carrying real power

            def rel_err(A):
                P = np.abs(np.asarray(A)[:sub]) ** 2
                return float(np.max(np.abs(P[sig] / P_ref[sig] - 1.0)))

            max_rel_err = rel_err(A_fast)
            for lane, A_p in pallas_A.items():
                results[lane]["max_rel_power_err_vs_x64"] = rel_err(A_p)
    except Exception as e:  # noqa: BLE001
        print(f"# comb accuracy cross-check skipped: {e}", file=sys.stderr)

    meta = {
        "backend": backend,
        "precision": precision,
        "n_lines": N_LINES,
        "fft_len": nw._fft_len(N_LINES),
        "batch": BATCH,
        "rk4_steps": N_STEPS,
        "coupling_paths": results,
        "best_path": best,
        "best_coupling": best_coupling,
        "rk45_combs_per_s": round(rk45_combs_per_s, 1),
        "rk45_kernel_combs_per_s": rk45_kernel_combs_per_s,
        "rk45_ok_fraction": float(np.mean(ok45)),
        "subset_max_rel_power_err_vs_x64": max_rel_err,
        "flops_note": (
            "algorithmic real-FLOPs of the chosen formulation; dft path runs "
            "f32 matmuls at Precision.HIGHEST on the MXU"
        ),
    }
    # regression floor (CLAUDE.md): median best-engine rate on TPU must not
    # fall below 0.75x the 20.0M record -- flag loudly, don't hide it in
    # day noise (raised 10M -> 15M in round 4, VERDICT r3 #8: 3+ sessions
    # of medians on record justify the tighter band)
    meta["floor_instance_steps_per_s"] = FLOOR_INSTANCE_STEPS_PER_S
    meta["calibration"] = calibration
    meta["floor_attempts"] = floor_attempts
    meta["below_floor"] = bool(
        backend == "tpu" and best_rate < meta["floor_instance_steps_per_s"]
    )
    if meta["below_floor"]:
        print(
            f"# REGRESSION WARNING: comb {best_rate} inst-steps/s is below "
            f"the 15M floor (record 20.0M)", file=sys.stderr,
        )
    print(f"# {json.dumps(meta)}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "comb_rk4_instance_steps_per_s",
                "value": best_rate,
                "unit": f"instance-steps/s (N={N_LINES} lines)",
                "vs_baseline": round(best_rate / BASELINE_STEPS_PER_S, 1),
                "below_floor": meta["below_floor"],
                "env_degraded": bool(calibration and calibration["degraded"]),
            }
        )
    )


if __name__ == "__main__":
    main()
