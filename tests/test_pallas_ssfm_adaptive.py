"""Fused adaptive SSFM kernel (``ops/pallas_ssfm_adaptive.py``, round 5):
interpret-mode contract tests vs the scan adaptive engines.

The kernel runs the Sinkin step-doubling controller in one pallas_call;
in interpret mode (CPU) its arithmetic is f32 with HIGHEST dots, so
agreement with the scan engines is tolerance-class, not bitwise (the
controller takes the same steps only while f32/x64 rounding keeps the
accept decisions aligned).  The compiled lane is the TPU A/B in
BENCH_LLE.md / BENCH_GNLSE.md round 5.
"""

import numpy as np
import pytest

import psa_tpu as psa
from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn
from psa_simulation_ode_rk_mvp_dispersion_tpu.models import lle
from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.pallas_ssfm_adaptive import (
    solve_gnlse_batch_rk45_pallas,
    solve_lle_batch_rk45_pallas,
)

GRID = lle.TimeGrid(n_samples=256, t_window_s=20.0)


def _lle_setup(dets):
    co = lle.make_lle_coeffs(GRID, detuning=np.asarray(dets, float),
                             pump=2.0, d2=-1.0)
    psi0 = np.stack([lle.soliton_ansatz(GRID, d, 2.0, -1.0) for d in dets])
    return co, psi0


def test_lle_kernel_matches_scan_adaptive():
    co, psi0 = _lle_setup([4.0, 3.8, 4.2])
    cfg = psa.custom_simulation_config(
        z_max=1.0, dz=0.05, save_every=10, integrator="rk45",
        rtol=1e-6, atol=1e-9,
    )
    pk, psi_last, ok = lle.solve_lle_batch(cfg, co, psi0)
    # engine='pallas' routes through the adaptive kernel (interpret here)
    cfg32 = psa.custom_simulation_config(
        z_max=1.0, dz=0.05, save_every=10, integrator="rk45",
        rtol=1e-6, atol=1e-9, precision="x32",
    )
    pk_k, psi_k, ok_k = lle.solve_lle_batch(cfg32, co, psi0,
                                            engine="pallas")
    assert ok.all() and ok_k.all()
    scale = np.max(np.abs(psi_last))
    assert np.max(np.abs(psi_k - psi_last)) / scale < 5e-4
    np.testing.assert_allclose(pk_k, pk, rtol=5e-4)


def test_lle_kernel_accuracy_vs_fine_fixed_step():
    """Equal-tolerance accuracy: the kernel's rtol=1e-6 endpoint sits in
    the same error class vs a fine fixed-step truth as the scan rk45."""
    co, psi0 = _lle_setup([4.0])
    ref_cfg = psa.custom_simulation_config(z_max=1.0, dz=0.001,
                                           save_every=500)
    _, psi_ref = lle.run_lle_simulation(ref_cfg, lle.make_lle_coeffs(
        GRID, detuning=4.0, pump=2.0, d2=-1.0), psi0[0])
    r = solve_lle_batch_rk45_pallas(
        psi0, np.asarray(co.detuning, float),
        np.asarray(co.pump_re, float), np.asarray(co.pump_im, float),
        np.asarray(co.lin_phase, float),
        dt=0.05, n_steps=20, save_every=10, rtol=1e-6, atol=1e-9,
        interpret=True)
    assert r.ok.all()
    err = (np.max(np.abs(r.A_end[0] - psi_ref[-1]))
           / np.max(np.abs(psi_ref[-1])))
    assert err < 1e-4, err
    assert int(r.n_accepted[0]) > 20     # genuinely adaptive (h < dz grid)


def test_lle_kernel_trailing_partial_span():
    """Save-decimation contract: n_steps % save_every trailing steps are
    integrated (counters grow) but unsaved (A_end at the last saved
    point)."""
    co, psi0 = _lle_setup([4.0, 3.9])
    kw = dict(dt=0.05, save_every=10, rtol=1e-6, atol=1e-9,
              interpret=True)
    args = (psi0, np.asarray(co.detuning, float),
            np.asarray(co.pump_re, float), np.asarray(co.pump_im, float),
            np.asarray(co.lin_phase, float))
    r_grid = solve_lle_batch_rk45_pallas(*args, n_steps=20, **kw)
    r_tail = solve_lle_batch_rk45_pallas(*args, n_steps=24, **kw)
    np.testing.assert_allclose(r_tail.A_end, r_grid.A_end, rtol=0,
                               atol=1e-7 * np.max(np.abs(r_grid.A_end)))
    np.testing.assert_array_equal(r_tail.peak_max, r_grid.peak_max)
    assert (r_tail.n_accepted > r_grid.n_accepted).all()


def test_lle_kernel_nan_lane_masking():
    """A blown-up lane (huge pump) fails alone; healthy lanes match a
    healthy-only run."""
    dets = [4.0, 4.1]
    co, psi0 = _lle_setup(dets)
    pump_re = np.asarray(np.broadcast_to(co.pump_re, (2,)), float).copy()
    pump_re[1] = 1e25                     # runaway drive
    r = solve_lle_batch_rk45_pallas(
        psi0, np.asarray(co.detuning, float), pump_re,
        np.broadcast_to(np.asarray(co.pump_im, float), (2,)),
        np.asarray(co.lin_phase, float),
        dt=0.05, n_steps=20, save_every=10, rtol=1e-6, atol=1e-9,
        interpret=True)
    assert bool(r.ok[0]) and not bool(r.ok[1])
    r_h = solve_lle_batch_rk45_pallas(
        psi0[:1], np.asarray(co.detuning, float)[:1],
        np.broadcast_to(np.asarray(co.pump_re, float), (2,))[:1],
        np.broadcast_to(np.asarray(co.pump_im, float), (2,))[:1],
        np.asarray(co.lin_phase, float),
        dt=0.05, n_steps=20, save_every=10, rtol=1e-6, atol=1e-9,
        interpret=True)
    np.testing.assert_array_equal(r.A_end[0], r_h.A_end[0])


def test_lle_kernel_sharded_bit_identical():
    from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel.mesh import (
        default_mesh,
    )

    dets = np.linspace(3.6, 4.4, 8)
    co, psi0 = _lle_setup(dets)
    args = (psi0, np.asarray(co.detuning, float),
            np.broadcast_to(np.asarray(co.pump_re, float), (8,)),
            np.broadcast_to(np.asarray(co.pump_im, float), (8,)),
            np.asarray(co.lin_phase, float))
    kw = dict(dt=0.05, n_steps=20, save_every=10, rtol=1e-6, atol=1e-9,
              interpret=True)
    r = solve_lle_batch_rk45_pallas(*args, **kw)
    r_s = solve_lle_batch_rk45_pallas(*args, mesh=default_mesh(), **kw)
    np.testing.assert_array_equal(r_s.A_end, r.A_end)
    np.testing.assert_array_equal(r_s.ok, r.ok)
    np.testing.assert_array_equal(r_s.n_accepted, r.n_accepted)


def test_gnlse_kernel_matches_scan_adaptive():
    g = gn.TimeGrid.for_pulse(1e-12, n_samples=512)
    disp = psa.DispersionParams.from_betas(2 * np.pi * 193.1e12,
                                           beta2=-2e-26)
    co = gn.make_gnlse_coeffs(g, disp, gamma_W_m=1.3e-3, alpha_1_m=5e-5)
    A0 = np.stack([gn.sech_pulse(g, peak_W=p, t0_s=1e-12)
                   for p in (50.0, 80.0)])
    cfg = psa.custom_simulation_config(
        z_max=20.0, dz=0.5, save_every=10, integrator="rk45",
        rtol=1e-6, atol=1e-9,
    )
    pk, A_last, ok = gn.solve_gnlse_batch(cfg, co, A0)
    cfg32 = psa.custom_simulation_config(
        z_max=20.0, dz=0.5, save_every=10, integrator="rk45",
        rtol=1e-6, atol=1e-9, precision="x32",
    )
    pk_k, A_k, ok_k = gn.solve_gnlse_batch(cfg32, co, A0, engine="pallas")
    assert ok.all() and ok_k.all()
    assert np.max(np.abs(A_k - A_last)) / np.max(np.abs(A_last)) < 5e-4
    np.testing.assert_allclose(pk_k, pk, rtol=5e-4)


def test_gnlse_kernel_rejects_unsupported():
    g = gn.TimeGrid.for_pulse(1e-12, n_samples=512)
    disp = psa.DispersionParams.from_betas(2 * np.pi * 193.1e12,
                                           beta2=-2e-26)
    co = gn.make_gnlse_coeffs(g, disp, gamma_W_m=1.3e-3, alpha_1_m=5e-5)
    A0 = gn.sech_pulse(g, peak_W=50.0, t0_s=1e-12)[None]
    cfg = psa.custom_simulation_config(
        z_max=1.0, dz=0.5, save_every=2, integrator="rk45",
        rtol=1e-6, atol=1e-9, precision="x32",
    )
    nl = gn.make_nl_terms(g, f_raman=0.18)
    with pytest.raises(ValueError, match="Kerr-only"):
        gn.solve_gnlse_batch(cfg, co, A0, engine="pallas", nl=nl)
    with pytest.raises(ValueError, match="multiple of 128|scan"):
        solve_gnlse_batch_rk45_pallas(
            A0[:, :100], 1.3e-3, 5e-5, np.zeros(100), dz_m=0.5,
            n_steps=2, save_every=2, rtol=1e-6, atol=1e-9,
            interpret=True)
