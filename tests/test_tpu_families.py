"""On-chip (PSA_TEST_TPU=1) smoke lane for the round-2 model families.

Compact x32 end-to-end checks of every family added after the 4-wave
engines -- run on the real TPU via

    PSA_TEST_TPU=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/test_tpu_families.py -v

and recorded in TPU_TESTRUN.md.  Each test asserts physics, not just
"it ran": soliton invariance, adaptive-vs-fixed agreement, comb engine
consistency, the PIA quantum limit.  Skipped on CPU (the CPU suite covers
these paths at x64 with tight oracles; this lane is chip evidence).
"""

import os

import numpy as np
import pytest

import psa_tpu as psa

if os.environ.get("PSA_TEST_TPU", "0") != "1":
    pytest.skip("on-chip lane (set PSA_TEST_TPU=1 on a TPU host)",
                allow_module_level=True)

T0, BETA2, GAM = 1e-12, -2.0e-26, 2e-3


def _cfg(**kw):
    base = dict(z_max=10.0, dz=0.05, save_every=50, precision="x32")
    base.update(kw)
    return psa.custom_simulation_config(**base)


def test_gnlse_soliton_and_raman_on_chip():
    grid = psa.TimeGrid.for_pulse(T0, n_samples=512)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    co = psa.make_gnlse_coeffs(grid, disp, gamma_W_m=GAM, precision="x32")
    P0 = psa.soliton_peak_power(BETA2, GAM, T0)
    A0 = np.stack([np.asarray(psa.sech_pulse(grid, peak_W=s * P0, t0_s=T0))
                   for s in np.linspace(0.8, 1.2, 16)])
    pk, Al, ok = psa.solve_gnlse_batch(_cfg(), co, A0)
    assert ok.all()
    # fundamental-soliton lane: peak invariant to f32 accumulation error
    i1 = 8  # scale closest to 1.0 in the linspace grid
    assert pk[i1] == pytest.approx((np.abs(A0[i1]) ** 2).max(), rel=2e-3)
    # Raman red shift on chip
    nl = psa.make_nl_terms(grid, f_raman=0.18, precision="x32")
    _, Ar, okr = psa.solve_gnlse_batch(_cfg(), co, A0[i1:i1 + 1], nl=nl)
    assert okr.all()
    om = grid.omega()
    S0 = np.abs(np.fft.fft(A0[i1])) ** 2
    S1 = np.abs(np.fft.fft(Ar[0])) ** 2
    assert (om * S1).sum() / S1.sum() < (om * S0).sum() / S0.sum()


def test_gnlse_adaptive_matches_fixed_on_chip():
    grid = psa.TimeGrid.for_pulse(T0, n_samples=512)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    co = psa.make_gnlse_coeffs(grid, disp, gamma_W_m=GAM, precision="x32")
    P0 = psa.soliton_peak_power(BETA2, GAM, T0)
    A0 = np.stack([np.asarray(psa.sech_pulse(grid, peak_W=s * P0, t0_s=T0))
                   for s in np.linspace(0.7, 1.3, 8)])
    pk4, _, _ = psa.solve_gnlse_batch(_cfg(), co, A0)
    pk5, _, ok5 = psa.solve_gnlse_batch(
        _cfg(integrator="rk45", rtol=1e-5, atol=1e-8), co, A0
    )
    assert ok5.all()
    np.testing.assert_allclose(pk5, pk4, rtol=1e-3)


def test_vgnlse_manakov_on_chip():
    grid = psa.TimeGrid.for_pulse(T0, n_samples=512)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    co = psa.make_vgnlse_coeffs(grid, disp, gamma_W_m=GAM,
                                coupling="manakov", precision="x32")
    P0 = psa.manakov_soliton_peak_power(BETA2, GAM, T0)
    sech = psa.sech_pulse(grid, peak_W=P0, t0_s=T0)
    A0 = np.stack([np.asarray(psa.polarized_pulse(sech, th))
                   for th in np.linspace(0.0, np.pi / 2, 8)])
    pk, Al, ok = psa.solve_vgnlse_batch(_cfg(dz=0.01, save_every=100), co, A0)
    assert ok.all()
    # Manakov soliton peak invariant at every polarization angle
    np.testing.assert_allclose(
        pk, (np.abs(A0) ** 2).max(axis=-1), rtol=2e-3
    )


def test_comb_pallas_vs_scan_on_chip():
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import nwave as nw

    grid = nw.CombGrid.centered(2 * np.pi * 193.1e12, 2 * np.pi * 50e9, 32)
    disp = psa.DispersionParams.from_betas(2 * np.pi * 193.1e12,
                                           beta2=-1e-27)
    co1 = nw.make_comb_coeffs(grid, disp, gamma_W_m=10e-3, alpha_1_m=0.0,
                              precision="x32")
    c = 16
    A0 = np.stack([nw.seed_comb(grid, pump_lines={c - 2: 0.3, c + 2: 0.3,
                                                  c: 1e-5})] * 8)
    co = nw.NWaveCoeffs(
        gamma=np.linspace(8e-3, 12e-3, 8), alpha=np.zeros(8),
        beta_lin=np.broadcast_to(np.asarray(co1.beta_lin, float), (8, 32)),
    )
    cfg = psa.custom_simulation_config(z_max=50.0, dz=0.05, save_every=100,
                                       precision="x32")
    Ps, As, oks = nw.solve_comb_batch(cfg, co, A0, engine="scan")
    Pp, Ap, okp = nw.solve_comb_batch(cfg, co, A0, engine="pallas")
    assert oks.all() and okp.all()
    sig = Ps > 1e-8
    np.testing.assert_allclose(Pp[sig], Ps[sig], rtol=5e-4)


def test_gnlse_pallas_kernel_on_chip():
    """Compiled fused SSFM kernel vs the scan engine, Kerr AND the
    in-kernel Raman/steepening RK4 (T=128 keeps the Mosaic compile under
    ~1 min; bench_gnlse.py covers the T=1024 record shape)."""
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn

    grid = psa.TimeGrid.for_pulse(T0, n_samples=128)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    co = psa.make_gnlse_coeffs(grid, disp, gamma_W_m=GAM, alpha_1_m=5e-5,
                               precision="x32")
    P0 = psa.soliton_peak_power(BETA2, GAM, T0)
    A0 = np.stack([np.asarray(psa.sech_pulse(grid, peak_W=s * P0, t0_s=T0))
                   for s in np.linspace(0.8, 1.2, 8)])
    cfg = _cfg(z_max=2.0, dz=0.01, save_every=50)
    for nl in (None, gn.make_nl_terms(grid, f_raman=0.18, omega0=1.2e15,
                                      precision="x32")):
        pk_s, Af_s, ok_s = psa.solve_gnlse_batch(cfg, co, A0, nl=nl,
                                                 engine="scan")
        pk_p, Af_p, ok_p = psa.solve_gnlse_batch(cfg, co, A0, nl=nl,
                                                 engine="pallas")
        assert ok_s.all() and ok_p.all()
        np.testing.assert_allclose(pk_p, pk_s, rtol=2e-3)
        scale = np.abs(Af_s).max()
        np.testing.assert_allclose(Af_p, Af_s, rtol=0, atol=2e-3 * scale)


def test_vgnlse_pallas_kernel_on_chip():
    """Compiled fused VECTOR SSFM kernel vs the scan engine: incoherent
    rotation, the coherent isotropic c-term (in-kernel pointwise RK4),
    and the generalized Raman/steepening operator (in-kernel RK4 with
    the total-power convolution).  T=128 keeps the Mosaic compile short."""
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import vgnlse as vgl

    grid = psa.TimeGrid.for_pulse(T0, n_samples=128)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    P0 = psa.manakov_soliton_peak_power(BETA2, GAM, T0)
    sech = psa.sech_pulse(grid, peak_W=P0, t0_s=T0)
    A0 = np.stack([np.asarray(psa.polarized_pulse(s * sech, th))
                   for s, th in zip(np.linspace(0.8, 1.2, 8),
                                    np.linspace(0.1, 1.4, 8))])
    cfg = _cfg(z_max=2.0, dz=0.01, save_every=50)
    nl32 = gn.make_nl_terms(grid, f_raman=0.18, omega0=1.2e15,
                            precision="x32")
    for coupling, nl in (("manakov", None), ("isotropic", None),
                         ("manakov", nl32)):
        co = psa.make_vgnlse_coeffs(grid, disp, gamma_W_m=GAM,
                                    alpha_1_m=5e-5, coupling=coupling,
                                    dbeta0_1_m=0.3, precision="x32")
        pk_s, Af_s, ok_s = vgl.solve_vgnlse_batch(cfg, co, A0, nl=nl,
                                                  engine="scan")
        pk_p, Af_p, ok_p = vgl.solve_vgnlse_batch(cfg, co, A0, nl=nl,
                                                  engine="pallas")
        assert ok_s.all() and ok_p.all()
        np.testing.assert_allclose(pk_p, pk_s, rtol=2e-3)
        scale = np.abs(Af_s).max()
        np.testing.assert_allclose(Af_p, Af_s, rtol=0, atol=2e-3 * scale)


def test_noise_pia_quantum_limit_on_chip():
    omega = np.asarray(psa.plan_from_wavelengths(1550e-9, 1552e-9, 1551e-9))
    cfg = psa.custom_simulation_config(z_max=200.0, dz=0.05, save_every=50,
                                       precision="x32")
    r = psa.noise_figure_monte_carlo(
        cfg, gamma=5e-3, alpha=0.0, omega=omega,
        p_in=[0.5, 0.5, 1e-6, 0.0], delta_beta=0.0, n_samples=8192,
        noisy_waves=(False, False, True, True), measure="signal", seed=9,
    )
    G = 10 ** (r.gain_db / 10.0)
    assert G > 1.5
    nf_theory = 10 * np.log10(2.0 - 1.0 / G)
    assert r.nf_db == pytest.approx(nf_theory, abs=0.2)


def test_pulse_squeezing_on_chip():
    """Soliton squeezing MC at x32 on the real chip: squeezes below vacuum
    at one soliton period, and the Langevin pure-loss channel preserves
    the vacuum ellipse (CPU x64 calibration: -5.97 dB; x32 -5.95)."""
    grid = psa.TimeGrid.for_pulse(T0, n_samples=128)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    co = psa.make_gnlse_coeffs(grid, disp, gamma_W_m=GAM, precision="x32")
    P0 = psa.soliton_peak_power(BETA2, GAM, T0)
    A0 = np.asarray(psa.sech_pulse(grid, peak_W=P0, t0_s=T0))
    zs = 0.5 * np.pi * T0**2 / abs(BETA2)
    cfg = psa.custom_simulation_config(z_max=zs, dz=zs / 200, save_every=200,
                                       precision="x32")
    r = psa.pulse_squeezing_monte_carlo(cfg, co, A0, grid, omega0=1.2e15,
                                        n_samples=1024, seed=3)
    assert r.stats.squeezing_db < -4.0
    assert r.stats.uncertainty_product >= (1.0 / 16.0) * (1.0 - 1e-6)
    # langevin vacuum preservation on a pure-loss channel
    eta = 0.25
    col = psa.make_gnlse_coeffs(grid, None, gamma_W_m=0.0,
                                alpha_1_m=-np.log(eta) / 100.0,
                                precision="x32")
    cfg2 = psa.custom_simulation_config(z_max=100.0, dz=1.0, save_every=20,
                                        precision="x32")
    rl = psa.pulse_squeezing_monte_carlo(
        cfg2, col, np.full(128, 1.0 + 0j), grid, omega0=1.2e15,
        n_samples=2048, seed=1, loss_model="langevin", n_loss_segments=10)
    v = 0.5 * (rl.stats.v_min + rl.stats.v_max)
    assert abs(v - 0.25) < 4 * 0.25 * np.sqrt(2.0 / 2048)


def test_lle_soliton_and_rk4ip_on_chip():
    """LLE on the real chip: soliton persistence at x32 (peak ~ 2 Delta,
    power balance), the detuning-batch reduce path, and Strang-vs-rk4ip
    cross-engine agreement."""
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import lle

    grid = lle.TimeGrid(n_samples=256, t_window_s=20.0)
    det, F = 4.0, 2.0
    seed = lle.soliton_ansatz(grid, det, F, -1.0)
    co = lle.make_lle_coeffs(grid, detuning=det, pump=F, d2=-1.0,
                             precision="x32")
    cfg = psa.custom_simulation_config(z_max=20.0, dz=0.01, save_every=2000,
                                       precision="x32")
    t, psi = lle.run_lle_simulation(cfg, co, seed)
    pk = float(np.max(np.abs(psi[-1]) ** 2))
    bg = lle.cw_steady_states(det, F)[0]
    assert abs(pk - 2 * det) / (2 * det) < 0.15 and pk > 10 * bg
    m = np.mean(np.abs(psi[-1]) ** 2)
    drv = np.real(F * np.mean(np.conj(psi[-1])))
    assert m == pytest.approx(drv, rel=1e-3)
    # batched detuning scan (reduce mode) agrees with the trajectory run
    det_b = np.array([det, det])
    co_b = lle.make_lle_coeffs(grid, detuning=det_b, pump=F, d2=-1.0,
                               precision="x32")
    pk_b, Al, ok = lle.solve_lle_batch(cfg, co_b, np.stack([seed, seed]))
    assert ok.all()
    np.testing.assert_allclose(np.abs(Al[0]), np.abs(psi[-1]), rtol=2e-4,
                               atol=1e-6)
    # rk4ip engine lands on the same attractor
    cfg_ip = psa.custom_simulation_config(z_max=20.0, dz=0.01,
                                          save_every=2000, precision="x32",
                                          integrator="rk4ip")
    _, psi_ip = lle.run_lle_simulation(cfg_ip, co, seed)
    assert float(np.max(np.abs(psi_ip[-1]) ** 2)) == pytest.approx(pk,
                                                                   rel=1e-2)
