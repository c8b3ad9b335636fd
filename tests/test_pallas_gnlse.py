"""Fused pallas SSFM (GNLSE Kerr) kernel tests -- interpreter mode on CPU;
the compiled kernel is exercised on TPU by ``bench_gnlse.py`` and the
``PSA_TEST_TPU=1`` lane."""

import jax
import numpy as np
import pytest

import psa_tpu as psa
from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn
from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.pallas_gnlse import (
    solve_gnlse_batch_pallas,
)
from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel import mesh as pm

T0 = 1e-12
BETA2 = -2.0e-26
GAMMA = 2e-3
ALPHA = 5e-5

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode parity vs the x32 scan engine runs on CPU; "
    "on-chip coverage is bench_gnlse.py / the PSA_TEST_TPU lane",
)


def _setup(B, T=256):
    grid = gn.TimeGrid.for_pulse(T0, n_samples=T)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    co = gn.make_gnlse_coeffs(grid, disp, gamma_W_m=GAMMA, alpha_1_m=ALPHA,
                              precision="x32")
    P0 = gn.soliton_peak_power(BETA2, GAMMA, T0)
    scales = np.linspace(0.5, 1.5, B)
    A0 = (np.sqrt(scales * P0)[:, None]
          / np.cosh(grid.t()[None, :] / T0)).astype(np.complex128)
    return grid, co, A0


def _cfg(n_steps=10, save_every=3, zmax=0.1, **kw):
    return psa.custom_simulation_config(
        z_max=zmax, dz=zmax / n_steps, save_every=save_every,
        precision="x32", **kw)


def test_kernel_matches_scan_engine():
    """Includes a trailing partial chunk (10 steps, save_every=3)."""
    _grid, co, A0 = _setup(B=5)
    cfg = _cfg()
    pk_s, Af_s, ok_s = gn.solve_gnlse_batch(cfg, co, A0)
    pk_p, Af_p, ok_p = solve_gnlse_batch_pallas(
        A0, GAMMA, ALPHA, np.asarray(co.lin_phase),
        dz_m=cfg.dz, n_steps=10, save_every=3, interpret=True)
    assert np.array_equal(ok_s, ok_p)
    np.testing.assert_allclose(pk_p, pk_s, rtol=1e-4)
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))


def test_public_engine_dispatch_and_validation():
    _grid, co, A0 = _setup(B=4)
    cfg = _cfg()
    pk_p, Af_p, ok_p = gn.solve_gnlse_batch(cfg, co, A0, engine="pallas")
    pk_s, Af_s, ok_s = gn.solve_gnlse_batch(cfg, co, A0, engine="scan")
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))
    with pytest.raises(ValueError, match="engine"):
        gn.solve_gnlse_batch(cfg, co, A0, engine="bogus")
    # rk45 + pallas routes to the round-5 adaptive kernel; other adaptive
    # integrators still refuse the kernel path
    with pytest.raises(ValueError, match="fixed-step"):
        gn.solve_gnlse_batch(_cfg(integrator="rk4ip45", rtol=1e-5,
                                  atol=1e-9),
                             co, A0, engine="pallas")
    with pytest.raises(ValueError, match="x32"):
        co64 = gn.make_gnlse_coeffs(
            gn.TimeGrid.for_pulse(T0, n_samples=256),
            psa.DispersionParams.from_betas(1.2e15, beta2=BETA2),
            gamma_W_m=GAMMA, precision="x64")
        gn.solve_gnlse_batch(
            psa.custom_simulation_config(z_max=0.1, dz=0.01, precision="x64"),
            co64, A0, engine="pallas")
    with pytest.raises(ValueError, match="multiple of 128"):
        solve_gnlse_batch_pallas(
            A0[:, :200], GAMMA, ALPHA, np.asarray(co.lin_phase)[:200],
            dz_m=0.01, n_steps=5, save_every=5, interpret=True)
    with pytest.raises(ValueError, match="too wide"):
        solve_gnlse_batch_pallas(
            np.zeros((2, 4096), complex), GAMMA, ALPHA, np.zeros(4096),
            dz_m=0.01, n_steps=5, save_every=5, interpret=True)


@pytest.mark.parametrize("f_raman,omega0", [
    (0.18, 1.2e15),   # full generalized operator (Raman + steepening)
    (0.18, None),     # Raman only
    (0.0, 1.2e15),    # self-steepening only
    (0.0, None),      # RK4 pure-Kerr (nl given, both terms statically off)
])
def test_nl_kernel_matches_scan_engine(f_raman, omega0):
    """The in-kernel RK4 on the generalized nonlinear operator must match
    the scan engine's ``_nl_substep`` path; T=256 exercises the r=2
    cross-group/twiddle machinery for every static term combination."""
    grid, co, A0 = _setup(B=4)
    nl = gn.make_nl_terms(grid, f_raman=f_raman, omega0=omega0,
                          precision="x32")
    cfg = _cfg()
    pk_s, Af_s, ok_s = gn.solve_gnlse_batch(cfg, co, A0, nl=nl, engine="scan")
    pk_p, Af_p, ok_p = gn.solve_gnlse_batch(cfg, co, A0, nl=nl,
                                            engine="pallas")
    assert np.array_equal(ok_s, ok_p)
    np.testing.assert_allclose(pk_p, pk_s, rtol=1e-4)
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))


def test_nl_sharded_matches_unsharded():
    """nl planes are replicated over the mesh (lane-width-1).  Unlike the
    Kerr path, sharded-vs-unsharded is NOT asserted bitwise: shard_map
    wraps the kernel in a different XLA program whose fusion around the
    steepening combine reassociates f32 FMAs (measured ~3 ULP at peak
    scale on XLA:CPU); the contract is per-shard determinism plus
    ULP-scale agreement."""
    grid, co, A0 = _setup(B=6)
    nl = gn.make_nl_terms(grid, f_raman=0.18, omega0=1.2e15,
                          precision="x32")
    kw = dict(dz_m=0.01, n_steps=4, save_every=2, interpret=True, nl=nl)
    pk, Af, ok = solve_gnlse_batch_pallas(
        A0, GAMMA, ALPHA, np.asarray(co.lin_phase), **kw)
    pk_s, Af_s, ok_s = solve_gnlse_batch_pallas(
        A0, GAMMA, ALPHA, np.asarray(co.lin_phase),
        mesh=pm.default_mesh(), **kw)
    scale = np.max(np.abs(Af))
    np.testing.assert_allclose(Af_s, Af, rtol=0, atol=1e-5 * scale)
    np.testing.assert_allclose(pk_s, pk, rtol=1e-6)
    np.testing.assert_array_equal(ok_s, ok)


def test_per_instance_and_spectral_coeffs():
    """Per-instance gamma + flat per-instance alpha + spectral alpha all
    collapse into the kernel's factor planes; parity vs the scan engine."""
    grid, _co, A0 = _setup(B=4)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    om = grid.omega()
    spec = 1e-4 * (om / np.abs(om).max()) ** 2
    co = gn.make_gnlse_coeffs(grid, disp, gamma_W_m=1.0, alpha_1_m=2e-5,
                              alpha_spec_1_m=spec, precision="x32")
    gam_b = np.linspace(1e-3, 3e-3, 4)
    import dataclasses

    import jax.numpy as jnp
    co = dataclasses.replace(co, gamma=jnp.asarray(gam_b, jnp.float32))
    cfg = _cfg()
    pk_s, Af_s, ok_s = gn.solve_gnlse_batch(cfg, co, A0, engine="scan")
    pk_p, Af_p, ok_p = gn.solve_gnlse_batch(cfg, co, A0, engine="pallas")
    assert np.array_equal(ok_s, ok_p)
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))


def test_nan_lane_freeze_matches_scan():
    """A runaway-gain lane (negative alpha) overflows f32; the kernel must
    freeze it at its last good chunk boundary exactly like the scan engine."""
    _grid, co, A0 = _setup(B=3)
    alpha = np.array([ALPHA, -4000.0, ALPHA])   # lane 1 blows up
    import dataclasses

    import jax.numpy as jnp
    co = dataclasses.replace(co, alpha=jnp.asarray(alpha, jnp.float32))
    cfg = _cfg(n_steps=12, save_every=3, zmax=1.2, check_nan=False)
    pk_s, Af_s, ok_s = gn.solve_gnlse_batch(cfg, co, A0, engine="scan")
    pk_p, Af_p, ok_p = gn.solve_gnlse_batch(cfg, co, A0, engine="pallas")
    assert not ok_s[1] and np.array_equal(ok_s, ok_p)
    assert np.all(np.isfinite(Af_p))
    np.testing.assert_allclose(Af_p[ok_s], Af_s[ok_s], rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s[ok_s])))


def test_lane_padding_exact():
    """Non-multiple-of-128 batches pad internally and slice back exactly."""
    _grid, co, A0 = _setup(B=5)
    pk5, Af5, ok5 = solve_gnlse_batch_pallas(
        A0, GAMMA, ALPHA, np.asarray(co.lin_phase),
        dz_m=0.01, n_steps=6, save_every=2, interpret=True)
    pk1, Af1, ok1 = solve_gnlse_batch_pallas(
        A0[:1], GAMMA, ALPHA, np.asarray(co.lin_phase),
        dz_m=0.01, n_steps=6, save_every=2, interpret=True)
    np.testing.assert_allclose(Af5[0], Af1[0], rtol=0, atol=0)
    np.testing.assert_allclose(pk5[0], pk1[0], rtol=0)


def test_sharded_matches_unsharded():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    _grid, co, A0 = _setup(B=6)
    pk, Af, ok = solve_gnlse_batch_pallas(
        A0, GAMMA, ALPHA, np.asarray(co.lin_phase),
        dz_m=0.01, n_steps=4, save_every=2, interpret=True)
    pk_s, Af_s, ok_s = solve_gnlse_batch_pallas(
        A0, GAMMA, ALPHA, np.asarray(co.lin_phase),
        dz_m=0.01, n_steps=4, save_every=2, interpret=True,
        mesh=pm.default_mesh())
    np.testing.assert_allclose(Af_s, Af, rtol=0, atol=0)
    np.testing.assert_allclose(pk_s, pk, rtol=0)
    np.testing.assert_array_equal(ok_s, ok)


def test_xgroup_fft_matches_fma():
    """Radix-2 cross-group FFT (opt-in A/B path) vs the dense FMA
    cross-group DFT (default) at r=4 (T=512): same kernel up to summation
    order."""
    from psa_simulation_ode_rk_mvp_dispersion_tpu.ops import (
        pallas_gnlse as pg,
    )

    _grid, co, A0 = _setup(B=3, T=512)

    def run():
        return solve_gnlse_batch_pallas(
            A0, GAMMA, ALPHA, np.asarray(co.lin_phase),
            dz_m=0.01, n_steps=6, save_every=2, interpret=True)

    assert pg.XGROUP == "fma"          # measured default (v5e A/B)
    pk_d, Af_d, ok_d = run()
    pg.XGROUP = "fft"
    pg._pallas_gnlse_solver.cache_clear()
    try:
        pk_f, Af_f, ok_f = run()
    finally:
        pg.XGROUP = "fma"
        pg._pallas_gnlse_solver.cache_clear()
    assert np.array_equal(ok_f, ok_d)
    np.testing.assert_allclose(pk_f, pk_d, rtol=1e-5)
    np.testing.assert_allclose(Af_f, Af_d, rtol=0,
                               atol=1e-5 * np.max(np.abs(Af_d)))
