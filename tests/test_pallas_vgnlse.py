"""Fused pallas vector SSFM kernel tests -- interpreter mode on CPU; the
compiled kernel is exercised on TPU by ``bench_gnlse.py``'s vector lane /
the ``PSA_TEST_TPU=1`` lane."""

import jax
import numpy as np
import pytest

import psa_tpu as psa
from psa_simulation_ode_rk_mvp_dispersion_tpu.models import vgnlse as vg
from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.pallas_vgnlse import (
    solve_vgnlse_batch_pallas,
)
from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel import mesh as pm

T0 = 1e-12
BETA2 = -2.0e-26
GAMMA = 2e-3
ALPHA = 5e-5

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode parity vs the x32 scan engine runs on CPU",
)


def _setup(B, T=256, coupling="cnlse", theta=0.4, **coeff_kw):
    grid = vg.TimeGrid.for_pulse(T0, n_samples=T)
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    co = vg.make_vgnlse_coeffs(
        grid, disp, gamma_W_m=GAMMA, alpha_1_m=ALPHA, coupling=coupling,
        precision="x32", **coeff_kw)
    P0 = vg.manakov_soliton_peak_power(BETA2, GAMMA, T0)
    scales = np.linspace(0.5, 1.5, B)
    A = (np.sqrt(scales * P0)[:, None]
         / np.cosh(grid.t()[None, :] / T0)).astype(np.complex128)
    A0 = np.stack([np.cos(theta) * A, np.sin(theta) * A], axis=1)
    return grid, co, A0


def _cfg(n_steps=10, save_every=3, zmax=0.1, **kw):
    return psa.custom_simulation_config(
        z_max=zmax, dz=zmax / n_steps, save_every=save_every,
        precision="x32", **kw)


def _run_kernel(cfg, co, A0, n_steps=10, save_every=3, **kw):
    return solve_vgnlse_batch_pallas(
        A0, np.asarray(co.gamma, float), np.asarray(co.alpha, float),
        np.asarray(co.lin_phase, float), float(np.asarray(co.b_xpm)),
        dz_m=cfg.dz, n_steps=n_steps, save_every=save_every,
        interpret=True, **kw)


@pytest.mark.parametrize("coupling", ["cnlse", "manakov"])
def test_kernel_matches_scan_engine(coupling):
    """Trailing partial chunk (10 steps, save_every=3) + birefringence."""
    _grid, co, A0 = _setup(B=4, coupling=coupling, dbeta0_1_m=0.3,
                           dbeta1_s_m=1e-13)
    cfg = _cfg()
    pk_s, Af_s, ok_s = vg.solve_vgnlse_batch(cfg, co, A0)
    pk_p, Af_p, ok_p = _run_kernel(cfg, co, A0)
    assert np.array_equal(ok_s, ok_p)
    np.testing.assert_allclose(pk_p, pk_s, rtol=1e-4)
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))


def test_spectral_per_pol_loss_and_per_instance_phase():
    """(2, T) spectral loss and (B, 2, T) per-instance phase planes."""
    B, T = 3, 256
    grid, co, A0 = _setup(B=B, T=T)
    rng = np.random.default_rng(7)
    al_spec = np.abs(rng.normal(0.0, 1e-4, size=(2, T)))
    disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
    co = vg.make_vgnlse_coeffs(grid, disp, gamma_W_m=GAMMA, alpha_1_m=ALPHA,
                               alpha_spec_1_m=al_spec, precision="x32")
    phase_b = np.broadcast_to(np.asarray(co.lin_phase, float),
                              (B, 2, T)).copy()
    phase_b *= np.linspace(0.9, 1.1, B)[:, None, None]
    co_b = vg.VGNLSECoeffs(
        gamma=co.gamma, alpha=co.alpha, b_xpm=co.b_xpm,
        lin_phase=phase_b.astype(np.float32), coherent=0.0)
    cfg = _cfg()
    pk_s, Af_s, ok_s = vg.solve_vgnlse_batch(cfg, co_b, A0)
    pk_p, Af_p, ok_p = _run_kernel(cfg, co_b, A0)
    assert np.array_equal(ok_s, ok_p)
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))


def test_public_engine_dispatch_and_validation():
    _grid, co, A0 = _setup(B=4)
    cfg = _cfg()
    pk_p, Af_p, ok_p = vg.solve_vgnlse_batch(cfg, co, A0, engine="pallas")
    pk_s, Af_s, ok_s = vg.solve_vgnlse_batch(cfg, co, A0, engine="scan")
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))
    np.testing.assert_allclose(pk_p, pk_s, rtol=1e-4)
    with pytest.raises(ValueError, match="engine"):
        vg.solve_vgnlse_batch(cfg, co, A0, engine="bogus")
    with pytest.raises(ValueError, match="rk4 only"):
        vg.solve_vgnlse_batch(
            _cfg(integrator="rk45", rtol=1e-5, atol=1e-9), co, A0,
            engine="pallas")
    with pytest.raises(ValueError, match="x32"):
        grid = vg.TimeGrid.for_pulse(T0, n_samples=256)
        disp = psa.DispersionParams.from_betas(1.2e15, beta2=BETA2)
        co64 = vg.make_vgnlse_coeffs(grid, disp, gamma_W_m=GAMMA,
                                     precision="x64")
        vg.solve_vgnlse_batch(
            psa.custom_simulation_config(z_max=0.1, dz=0.01,
                                         precision="x64"),
            co64, A0, engine="pallas")
    with pytest.raises(ValueError, match="multiple of 128"):
        _g, co_w, A0_w = _setup(B=4, T=200)
        _run_kernel(cfg, co_w, A0_w)


def test_isotropic_coherent_matches_scan_engine():
    """Full isotropic coupling (coherent c=1/3): the kernel's in-kernel
    pointwise RK4 must match the scan engine's RK4 substep
    (``models/vgnlse._v_nl_substep``), and the c-term's pointwise power
    exchange must conserve |A_x|^2 + |A_y|^2 per sample up to loss."""
    # dbeta0 drives the relative-phase drift that enables the c-term's
    # power exchange (2*dbeta0*z_max ~ 1.6 rad: strong, not averaged out)
    _grid, co, A0 = _setup(B=4, coupling="isotropic", theta=0.35,
                           dbeta0_1_m=8.0)
    assert float(co.coherent) != 0.0
    cfg = _cfg()
    pk_s, Af_s, ok_s = vg.solve_vgnlse_batch(cfg, co, A0, engine="scan")
    pk_p, Af_p, ok_p = vg.solve_vgnlse_batch(cfg, co, A0, engine="pallas")
    assert np.array_equal(ok_s, ok_p)
    np.testing.assert_allclose(pk_p, pk_s, rtol=1e-4)
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))
    # coherent exchange moved power between polarizations...
    p_in = np.abs(A0) ** 2
    p_out = np.abs(Af_p) ** 2
    frac_in = p_in.sum(-1)[:, 0] / p_in.sum(-1).sum(-1)
    frac_out = p_out.sum(-1)[:, 0] / p_out.sum(-1).sum(-1)
    # grows with instance power (lanes are 0.5..1.5 x soliton power)
    exch = np.abs(frac_out - frac_in)
    assert exch.max() > 1e-5 and exch.argmax() == 3
    # ...but the total energy only decays by the flat loss
    decay = np.exp(-ALPHA * cfg.z_max)
    np.testing.assert_allclose(p_out.sum((-2, -1)),
                               p_in.sum((-2, -1)) * decay, rtol=1e-3)


@pytest.mark.parametrize("f_r,steep,coupling", [
    (0.18, False, "manakov"),      # Raman only
    (0.0, True, "manakov"),        # self-steepening only
    (0.18, True, "cnlse"),         # both, birefringent incoherent model
    (0.18, True, "isotropic"),     # both + the coherent c-term
])
def test_generalized_nl_matches_scan_engine(f_r, steep, coupling):
    """In-kernel RK4 on the generalized vector operator vs the scan
    engine's _v_nl_rhs_gen RK4: same discrete method, so interpret-mode
    parity is roundoff-level (1e-4 of max amplitude at x32)."""
    import psa_tpu as _psa
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn

    grid, co, A0 = _setup(B=4, coupling=coupling, dbeta0_1_m=0.3)
    nl = gn.make_nl_terms(
        grid, f_raman=f_r, omega0=(1.2e15 if steep else None),
        precision="x32")
    cfg = _cfg()
    pk_s, Af_s, ok_s = vg.solve_vgnlse_batch(cfg, co, A0, nl=nl,
                                             engine="scan")
    pk_p, Af_p, ok_p = vg.solve_vgnlse_batch(cfg, co, A0, nl=nl,
                                             engine="pallas")
    assert np.array_equal(ok_s, ok_p)
    np.testing.assert_allclose(pk_p, pk_s, rtol=1e-4)
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))


def test_generalized_nl_sharded_matches_unsharded():
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import gnlse as gn
    from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.pallas_gnlse import (
        M_SUB,
    )

    mesh = pm.default_mesh()
    grid, co, A0 = _setup(B=2 * len(jax.devices()), T=2 * M_SUB)
    nl = gn.make_nl_terms(grid, f_raman=0.18, omega0=1.2e15,
                          precision="x32")
    cfg = _cfg(n_steps=6, save_every=2)
    kw = dict(n_steps=6, save_every=2, nl=nl)
    pk, Af, ok = _run_kernel(cfg, co, A0, **kw)
    pk_s, Af_s, ok_s = _run_kernel(cfg, co, A0, mesh=mesh, **kw)
    # ULP-close, NOT bitwise: the sharded program fuses the steepening
    # combine differently (same known behavior as the scalar kernel's
    # sharded NL path)
    np.testing.assert_allclose(Af_s, Af, rtol=0,
                               atol=1e-6 * np.max(np.abs(Af)))
    np.testing.assert_allclose(pk_s, pk, rtol=1e-6)
    np.testing.assert_array_equal(ok_s, ok)


def test_nan_lane_freezes_at_last_good_chunk():
    """A runaway-gain lane (negative alpha) overflows f32; the kernel must
    freeze it at its last good chunk boundary exactly like the scan engine
    (the Kerr rotation itself is unitary -- only the linear factor can
    blow up)."""
    import jax.numpy as jnp

    _grid, co, A0 = _setup(B=4)
    alpha = np.array([ALPHA, ALPHA, -4000.0, ALPHA])   # lane 2 blows up
    co_bad = vg.VGNLSECoeffs(
        gamma=co.gamma, alpha=jnp.asarray(alpha, jnp.float32),
        b_xpm=co.b_xpm, lin_phase=co.lin_phase, coherent=0.0)
    cfg = _cfg(n_steps=12, save_every=3, zmax=1.2, check_nan=False)
    pk_s, Af_s, ok_s = vg.solve_vgnlse_batch(cfg, co_bad, A0)
    pk_p, Af_p, ok_p = _run_kernel(cfg, co_bad, A0, n_steps=12, save_every=3)
    assert not ok_p[2] and ok_p[[0, 1, 3]].all()
    assert np.array_equal(ok_s, ok_p)
    assert np.isfinite(Af_p).all()
    np.testing.assert_allclose(
        Af_p[[0, 1, 3]], Af_s[[0, 1, 3]], rtol=0,
        atol=1e-4 * np.max(np.abs(Af_s[[0, 1, 3]])))


def test_sharded_matches_unsharded():
    mesh = pm.default_mesh()
    _grid, co, A0 = _setup(B=2 * len(jax.devices()))
    cfg = _cfg(n_steps=6, save_every=2)
    pk, Af, ok = _run_kernel(cfg, co, A0, n_steps=6, save_every=2)
    pk_s, Af_s, ok_s = _run_kernel(cfg, co, A0, n_steps=6, save_every=2,
                                   mesh=mesh)
    np.testing.assert_allclose(Af_s, Af, rtol=0, atol=0)
    np.testing.assert_allclose(pk_s, pk, rtol=0)
    np.testing.assert_array_equal(ok_s, ok)
