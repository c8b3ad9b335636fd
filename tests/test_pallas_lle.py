"""Fused pallas LLE (driven-damped SSFM) kernel tests -- interpreter mode
on CPU; the compiled kernel is exercised on-chip by the ``PSA_TEST_TPU=1``
lane (TPU_TESTRUN.md)."""

import jax
import numpy as np
import pytest

import psa_tpu as psa
from psa_simulation_ode_rk_mvp_dispersion_tpu.models import lle
from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.pallas_lle import (
    solve_lle_batch_pallas,
)
from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel import mesh as pm

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode parity vs the x32 scan engine runs on CPU; "
    "on-chip coverage is the PSA_TEST_TPU lane",
)

DET, PUMP, D2 = 4.0, 2.2, -1.0


def _setup(B, T=256):
    """Detuning-scan lanes seeded from the soliton ansatz (T=256 exercises
    the r=2 cross-group/twiddle machinery)."""
    grid = lle.TimeGrid(n_samples=T, t_window_s=24.0)
    dets = np.linspace(DET - 0.5, DET + 0.5, B)
    co = lle.make_lle_coeffs(grid, detuning=dets, pump=PUMP, d2=D2,
                             precision="x32")
    psi0 = np.stack([lle.soliton_ansatz(grid, d, PUMP, D2) for d in dets])
    return grid, co, psi0


def _cfg(n_steps=10, save_every=3, t_max=0.5, **kw):
    return psa.custom_simulation_config(
        z_max=t_max, dz=t_max / n_steps, save_every=save_every,
        precision="x32", **kw)


def test_kernel_matches_scan_engine():
    """Per-instance detuning scan, complex pump, trailing partial chunk
    (10 steps, save_every=3)."""
    grid, co, psi0 = _setup(B=5)
    import dataclasses

    import jax.numpy as jnp
    co = dataclasses.replace(
        co, pump_re=jnp.asarray(PUMP * np.cos(0.3), jnp.float32),
        pump_im=jnp.asarray(PUMP * np.sin(0.3), jnp.float32))
    cfg = _cfg()
    pk_s, Af_s, ok_s = lle.solve_lle_batch(cfg, co, psi0, engine="scan")
    pk_p, Af_p, ok_p = lle.solve_lle_batch(cfg, co, psi0, engine="pallas")
    assert np.array_equal(ok_s, ok_p)
    np.testing.assert_allclose(pk_p, pk_s, rtol=1e-4)
    np.testing.assert_allclose(Af_p, Af_s, rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s)))


def test_engine_dispatch_and_validation():
    grid, co, psi0 = _setup(B=4)
    cfg = _cfg()
    with pytest.raises(ValueError, match="engine"):
        lle.solve_lle_batch(cfg, co, psi0, engine="bogus")
    with pytest.raises(ValueError, match="Strang"):
        lle.solve_lle_batch(_cfg(integrator="rk4ip"), co, psi0,
                            engine="pallas")
    with pytest.raises(ValueError, match="x32"):
        co64 = lle.make_lle_coeffs(grid, detuning=DET, pump=PUMP, d2=D2,
                                   precision="x64")
        lle.solve_lle_batch(
            psa.custom_simulation_config(z_max=0.5, dz=0.05,
                                         precision="x64"),
            co64, psi0, engine="pallas")
    with pytest.raises(ValueError, match="multiple of 128"):
        solve_lle_batch_pallas(
            psi0[:, :200], DET, PUMP, 0.0, np.zeros(200),
            dt=0.05, n_steps=5, save_every=5, interpret=True)
    with pytest.raises(ValueError, match="too wide"):
        solve_lle_batch_pallas(
            np.zeros((2, 4096), complex), DET, PUMP, 0.0, np.zeros(4096),
            dt=0.05, n_steps=5, save_every=5, interpret=True)


def test_soliton_persists_through_kernel():
    """Physics check straight through the kernel: a converged dissipative
    soliton stays a soliton (peak ~ 2*Delta, CW background on the lower
    branch) over 4 photon lifetimes."""
    grid, co, psi0 = _setup(B=1)
    cfg = _cfg(n_steps=400, save_every=100, t_max=4.0)
    pk, Af, ok = lle.solve_lle_batch(cfg, co, psi0[:1], engine="pallas")
    assert ok[0]
    # soliton peak power ~ 2*Delta (first-lane detuning DET - 0.5)
    assert 0.7 * 2.0 * (DET - 0.5) < pk[0] < 1.5 * 2.0 * DET
    # background stays near the CW lower branch
    rho = lle.cw_steady_states(DET - 0.5, PUMP)[0]
    edge = np.abs(Af[0, :16]) ** 2
    np.testing.assert_allclose(edge, rho, rtol=0.25)


def test_nan_lane_freeze_matches_scan():
    """A seed beyond f32 power range blows its lane up in the first Kerr
    substep; the kernel must flag and freeze it exactly like the scan
    engine while healthy lanes are untouched."""
    _grid, co, psi0 = _setup(B=3)
    psi0 = psi0.copy()
    psi0[1] *= 1e25          # |psi|^2 overflows f32 -> inf -> NaN rotation
    cfg = _cfg(n_steps=12, save_every=3, check_nan=False)
    pk_s, Af_s, ok_s = lle.solve_lle_batch(cfg, co, psi0, engine="scan")
    pk_p, Af_p, ok_p = lle.solve_lle_batch(cfg, co, psi0, engine="pallas")
    assert not ok_s[1] and np.array_equal(ok_s, ok_p)
    good = ok_s
    np.testing.assert_allclose(Af_p[good], Af_s[good], rtol=0,
                               atol=1e-4 * np.max(np.abs(Af_s[good])))


def test_lane_padding_exact():
    """Non-multiple-of-128 batches pad internally and slice back exactly."""
    _grid, co, psi0 = _setup(B=5)
    det = np.asarray(co.detuning, dtype=float)
    kw = dict(dt=0.05, n_steps=6, save_every=2, interpret=True)
    pk5, Af5, ok5 = solve_lle_batch_pallas(
        psi0, det, PUMP, 0.0, np.asarray(co.lin_phase), **kw)
    pk1, Af1, ok1 = solve_lle_batch_pallas(
        psi0[:1], det[:1], PUMP, 0.0, np.asarray(co.lin_phase), **kw)
    np.testing.assert_allclose(Af5[0], Af1[0], rtol=0, atol=0)
    np.testing.assert_allclose(pk5[0], pk1[0], rtol=0)


def test_sharded_matches_unsharded():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    _grid, co, psi0 = _setup(B=6)
    det = np.asarray(co.detuning, dtype=float)
    kw = dict(dt=0.05, n_steps=4, save_every=2, interpret=True)
    pk, Af, ok = solve_lle_batch_pallas(
        psi0, det, PUMP, 0.0, np.asarray(co.lin_phase), **kw)
    pk_s, Af_s, ok_s = solve_lle_batch_pallas(
        psi0, det, PUMP, 0.0, np.asarray(co.lin_phase),
        mesh=pm.default_mesh(), **kw)
    np.testing.assert_allclose(Af_s, Af, rtol=0, atol=0)
    np.testing.assert_allclose(pk_s, pk, rtol=0)
    np.testing.assert_array_equal(ok_s, ok)
