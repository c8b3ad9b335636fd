"""Longitudinal-fluctuation Monte Carlo (parallel/fluctuations.py).

The composition oracle is exact: with zero fluctuation the S-segment solve
(with the inter-segment sideband phase rotations) must equal the single
continuous solve to roundoff — this pins the accumulated-mismatch-phase
algebra.  The physics oracle: at the optimal mismatch (kappa = dbeta +
gamma(P1+P2) = 0) fluctuations monotonically degrade the mean gain and
widen the spread.
"""

import numpy as np
import pytest

import psa_tpu as psa
from psa_simulation_ode_rk_mvp_dispersion_tpu.models.fwm4 import (
    make_initial_amplitudes,
)
from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.rhs import RHSCoeffs
from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel import fluctuations as fl
from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel.sweep import solve_batch

GAMMA, P_IN = 5e-3, [0.5, 0.5, 1e-6, 0.0]
DB_OPT = -5e-3  # kappa = 0 for gamma (P1+P2) = 5e-3


def _cfg(**kw):
    base = dict(z_max=200.0, dz=0.05, save_every=50)
    base.update(kw)
    return psa.custom_simulation_config(**base)


def test_zero_sigma_segmented_equals_continuous():
    """8 composed segments with the phase-rotation bookkeeping == one
    continuous solve, to integration roundoff (pins the Phi_s algebra;
    measured 1.3e-14)."""
    cfg = _cfg()
    db0 = 0.05  # deliberately nonzero so the phase rotations matter
    r = fl.gain_ripple_monte_carlo(
        cfg, gamma=GAMMA, alpha=1e-4, p_in=P_IN, delta_beta_mean=db0,
        sigma_dbeta=0.0, n_segments=8, n_realizations=4, seed=1,
    )
    A0 = np.asarray(make_initial_amplitudes(P_IN, np.zeros(4)))[None]
    rc = solve_batch(
        cfg, RHSCoeffs(gamma=np.full(1, GAMMA), alpha=np.full(1, 1e-4),
                       delta_beta=np.full(1, db0)), A0,
    )
    g_cont = 10 * np.log10(np.abs(rc.A_end[0, 2]) ** 2 / P_IN[2])
    assert r.gain_nominal_db == pytest.approx(g_cont, abs=1e-10)
    np.testing.assert_allclose(r.gain_db, r.gain_nominal_db, atol=1e-9)


def test_fluctuations_degrade_gain_at_optimum_monotonically():
    cfg = _cfg()
    means, stds = [], []
    for sig in (0.002, 0.01, 0.05):
        r = fl.gain_ripple_monte_carlo(
            cfg, gamma=GAMMA, alpha=0.0, p_in=P_IN, delta_beta_mean=DB_OPT,
            sigma_dbeta=sig, n_segments=8, n_realizations=256, seed=2,
        )
        assert r.ok.all()
        means.append(r.gain_mean_db)
        stds.append(r.gain_std_db)
        assert r.gain_mean_db < r.gain_nominal_db + 1e-6
    assert means[0] > means[1] > means[2]   # more wander, less mean gain
    assert stds[0] < stds[1] < stds[2]      # ...and more spread
    assert r.gain_p5_db < r.gain_mean_db < r.gain_p95_db


def test_fused_matches_host_composed_path():
    """The single-program fused path (engine='auto', lax.scan over segments)
    and the host-composed per-segment path (engine='scan') run the same
    draws (same seed) and must agree at integration precision."""
    cfg = _cfg()
    kw = dict(gamma=GAMMA, alpha=1e-4, p_in=P_IN, delta_beta_mean=DB_OPT,
              sigma_dbeta=0.02, n_segments=8, n_realizations=64, seed=5)
    r_fused = fl.gain_ripple_monte_carlo(cfg, engine="auto", **kw)
    r_host = fl.gain_ripple_monte_carlo(cfg, engine="scan", **kw)
    np.testing.assert_array_equal(r_fused.ok, r_host.ok)
    np.testing.assert_allclose(r_fused.gain_db, r_host.gain_db, atol=1e-9)
    assert r_fused.gain_mean_db == pytest.approx(r_host.gain_mean_db,
                                                 abs=1e-9)


def test_validation():
    cfg = _cfg()
    kw = dict(gamma=GAMMA, alpha=0.0, delta_beta_mean=0.0, sigma_dbeta=0.01)
    with pytest.raises(ValueError, match="signal needs nonzero"):
        fl.gain_ripple_monte_carlo(cfg, p_in=[0.5, 0.5, 0.0, 0.0],
                                   n_segments=4, **kw)
    with pytest.raises(ValueError, match="whole segments"):
        fl.gain_ripple_monte_carlo(cfg, p_in=P_IN, n_segments=7, **kw)
    with pytest.raises(ValueError, match="save_every"):
        fl.gain_ripple_monte_carlo(_cfg(save_every=300), p_in=P_IN,
                                   n_segments=8, **kw)


def test_df32_request_routes_to_compensated_engine(monkeypatch):
    """A cfg requesting the df32 tier must NOT run the fused f32 ripple
    solver (ADVICE r2): it falls through to the host-composed path whose
    solve_batch dispatches the compensated two-float engine.  Verified by
    stubbing solve_batch and asserting the fused solver is never built."""
    import dataclasses as dc

    import psa_tpu as psa
    from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel import fluctuations

    calls = []

    def fake_solve_batch(cfg, coeffs, A, mesh=None, engine="auto"):
        calls.append((cfg.precision, engine, mesh))
        B = A.shape[0]
        return type("R", (), {
            "ok": np.ones(B, dtype=bool),
            "A_end": np.asarray(A) * 0.9,
            "P_end": np.abs(np.asarray(A) * 0.9) ** 2,
        })()

    def boom(*a, **k):
        raise AssertionError("fused f32 solver must not run for df32")

    monkeypatch.setattr(fluctuations, "solve_batch", fake_solve_batch)
    monkeypatch.setattr(fluctuations, "_ripple_solver", boom)

    cfg = dc.replace(
        psa.custom_simulation_config(z_max=10.0, dz=0.1, save_every=10),
        precision="df32",
    )
    res = fluctuations.gain_ripple_monte_carlo(
        cfg, gamma=0.01, alpha=0.0, p_in=[0.1, 0.1, 1e-4, 0.0],
        delta_beta_mean=0.0, sigma_dbeta=0.01, n_segments=2,
        n_realizations=4, seed=0,
    )
    assert len(calls) == 2                       # one solve per segment
    assert all(c[0] == "df32" for c in calls)
    assert np.isfinite(res.gain_mean_db)
