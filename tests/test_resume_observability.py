"""Checkpoint/resume continuity and observability utilities."""

import json

import numpy as np
import pytest

import psa_tpu as psa
from psa_simulation_ode_rk_mvp_dispersion_tpu.utils.observability import (
    ThroughputMeter,
    log_run,
)


def _inputs():
    omega = np.asarray(psa.plan_from_wavelengths(1550e-9, 1558e-9, 1553e-9))
    sp = psa.infer_symmetry_from_omegas(omega[0], omega[1], omega[2], omega[3])
    disp = psa.dispersion_params_from_D_S(
        lambda_ref_m=float(psa.lambda_from_omega(sp.omega_c)), D=0.1, S=0.02,
        D_units="ps/nm/km", S_units="ps/nm^2/km",
        omega_ref=float(np.asarray(sp.omega_c)),
    )
    return dict(
        gamma=0.0115, alpha=1.15e-4, omega=omega, dispersion=disp,
        p_in=[0.1, 0.1, 1e-6, 0.0], phase_in=np.zeros(4), length_unit="m",
    )


@pytest.mark.parametrize("frame", ["lab", "rotating"])
def test_split_run_equals_full_run(frame):
    """Integrating [0, 400] in one go == [0, 200] then resuming [200, 400]
    from the saved state (the checkpoint/resume contract)."""
    kw = _inputs()
    cfg_full = psa.custom_simulation_config(z_max=400.0, dz=0.1, save_every=100)
    z_full, A_full = psa.run_single_simulation(cfg_full, frame=frame, **kw)

    cfg_half = psa.custom_simulation_config(z_max=200.0, dz=0.1, save_every=100)
    z1, A1 = psa.run_single_simulation(cfg_half, frame=frame, **kw)
    z2, A2 = psa.run_single_simulation(
        cfg_half, frame=frame, z0=float(z1[-1]), A_init=A1[-1], **kw
    )
    z_joined = np.concatenate([z1, z2[1:]])
    A_joined = np.concatenate([A1, A2[1:]], axis=0)
    np.testing.assert_allclose(z_joined, z_full, rtol=1e-12)
    np.testing.assert_allclose(A_joined, A_full, rtol=1e-10, atol=1e-15)


def test_resume_via_npz_roundtrip(tmp_path):
    """Checkpoint to NPZ, reload, resume -- the full persistence loop."""
    from psa_simulation_ode_rk_mvp_dispersion_tpu import io_fwm

    kw = _inputs()
    cfg = psa.custom_simulation_config(z_max=100.0, dz=0.1, save_every=100)
    z1, A1 = psa.run_single_simulation(cfg, **kw)
    p = io_fwm.save_result_npz(tmp_path / "ckpt", z1, A1,
                               metadata={"resume_z": float(z1[-1])})
    z_l, A_l, md = io_fwm.load_result_npz(p)
    z2, A2 = psa.run_single_simulation(
        cfg, z0=md["resume_z"], A_init=A_l[-1], **kw
    )
    assert z2[0] == pytest.approx(100.0)
    assert z2[-1] == pytest.approx(200.0)
    # energy continuity across the seam
    np.testing.assert_allclose(
        np.sum(np.abs(A2[0]) ** 2), np.sum(np.abs(A1[-1]) ** 2), rtol=1e-12
    )


def test_a_init_validation():
    kw = _inputs()
    cfg = psa.custom_simulation_config(z_max=1.0, dz=0.1)
    with pytest.raises(ValueError, match="A_init"):
        psa.run_single_simulation(cfg, A_init=np.ones(3), **kw)


def test_throughput_meter():
    m = ThroughputMeter(label="test")
    m.tick(10)
    m.tick(5)
    assert m.count == 15
    assert m.per_second > 0
    s = m.summary()
    assert "Throughput" in s and "test" in s


def test_log_run(tmp_path):
    p = log_run(tmp_path / "runs.jsonl", {"experiment": "x", "gain_db": 12.5})
    p = log_run(p, {"experiment": "y"})
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["experiment"] == "x" and rec["gain_db"] == 12.5
    assert "timestamp_utc" in rec and "backend" in rec


def test_profile_trace_smoke(tmp_path):
    from psa_simulation_ode_rk_mvp_dispersion_tpu.utils.observability import (
        profile_trace,
    )
    import jax.numpy as jnp

    with profile_trace(str(tmp_path / "trace")):
        _ = jnp.ones(16) * 2.0
    assert any((tmp_path / "trace").rglob("*"))


def test_checked_rhs_catches_nonfinite():
    """checkify-based in-kernel checks (the sanitizer analog) fire through
    jit/scan and report the failing check."""
    import jax.numpy as jnp

    from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.integrators import (
        integrate_fixed_grid,
    )
    from psa_simulation_ode_rk_mvp_dispersion_tpu.utils.debug import (
        checked_rhs,
        run_checked,
    )

    def blowup(z, y, p):
        return p * y * y

    rhs_dbg = checked_rhs(blowup, name="blowup")

    def solve(y0, lam):
        return integrate_fixed_grid(
            rhs_dbg, y0, lam, z0=0.0, dz=0.05, n_steps=100, save_every=100,
            check_nan=False,
        ).y_final

    err, out = run_checked(solve, jnp.asarray([1.0]), jnp.asarray(50.0))
    with pytest.raises(Exception, match="blowup|nan|overflow"):
        err.throw()

    # healthy run: no error raised
    err2, out2 = run_checked(solve, jnp.asarray([1.0]), jnp.asarray(0.1))
    err2.throw()
    assert np.isfinite(np.asarray(out2)).all()
