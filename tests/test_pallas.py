"""Pallas fused-kernel solver tests (interpreter mode on CPU; the compiled
kernel is exercised on TPU by bench.py)."""

import jax
import numpy as np
import pytest

import psa_tpu as psa
from psa_simulation_ode_rk_mvp_dispersion_tpu.ops import pallas_solver as ps
from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.rhs import RHSCoeffs
from psa_simulation_ode_rk_mvp_dispersion_tpu.parallel import sweep as sw


def _case(B=9, seed=0):
    rng = np.random.default_rng(seed)
    p_in = np.array([0.1, 0.1, 1e-6, 0.0])
    A0 = np.broadcast_to(np.sqrt(p_in).astype(np.complex128), (B, 4)).copy()
    gamma = np.full(B, 0.0115)
    alpha = np.full(B, 1.15e-4)
    dbeta = rng.uniform(-0.05, 0.05, B)
    return A0, gamma, alpha, dbeta


@pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="x64 comparison needs f64 (CPU); the TPU kernel is covered by "
    "test_df32's bit-identity test and bench.py",
)
def test_pallas_matches_x64_scan():
    A0, gamma, alpha, dbeta = _case()
    r = ps.solve_batch_pallas(
        A0, gamma, alpha, dbeta, dz_m=0.2, n_steps=250, save_every=10,
        interpret=True,
    )
    cfg = psa.custom_simulation_config(z_max=50.0, dz=0.2, precision="x64")
    r64 = sw.solve_batch(
        cfg, RHSCoeffs(gamma=gamma, alpha=alpha, delta_beta=dbeta), A0,
        frame="rotating", engine="scan",
    )
    assert np.all(r.ok)
    np.testing.assert_allclose(r.P_max, r64.P_max, rtol=3e-5, atol=1e-12)
    np.testing.assert_allclose(r.A_end, r64.A_end, rtol=1e-4, atol=1e-9)


def test_pallas_engine_through_solve_batch():
    """engine='pallas' through the public solve_batch (interpreted on CPU)."""
    A0, gamma, alpha, dbeta = _case(B=5, seed=1)
    cfg32 = psa.custom_simulation_config(z_max=20.0, dz=0.2, precision="x32")
    rp = sw.solve_batch(
        cfg32, RHSCoeffs(gamma=gamma, alpha=alpha, delta_beta=dbeta), A0,
        frame="rotating", engine="pallas",
    )
    rs = sw.solve_batch(
        cfg32, RHSCoeffs(gamma=gamma, alpha=alpha, delta_beta=dbeta), A0,
        frame="rotating", engine="scan",
    )
    np.testing.assert_allclose(rp.P_max, rs.P_max, rtol=1e-5, atol=1e-12)
    assert np.array_equal(rp.ok, rs.ok)


def test_pallas_engine_validation():
    A0, gamma, alpha, dbeta = _case(B=3)
    cfg = psa.custom_simulation_config(z_max=2.0, dz=0.2, precision="x64")
    c = RHSCoeffs(gamma=gamma, alpha=alpha, delta_beta=dbeta)
    with pytest.raises(ValueError, match="pallas"):
        sw.solve_batch(cfg, c, A0, frame="rotating", engine="pallas")
    with pytest.raises(ValueError, match="engine"):
        sw.solve_batch(cfg, c, A0, engine="cuda")


def test_pallas_nan_lane_masking():
    A0 = np.array([[0.3, 0.3, 1e-3, 0.0], [1e4, 1e4, 1.0, 0.0]],
                  dtype=np.complex128)
    r = ps.solve_batch_pallas(
        A0, gamma=np.array([0.01, 1e3]), alpha=np.zeros(2),
        delta_beta=np.zeros(2), dz_m=0.5, n_steps=40, save_every=10,
        interpret=True,
    )
    assert r.ok[0] and not r.ok[1]
    assert np.all(np.isfinite(r.P_max))


def test_pallas_lane_padding_exact():
    """Non-multiple-of-128 batches pad internally and slice back exactly."""
    A0, gamma, alpha, dbeta = _case(B=7, seed=2)
    r7 = ps.solve_batch_pallas(
        A0, gamma, alpha, dbeta, dz_m=0.2, n_steps=50, save_every=10,
        interpret=True,
    )
    r1 = ps.solve_batch_pallas(
        A0[:1], gamma[:1], alpha[:1], dbeta[:1], dz_m=0.2, n_steps=50,
        save_every=10, interpret=True,
    )
    np.testing.assert_allclose(r7.P_max[0], r1.P_max[0], rtol=1e-12)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled comb kernel requires the TPU backend (interpret-mode "
    "parity runs in test_nwave)",
)
def test_pallas_comb_kernel_matches_scan_on_tpu():
    """The fused VMEM comb kernel (ops/pallas_comb.py) must track the scan
    dft engine on-chip (both x32 HIGHEST; small ordering differences only)."""
    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import nwave as nw

    n, B = 16, 130  # non-multiple of the 128-lane block: exercises padding
    rng = np.random.default_rng(9)
    A0 = rng.normal(size=(B, n)) * 0.25 + 1j * rng.normal(size=(B, n)) * 0.25
    coeffs = nw.NWaveCoeffs(
        gamma=np.linspace(0.2, 0.6, B), alpha=np.full(B, 0.01),
        beta_lin=np.broadcast_to(np.linspace(-0.2, 0.2, n), (B, n)),
    )
    cfg = psa.custom_simulation_config(z_max=2.0, dz=0.01, save_every=20,
                                       precision="x32")
    P1, A1, ok1 = nw.solve_comb_batch(cfg, coeffs, A0, coupling="dft")
    P2, A2, ok2 = nw.solve_comb_batch(cfg, coeffs, A0, engine="pallas")
    assert ok1.all() and ok2.all()
    np.testing.assert_allclose(A2, A1, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(P2, P1, rtol=5e-4, atol=1e-6)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="grouped-lane bit parity is exact only on the compiled TPU path "
    "(interpret mode FMA-contracts differently, ~1 ulp phase noise)",
)
def test_pallas_x32_grouped_bit_identical_on_tpu():
    A0, gamma, alpha, dbeta = _case(B=700, seed=2)  # non-multiple padding
    kw = dict(dz_m=0.2, n_steps=300, save_every=10)
    r1 = ps.solve_batch_pallas(A0, gamma, alpha, dbeta, group=1, **kw)
    r8 = ps.solve_batch_pallas(A0, gamma, alpha, dbeta, group=8, **kw)
    np.testing.assert_array_equal(r8.P_max, r1.P_max)
    np.testing.assert_array_equal(r8.A_end, r1.A_end)
    np.testing.assert_array_equal(r8.ok, r1.ok)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="sharded compiled kernels require the TPU backend",
)
def test_pallas_x32_sharded_bit_identical_on_tpu():
    from jax.sharding import Mesh

    A0, gamma, alpha, dbeta = _case(B=700, seed=3)
    kw = dict(dz_m=0.2, n_steps=300, save_every=10)
    r1 = ps.solve_batch_pallas(A0, gamma, alpha, dbeta, **kw)
    tpu = np.asarray([d for d in jax.devices() if d.platform == "tpu"])
    mesh = Mesh(tpu, ("batch",))
    r2 = ps.solve_batch_pallas(A0, gamma, alpha, dbeta, mesh=mesh, **kw)
    np.testing.assert_array_equal(r2.P_max, r1.P_max)
    np.testing.assert_array_equal(r2.A_end, r1.A_end)
    np.testing.assert_array_equal(r2.ok, r1.ok)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="sharded compiled kernels require the TPU backend",
)
def test_pallas_comb_sharded_bit_identical_on_tpu():
    from jax.sharding import Mesh

    from psa_simulation_ode_rk_mvp_dispersion_tpu.models import nwave as nw

    n, B = 16, 130
    rng = np.random.default_rng(9)
    A0 = rng.normal(size=(B, n)) * 0.25 + 1j * rng.normal(size=(B, n)) * 0.25
    coeffs = nw.NWaveCoeffs(
        gamma=np.linspace(0.2, 0.6, B), alpha=np.full(B, 0.01),
        beta_lin=np.broadcast_to(np.linspace(-0.2, 0.2, n), (B, n)),
    )
    cfg = psa.custom_simulation_config(z_max=2.0, dz=0.01, save_every=20,
                                       precision="x32")
    P1, A1, ok1 = nw.solve_comb_batch(cfg, coeffs, A0, engine="pallas")
    tpu = np.asarray([d for d in jax.devices() if d.platform == "tpu"])
    mesh = Mesh(tpu, ("batch",))
    P2, A2, ok2 = nw.solve_comb_batch(cfg, coeffs, A0, engine="pallas",
                                      mesh=mesh)
    np.testing.assert_array_equal(P2, P1)
    np.testing.assert_array_equal(A2, A1)
    np.testing.assert_array_equal(ok2, ok1)
