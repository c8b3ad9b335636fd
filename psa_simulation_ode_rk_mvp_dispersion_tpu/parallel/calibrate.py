"""Differentiable solver surface and gradient-based parameter calibration.

The solvers in this framework are pure jax programs (``lax.scan`` RK4 over
:func:`~..ops.rhs.rhs_yaman`), so the output power is DIFFERENTIABLE in
every physics coefficient -- a capability the reference's NumPy loop
fundamentally cannot offer (its only inverse tool is grid search,
``scan_mismtach.py``).  This module exposes that surface:

- :func:`make_gain_model` -- a jittable, vmappable, ``jax.grad``-able
  ``gain_db(RHSCoeffs)`` scalar function for a fixed launch condition;
- :func:`fit_gain_curve` -- calibrate ``(gamma, alpha, delta_beta
  offset)`` against a measured gain-vs-mismatch curve by full-gradient
  descent THROUGH the integrator (optax adam), the practical inverse
  problem of fiber characterization.

Gradients flow through thousands of RK4 steps; the forward pass is the
same ``integrate_reduce`` program the sweep engine runs, with
``check_nan=False`` (the NaN bookkeeping's ``lax.cond`` freeze is
pointless under differentiation -- a diverged fit step shows up as a
non-finite loss, which the fit loop reports).

PRECISION TIERS (round 4, VERDICT r3 #6): every model builder takes
``precision=`` -- default 'x64' on CPU (the reference-parity oracle) and
'x32' on TPU.  The x32 path is TPU-native end to end: initial amplitudes
are built IN-TRACE from real planes (``lax.complex``; the axon attachment
cannot transfer complex buffers), every constant carries an explicit f32
dtype (the package's global x64 flag would otherwise materialize f64
constants the f64-less v5e rejects), and the model returns a REAL scalar,
so jit boundaries stay f32.  Gradients flow through the same c64 scan the
x32 sweep engine runs.  'x64' on a TPU-default process still raises (the
chip has no f64/c128).

MATCHED-TOLERANCE FITS (round 5, VERDICT r4 #5): the AD model builders
reject 'df32' (reverse-mode through compensated arithmetic runs the
backward accumulation in plain f32, so it cannot beat the x32 tape --
the forward values get better, the gradient noise floor does not), but
:func:`fit_gain_curve` ACCEPTS ``precision='df32'`` via a two-stage
hybrid that sidesteps AD entirely: an x32 adam explore (the existing
on-chip gradient path) followed by a derivative-free Levenberg-Marquardt
polish whose residuals and central-difference Jacobian are evaluated
through the PRODUCTION matched-tolerance batch engine
(``sweep.solve_batch`` -> the fused df32 pallas kernel on TPU, <=1e-9
vs x64).  All 7 parameter variants (center + 2 x 3 offsets) stack into
ONE batched solve per LM iteration, so the polish costs a handful of
kernel launches.  f32 AD noise in the degenerate (gamma, alpha) valley
limited the pure-x32 fit to ~3.6e-2 relative in gamma (TPU_TESTRUN
session 12); the df32-forward polish is noise-floored at the engine's
1e-9, recovering the CPU oracle's permille-class errors on-chip.  On
CPU the polish forward runs the x64 scan engine instead (same accuracy
class; XLA:CPU compiles two-float programs pathologically slowly), so
the identical LM machinery is exercised by the CPU suite.
Fit workflows are host-side by nature (per-step python loop).
Measurement convention: the models measure at the LAST SAVED grid point
(``floor(n_steps/save_every)*save_every`` steps, chunked exactly like
the production solvers), so they are bitwise-comparable to the engines.

Oracles (tests/test_calibrate.py): the gradient matches central finite
differences to ~1e-6 relative; a synthetic 16-point gain curve recovers
(gamma, alpha, dbeta offset) to <=1e-3 relative from a 30%-off start.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimulationConfig, validate_config
from ..models.fwm4 import make_initial_amplitudes
from ..ops.integrators import integrate_reduce
from ..ops.rhs import RHSCoeffs, make_rhs_yaman


def _resolve_precision(precision: Optional[str], what: str) -> str:
    """Backend-aware precision dispatch: None -> 'x64' on CPU (the parity
    oracle), 'x32' on TPU (the on-chip gradient path).  'x64' on a non-CPU
    backend still raises -- the f64-less v5e cannot hold complex128 and the
    axon attachment cannot transfer complex buffers."""
    from ..utils.precision import validate_precision

    if precision is None:
        precision = "x64" if jax.default_backend() == "cpu" else "x32"
    prec = validate_precision(precision)
    if prec == "df32":
        raise ValueError(
            f"{what} does not support precision='df32': reverse-mode AD "
            "through the compensated two-float tape still accumulates the "
            "backward pass in plain f32, so it cannot beat the x32 gradient "
            "noise floor -- use 'x32' here, or fit_gain_curve("
            "precision='df32') for the matched-tolerance hybrid (x32 "
            "explore + derivative-free LM polish on the df32 engine)"
        )
    if prec == "x64" and jax.default_backend() != "cpu":
        raise RuntimeError(
            f"{what} with precision='x64' runs complex128/f64 jax programs "
            "(CPU oracle surface); this process defaults to a TPU backend, "
            "which cannot transfer complex buffers -- use precision='x32' "
            "on-chip, or run the x64 oracle in a JAX_PLATFORMS='' process"
        )
    return prec


def _observed_steps(cfg: SimulationConfig) -> int:
    """Steps to the last SAVED grid point (framework convention)."""
    n_steps = int(round(float(cfg.z_max) / float(cfg.dz)))
    n_obs = (n_steps // int(cfg.save_every)) * int(cfg.save_every)
    if n_obs < 1:
        raise ValueError(
            f"no saved grid points: {n_steps} steps with "
            f"save_every={cfg.save_every}"
        )
    return n_obs


def make_gain_model(
    cfg: SimulationConfig,
    *,
    p_in,
    phase_in=None,
    frame: str = "rotating",
    wave: int = 2,
    precision: Optional[str] = None,
):
    """Build a differentiable ``gain_db(coeffs: RHSCoeffs) -> dB`` for the
    launch condition ``(p_in, phase_in)``: signal-power gain at the LAST
    SAVED grid point (the framework measurement convention -- the same
    point ``sweep.solve_batch`` reports as ``A_end``).  Pure jax --
    compose freely with ``jax.jit`` / ``jax.vmap`` / ``jax.grad``.
    ``frame='rotating'`` (autonomous) is the natural gauge for
    differentiation; powers are frame-invariant.

    ``precision``: 'x64' (CPU oracle, the default there) or 'x32' (the
    TPU-native tier, default on TPU): in-trace complex construction, f32
    boundaries, real-scalar output."""
    from ..utils.precision import real_dtype

    validate_config(cfg)
    prec = _resolve_precision(precision, "make_gain_model")
    rdt = real_dtype(prec)
    A0h = np.asarray(make_initial_amplitudes(p_in, phase_in),
                     dtype=np.complex128)
    re0 = jnp.asarray(A0h.real, dtype=rdt)
    im0 = jnp.asarray(A0h.imag, dtype=rdt)
    n_steps = _observed_steps(cfg)
    f = make_rhs_yaman(frame=frame)
    p0 = float(np.abs(A0h[wave]) ** 2)
    if p0 <= 0.0:
        raise ValueError(f"wave {wave} carries no input power")
    dz = jnp.asarray(float(cfg.dz), dtype=rdt)

    def gain_db(coeffs: RHSCoeffs):
        A0 = jax.lax.complex(re0, im0)   # no complex H2D (axon rule)
        res = integrate_reduce(
            f, A0, coeffs, z0=jnp.zeros((), rdt), dz=dz, n_steps=n_steps,
            save_every=n_steps, reduce_init=jnp.zeros((), rdt),
            reduce_fn=lambda acc, y: acc, check_nan=False,
        )
        p_out = jnp.abs(res.y_final[..., wave]) ** 2
        return 10.0 * jnp.log10(p_out / jnp.asarray(p0, rdt))

    # jit at the boundary: EAGER execution on the axon TPU attachment
    # raises UNIMPLEMENTED (per-op dispatch materializes complex buffers);
    # jit composes transparently with the advertised grad/vmap usage
    return jax.jit(gain_db)


@dataclasses.dataclass(frozen=True)
class FitResult:
    """Gradient-descent calibration result (host scalars/arrays)."""

    params: Dict[str, float]       # fitted gamma, alpha, dbeta_offset
    loss_db2: float                # final mean squared residual [dB^2]
    loss_history: np.ndarray       # (n_steps+1,)
    gain_db: np.ndarray            # model curve at the fitted parameters
    n_steps: int

    def __repr__(self) -> str:
        p = ", ".join(f"{k}={v:.6g}" for k, v in self.params.items())
        return f"FitResult({p}, rms={np.sqrt(self.loss_db2):.4g} dB)"


def _engine_gain_curve_fn(
    cfg: SimulationConfig,
    db_grid: np.ndarray,
    *,
    p_in,
    phase_in,
    wave: int,
    forward_precision: str,
):
    """Batched ``theta_stack -> gain_db (K, N)`` through the PRODUCTION
    batch engine (``sweep.solve_batch``): K normalized parameter triples
    ``(log_gamma, alpha*z, dphi*z)`` x N grid points solved as ONE
    ``K*N``-instance call -- the matched-tolerance forward of the LM
    polish (df32 pallas kernel on TPU, x64 scan oracle on CPU).  Measures
    at the last SAVED grid point like :func:`make_gain_model` (engine
    ``A_end`` semantics -- the framework measurement convention)."""
    from . import sweep as _sweep

    # rk4 fixed-step: the stepper make_gain_model differentiates; the
    # polish must measure the SAME model as the explore stage
    cfg_fwd = dataclasses.replace(
        cfg, precision=forward_precision, integrator="rk4"
    )
    A0h = np.asarray(make_initial_amplitudes(p_in, phase_in),
                     dtype=np.complex128)
    p0 = float(np.abs(A0h[wave]) ** 2)
    if p0 <= 0.0:
        raise ValueError(f"wave {wave} carries no input power")
    db = np.asarray(db_grid, dtype=np.float64)
    n_pts = db.shape[0]
    z_span = float(cfg.z_max)

    def gain_curves(theta_stack: np.ndarray) -> np.ndarray:
        th = np.asarray(theta_stack, dtype=np.float64).reshape(-1, 3)
        k = th.shape[0]
        gam = np.repeat(np.exp(th[:, 0]), n_pts)
        alp = np.repeat(th[:, 1] / z_span, n_pts)
        dbe = (db[None, :] + (th[:, 2] / z_span)[:, None]).reshape(-1)
        res = _sweep.solve_batch(
            cfg_fwd,
            RHSCoeffs(gamma=gam, alpha=alp, delta_beta=dbe),
            np.tile(A0h[None, :], (k * n_pts, 1)),
        )
        if not bool(np.all(res.ok)):
            raise FloatingPointError(
                "matched-tolerance polish forward diverged (NaN lanes); "
                "the explore stage left the basin -- improve init or "
                "lower the learning rate"
            )
        return (10.0 * np.log10(res.P_end[:, wave] / p0)).reshape(k, n_pts)

    return gain_curves


def _lm_polish_gain_curve(
    gain_curves,
    theta0: np.ndarray,
    target: np.ndarray,
    *,
    tol_db: float,
    max_iters: int = 12,
    h: float = 1e-3,
) -> Tuple[np.ndarray, list]:
    """Derivative-free Levenberg-Marquardt on the dB residual in the
    normalized (log_gamma, alpha*z, dphi*z) coordinates: the Jacobian is
    central finite differences with step ``h`` (optimal for a <=1e-9
    forward: truncation ~h^2 and roundoff ~eps/h balance near 1e-3), and
    every iteration's 7 variants (center + 6 offsets) evaluate as one
    batched engine call.  Returns the polished theta and the per-iteration
    rms^2 history (accepted steps only)."""
    th = np.asarray(theta0, dtype=np.float64).copy()
    tgt = np.asarray(target, dtype=np.float64)
    lam = 1e-3
    history: list = []
    eye = np.eye(3)
    stack0 = np.concatenate(
        [np.zeros((1, 3))] + [s * h * eye[k:k + 1]
                              for k in range(3) for s in (+1.0, -1.0)],
        axis=0,
    )
    for _ in range(int(max_iters)):
        curves = gain_curves(th[None, :] + stack0)
        r = curves[0] - tgt
        loss = float(np.mean(r ** 2))
        history.append(loss)
        if loss < float(tol_db) ** 2:
            break
        jac = np.stack(
            [(curves[1 + 2 * k] - curves[2 + 2 * k]) / (2.0 * h)
             for k in range(3)], axis=1,
        )
        jtj = jac.T @ jac
        jtr = jac.T @ r
        accepted = False
        for _try in range(4):
            delta = np.linalg.solve(
                jtj + lam * np.diag(np.maximum(np.diag(jtj), 1e-12)), -jtr
            )
            cand = th + delta
            loss_c = float(np.mean((gain_curves(cand[None, :])[0]
                                    - tgt) ** 2))
            if np.isfinite(loss_c) and loss_c < loss:
                th, lam, accepted = cand, max(lam * 0.3, 1e-12), True
                break
            lam *= 10.0
        if not accepted or float(np.linalg.norm(delta)) < 1e-10:
            break
    history.append(float(np.mean((gain_curves(th[None, :])[0]
                                  - tgt) ** 2)))
    return th, history


def fit_gain_curve(
    cfg: SimulationConfig,
    *,
    delta_beta_grid,
    measured_gain_db,
    p_in,
    phase_in=None,
    init: Optional[Dict[str, float]] = None,
    steps: int = 600,
    learning_rate: float = 0.05,
    tol_db: float = 1e-4,
    wave: int = 2,
    precision: Optional[str] = None,
    polish_iters: int = 12,
) -> FitResult:
    """Calibrate ``gamma`` [1/(W m)], ``alpha`` [1/m] and a constant
    phase-mismatch offset [1/m] against a measured gain-vs-mismatch curve
    (the fiber-characterization inverse problem): full-batch adam on the
    mean squared dB residual, with gradients through the whole RK4 solve
    at every grid point (one vmapped XLA program per step); stops early
    when the rms residual drops below ``tol_db``.

    Parameters are optimized in NORMALIZED coordinates so adam's uniform
    step size is meaningful: log gamma (positivity), alpha * z_max (total
    nepers) and dbeta_offset * z_max (total mismatch phase) are all O(1)
    for realistic fibers.  ``init`` defaults to ``{'gamma': 1e-2,
    'alpha': 0.0, 'dbeta_offset': 0.0}`` (physical units).

    ``precision='x32'`` (the TPU default) runs the whole fit -- forward,
    gradients, adam -- on-chip; the recovered parameters match the CPU
    x64 fit to ~1e-3 relative (f32 forward error ~1e-5 in gain, measured
    in tests/test_calibrate.py's cross-tier case and the on-chip lane in
    TPU_TESTRUN.md).

    ``precision='df32'`` (round 5, VERDICT r4 #5) is the MATCHED-TOLERANCE
    tier: the x32/x64 adam explore above, then ``polish_iters`` of
    derivative-free Levenberg-Marquardt whose residuals + central-
    difference Jacobian run through the production batch engine (df32
    pallas kernel on TPU, <=1e-9 forward; x64 scan on CPU) -- one
    batched 7-variant solve per iteration.  This clears the x32 tier's
    f32-AD noise floor in the degenerate (gamma, alpha) valley and
    recovers the CPU oracle's permille-class parameters on-chip; see the
    module docstring for why AD through the two-float tape cannot."""
    import optax

    from ..utils.precision import real_dtype, validate_precision

    if precision is not None and validate_precision(precision) == "df32":
        on_cpu = jax.default_backend() == "cpu"
        explore = fit_gain_curve(
            cfg, delta_beta_grid=delta_beta_grid,
            measured_gain_db=measured_gain_db, p_in=p_in,
            phase_in=phase_in, init=init, steps=steps,
            learning_rate=learning_rate, tol_db=tol_db, wave=wave,
            precision="x64" if on_cpu else "x32",
        )
        z_span = float(cfg.z_max)
        theta0 = np.array([
            np.log(explore.params["gamma"]),
            explore.params["alpha"] * z_span,
            explore.params["dbeta_offset"] * z_span,
        ])
        gain_curves = _engine_gain_curve_fn(
            cfg, np.asarray(delta_beta_grid, dtype=np.float64),
            p_in=p_in, phase_in=phase_in, wave=wave,
            forward_precision="x64" if on_cpu else "df32",
        )
        target_np = np.asarray(measured_gain_db, dtype=np.float64)
        theta, lm_hist = _lm_polish_gain_curve(
            gain_curves, theta0, target_np,
            tol_db=tol_db, max_iters=polish_iters,
        )
        curve = gain_curves(theta[None, :])[0]
        return FitResult(
            params={
                "gamma": float(np.exp(theta[0])),
                "alpha": float(theta[1]) / z_span,
                "dbeta_offset": float(theta[2]) / z_span,
            },
            loss_db2=float(np.mean((curve - target_np) ** 2)),
            loss_history=np.concatenate(
                [explore.loss_history, np.asarray(lm_hist)]),
            gain_db=curve,
            n_steps=explore.n_steps + len(lm_hist) - 1,
        )

    prec = _resolve_precision(precision, "fit_gain_curve")
    rdt = real_dtype(prec)
    db_grid = jnp.asarray(np.asarray(delta_beta_grid, dtype=np.float64),
                          dtype=rdt)
    target = jnp.asarray(np.asarray(measured_gain_db, dtype=np.float64),
                         dtype=rdt)
    if db_grid.shape != target.shape or db_grid.ndim != 1:
        raise ValueError("delta_beta_grid and measured_gain_db must be "
                         "matching 1-D arrays")
    init = dict(init or {})
    g0 = float(init.pop("gamma", 1e-2))
    a0 = float(init.pop("alpha", 0.0))
    o0 = float(init.pop("dbeta_offset", 0.0))
    if init:
        raise ValueError(f"unknown init keys: {sorted(init)}")
    if g0 <= 0.0:
        raise ValueError("init gamma must be positive")

    z_span = float(cfg.z_max)
    gain_fn = make_gain_model(cfg, p_in=p_in, phase_in=phase_in, wave=wave,
                              precision=prec)
    inv_span = jnp.asarray(1.0 / z_span, dtype=rdt)
    gain_curve = jax.vmap(
        lambda db, th: gain_fn(RHSCoeffs(
            gamma=jnp.exp(th["log_gamma"]),
            alpha=th["alpha_nep"] * inv_span,
            delta_beta=db + th["dphi"] * inv_span,
        )),
        in_axes=(0, None),
    )

    def loss_fn(th):
        return jnp.mean((gain_curve(db_grid, th) - target) ** 2)

    theta = {
        "log_gamma": jnp.asarray(np.log(g0), dtype=rdt),
        "alpha_nep": jnp.asarray(a0 * z_span, dtype=rdt),
        "dphi": jnp.asarray(o0 * z_span, dtype=rdt),
    }
    # cosine-decayed adam: the late small steps settle the nearly
    # degenerate (gamma, alpha) valley instead of orbiting it
    schedule = optax.cosine_decay_schedule(float(learning_rate),
                                           max(int(steps), 1))
    opt = optax.adam(schedule)
    opt_state = opt.init(theta)

    @jax.jit
    def step(th, st):
        loss, grads = jax.value_and_grad(loss_fn)(th)
        updates, st = opt.update(grads, st, th)
        return optax.apply_updates(th, updates), st, loss

    loss_jit = jax.jit(loss_fn)   # eager evaluation fails on the axon TPU
    history = [float(loss_jit(theta))]
    for _ in range(int(steps)):
        theta, opt_state, loss = step(theta, opt_state)
        history.append(float(loss))
        if not np.isfinite(history[-1]):
            raise FloatingPointError(
                f"fit diverged at step {len(history) - 1}; lower the "
                f"learning rate or improve init"
            )
        if history[-1] < float(tol_db) ** 2:
            break
    fitted = {
        "gamma": float(np.exp(theta["log_gamma"])),
        "alpha": float(theta["alpha_nep"]) / z_span,
        "dbeta_offset": float(theta["dphi"]) / z_span,
    }
    curve = np.asarray(jax.jit(gain_curve)(db_grid, theta),
                       dtype=np.float64)
    # loss AT the returned parameters (step() reports the pre-update loss)
    loss_final = float(np.mean((curve - np.asarray(target)) ** 2))
    return FitResult(
        params=fitted,
        loss_db2=loss_final,
        loss_history=np.asarray(history),
        gain_db=curve,
        n_steps=len(history) - 1,
    )


def make_pulse_model(
    cfg: SimulationConfig,
    grid,
    A0,
    *,
    nl=None,
    alpha_1_m: float = 0.0,
    precision: Optional[str] = None,
):
    """Differentiable GNLSE propagation on the PRODUCTION SSFM stepper
    (``models.gnlse._chunk_stepper`` scanned in ``cfg.save_every``-sized
    chunks exactly like the batched engine, so the forward pass is
    bit-identical to ``solve_gnlse_batch``'s ``A_last`` for finite
    trajectories -- including the last-saved-point measurement
    convention): returns ``field(theta) -> (T,) complex`` with
    ``theta = {'gamma': 1/(W m), 'beta2': s^2/m[, 'beta3': ...]}``.
    Pure jax -- jit / vmap / grad-able in every parameter, including the
    dispersion orders (the frequency-domain phase is built in-trace)."""
    import math

    from jax import lax

    from ..models.gnlse import (
        GNLSECoeffs,
        _cast_nl,
        _chunk_stepper,
        _lin_factor,
    )

    from ..utils.precision import real_dtype

    validate_config(cfg)
    prec = _resolve_precision(precision, "make_pulse_model")
    rdt = jnp.dtype(real_dtype(prec))
    om = jnp.asarray(np.asarray(grid.omega(), dtype=np.float64), dtype=rdt)
    A0h = np.asarray(A0, dtype=np.complex128).reshape(-1)
    re0 = jnp.asarray(A0h.real, dtype=rdt)
    im0 = jnp.asarray(A0h.imag, dtype=rdt)
    if A0h.shape[0] != om.shape[0]:
        raise ValueError(
            f"A0 has {A0h.shape[0]} samples but the grid has {om.shape[0]}"
        )
    save_every = int(cfg.save_every)
    n_chunks = _observed_steps(cfg) // save_every
    h = float(cfg.dz)
    nl_c = _cast_nl(nl, rdt)
    stepper = _chunk_stepper(save_every)

    def field(theta):
        lin = jnp.zeros_like(om)
        for key, val in theta.items():
            if key == "gamma":
                continue
            if not key.startswith("beta"):
                raise ValueError(f"unknown theta key {key!r}")
            n = int(key[4:])
            lin = lin + (jnp.asarray(val, dtype=rdt)
                         / math.factorial(n)) * om ** n
        coeffs = GNLSECoeffs(gamma=jnp.asarray(theta["gamma"], dtype=rdt),
                             alpha=jnp.asarray(alpha_1_m, dtype=rdt),
                             lin_phase=lin)
        Lh = _lin_factor(coeffs, 0.5 * h, rdt)
        Lf = _lin_factor(coeffs, h, rdt)
        hj = jnp.asarray(h, dtype=rdt)

        def chunk(y, _):
            return stepper(y, Lh, Lf, coeffs.gamma, hj, nl_c), None

        A0c = jax.lax.complex(re0, im0)   # in-trace (no complex H2D)
        y, _ = lax.scan(chunk, A0c, None, length=n_chunks)
        return y

    return field


def fit_pulse_spectrum(
    cfg: SimulationConfig,
    grid,
    A0,
    measured_db,
    *,
    init: Dict[str, float],
    nl=None,
    alpha_1_m: float = 0.0,
    steps: int = 300,
    learning_rate: float = 0.05,
    tol_db: float = 1e-4,
    floor_db: float = -50.0,
    precision: Optional[str] = None,
):
    """Calibrate GNLSE parameters against a measured OUTPUT POWER SPECTRUM
    (dB, fft-ordered, any reference level): adam through the split-step
    solve in normalized coordinates -- log gamma and span-integrated
    dispersion phases ``beta_n * max|omega|^n * z / n!`` are all O(1).
    Bins more than ``floor_db`` below the spectral peak are excluded from
    the residual (measurement floor).  Returns a :class:`FitResult` whose
    ``gain_db`` field carries the fitted model spectrum [dB].

    This is a LOCAL optimizer on a nonconvex landscape: a power spectrum
    of a (time-)symmetric input is nearly invariant under beta2 -> -beta2
    (the NLSE conjugation symmetry), so initialize inside the right
    dispersion-sign basin; too-large learning rates can hop basins
    (measured: lr 0.1 converges, 0.15 escapes on the N=1.5 soliton
    calibration case)."""
    import math

    import optax

    from ..utils.precision import real_dtype

    prec = _resolve_precision(precision, "fit_pulse_spectrum")
    rdt = jnp.dtype(real_dtype(prec))
    target = jnp.asarray(np.asarray(measured_db, dtype=np.float64),
                         dtype=rdt)
    om = np.asarray(grid.omega(), dtype=np.float64)
    if target.shape != om.shape:
        raise ValueError("measured_db must be (T,) on the fft-ordered grid")
    init = dict(init)
    if "gamma" not in init or float(init["gamma"]) <= 0.0:
        raise ValueError("init must contain a positive 'gamma'")
    orders = sorted(int(k[4:]) for k in init if k.startswith("beta"))
    if set(init) - {"gamma"} - {f"beta{n}" for n in orders}:
        raise ValueError(f"unknown init keys: {sorted(set(init) - {'gamma'})}")

    z = float(cfg.z_max)
    # normalize dispersion orders by the PULSE bandwidth, not the grid
    # Nyquist: the fit moves phase where the spectrum lives, and the rms
    # input width makes beta_n * om_char^n * z / n! an O(1) phase
    S0 = np.abs(np.fft.fft(np.asarray(A0, dtype=np.complex128)
                           .reshape(-1))) ** 2
    om_char = float(np.sqrt((S0 * om ** 2).sum() / S0.sum()))
    if not om_char > 0.0:
        raise ValueError("input pulse has zero spectral width")
    scales = {f"beta{n}": om_char ** n * z / math.factorial(n)
              for n in orders}
    field = make_pulse_model(cfg, grid, A0, nl=nl, alpha_1_m=alpha_1_m,
                             precision=prec)
    mask = target > (float(target.max()) + float(floor_db))
    s_floor = 1e-300 if prec == "x64" else 1e-37

    def spectrum_db(theta_n):
        theta = {"gamma": jnp.exp(theta_n["log_gamma"])}
        for n in orders:
            theta[f"beta{n}"] = theta_n[f"beta{n}_n"] / jnp.asarray(
                scales[f"beta{n}"], rdt)
        y = field(theta)
        S = jnp.abs(jnp.fft.fft(y)) ** 2
        return 10.0 * jnp.log10(jnp.maximum(S, s_floor))

    def _offset(model_db):
        # free dB intercept: 'any reference level' means the fit matches
        # the spectral SHAPE; the optimal constant offset is the masked
        # mean residual, solved analytically per evaluation
        return ((target - model_db) * mask).sum() / mask.sum()

    def loss_fn(theta_n):
        m_db = spectrum_db(theta_n)
        r = jnp.where(mask, m_db + _offset(m_db) - target, 0.0)
        return (r ** 2).sum() / mask.sum()

    theta_n = {"log_gamma": jnp.asarray(np.log(float(init["gamma"])),
                                        dtype=rdt)}
    for n in orders:
        theta_n[f"beta{n}_n"] = jnp.asarray(
            float(init[f"beta{n}"]) * scales[f"beta{n}"], dtype=rdt)

    schedule = optax.cosine_decay_schedule(float(learning_rate),
                                           max(int(steps), 1))
    opt = optax.adam(schedule)
    opt_state = opt.init(theta_n)

    @jax.jit
    def step_fn(th, st):
        loss, grads = jax.value_and_grad(loss_fn)(th)
        updates, st = opt.update(grads, st, th)
        return optax.apply_updates(th, updates), st, loss

    loss_jit = jax.jit(loss_fn)   # eager evaluation fails on the axon TPU
    history = [float(loss_jit(theta_n))]
    for _ in range(int(steps)):
        theta_n, opt_state, loss = step_fn(theta_n, opt_state)
        history.append(float(loss))
        if not np.isfinite(history[-1]):
            raise FloatingPointError(
                f"fit diverged at step {len(history) - 1}; lower the "
                f"learning rate or improve init"
            )
        if history[-1] < float(tol_db) ** 2:
            break
    fitted = {"gamma": float(np.exp(theta_n["log_gamma"]))}
    for n in orders:
        fitted[f"beta{n}"] = (float(theta_n[f"beta{n}_n"])
                              / scales[f"beta{n}"])
    m_db = jax.jit(spectrum_db)(theta_n)
    model_db = np.asarray(m_db + _offset(m_db), dtype=np.float64)
    loss_final = float(
        (((model_db - np.asarray(target)) * np.asarray(mask)) ** 2).sum()
        / np.asarray(mask).sum()
    )
    return FitResult(
        params=fitted,
        loss_db2=loss_final,
        loss_history=np.asarray(history),
        gain_db=model_db,
        n_steps=len(history) - 1,
    )


def make_launch_gain_model(
    cfg: SimulationConfig,
    *,
    frame: str = "rotating",
    wave: int = 2,
    precision: Optional[str] = None,
):
    """Like :func:`make_gain_model` but differentiable in the LAUNCH
    CONDITION too: returns ``gain_db(p_in (4,), phase_in (4,), coeffs)``
    with the initial amplitudes built in-trace (``sqrt(p) e^{i phase}``)
    -- the surface behind the pump-noise budget (``d gain_dB /
    d pump_dB`` and ``d gain_dB / d phase`` by one ``jax.grad`` each).
    Measures at the last saved grid point, like the batched engines."""
    from ..utils.precision import real_dtype

    validate_config(cfg)
    prec = _resolve_precision(precision, "make_launch_gain_model")
    rdt = real_dtype(prec)
    n_steps = _observed_steps(cfg)
    f = make_rhs_yaman(frame=frame)
    dz = jnp.asarray(float(cfg.dz), dtype=rdt)
    # the tiny floor keeps d sqrt/dp finite at exactly-zero launches
    # (vacuum idler): the dB-transfer of a zero-power wave is 0 anyway
    p_floor = 1e-300 if prec == "x64" else 1e-30

    def gain_db(p_in, phase_in, coeffs: RHSCoeffs):
        p = jnp.asarray(p_in, dtype=rdt)
        ph = jnp.asarray(phase_in, dtype=rdt)
        A0 = jnp.sqrt(jnp.maximum(p, p_floor)) * jax.lax.complex(
            jnp.cos(ph), jnp.sin(ph))
        res = integrate_reduce(
            f, A0, coeffs, z0=jnp.zeros((), rdt), dz=dz, n_steps=n_steps,
            save_every=n_steps, reduce_init=jnp.zeros((), rdt),
            reduce_fn=lambda acc, y: acc, check_nan=False,
        )
        p_out = jnp.abs(res.y_final[..., wave]) ** 2
        return 10.0 * jnp.log10(p_out / p[wave])

    return jax.jit(gain_db)  # see make_gain_model: eager axon dispatch fails


def power_transfer_db_per_db(
    cfg: SimulationConfig,
    *,
    gamma: float,
    alpha: float,
    delta_beta: float,
    p_in,
    phase_in=None,
    wave: int = 2,
    precision: Optional[str] = None,
) -> np.ndarray:
    """EXACT small-signal transfer of each launch power to the measured
    gain, in dB-per-dB (``d gain_dB / d P_j_dB``), by one reverse-mode
    gradient through the solver: the pump-RIN transfer coefficients of
    the amplifier.  Oracle: the Monte-Carlo regression
    (``noise.pump_rin_transfer_monte_carlo``) reproduces these slopes
    within its standard errors."""
    from ..utils.precision import real_dtype

    prec = _resolve_precision(precision, "power_transfer_db_per_db")
    rdt = jnp.dtype(real_dtype(prec))
    gain = make_launch_gain_model(cfg, wave=wave, precision=prec)
    coeffs = RHSCoeffs(gamma=jnp.asarray(float(gamma), dtype=rdt),
                       alpha=jnp.asarray(float(alpha), dtype=rdt),
                       delta_beta=jnp.asarray(float(delta_beta), dtype=rdt))
    p = np.asarray(p_in, dtype=np.float64).reshape(4)
    ph = jnp.asarray(np.zeros(4) if phase_in is None
                     else np.asarray(phase_in, dtype=np.float64), dtype=rdt)
    if p[wave] <= 0.0:
        raise ValueError(f"wave {wave} carries no input power")
    g = np.asarray(jax.grad(lambda pv: gain(pv, ph, coeffs))(
        jnp.asarray(p, dtype=rdt)), dtype=np.float64)
    # dG/d(10 log10 P_j) = dG/dP_j * P_j ln(10)/10; exactly-zero launches
    # have zero dB-transfer by definition
    return np.where(p > 0.0, g * p * (np.log(10.0) / 10.0), 0.0)


def phase_transfer_db_per_rad(
    cfg: SimulationConfig,
    *,
    gamma: float,
    alpha: float,
    delta_beta: float,
    p_in,
    phase_in=None,
    wave: int = 2,
    precision: Optional[str] = None,
) -> np.ndarray:
    """EXACT transfer of each launch PHASE to the measured gain
    [dB/rad] by one reverse-mode gradient -- zero for a phase-insensitive
    amplifier (signal-only seed: the PIA gain cannot depend on any
    absolute phase), large for the PSA near its max-gain phase crossing
    (the phase-noise budget of phase-sensitive operation)."""
    from ..utils.precision import real_dtype

    prec = _resolve_precision(precision, "phase_transfer_db_per_rad")
    rdt = jnp.dtype(real_dtype(prec))
    gain = make_launch_gain_model(cfg, wave=wave, precision=prec)
    coeffs = RHSCoeffs(gamma=jnp.asarray(float(gamma), dtype=rdt),
                       alpha=jnp.asarray(float(alpha), dtype=rdt),
                       delta_beta=jnp.asarray(float(delta_beta), dtype=rdt))
    p = jnp.asarray(np.asarray(p_in, dtype=np.float64).reshape(4),
                    dtype=rdt)
    ph0 = np.zeros(4) if phase_in is None else np.asarray(phase_in,
                                                          dtype=np.float64)
    if float(p[wave]) <= 0.0:
        raise ValueError(f"wave {wave} carries no input power")
    g = jax.grad(lambda phv: gain(p, phv, coeffs))(
        jnp.asarray(ph0, dtype=rdt))
    return np.asarray(g, dtype=np.float64)
