"""Closed-form small-signal (undepleted-pump) parametric gain.

The classical dual-pump FWM results (Agrawal ch. 10; Yaman-style convention
matching ``ops/rhs.py``): with constant pumps P1, P2 (lossless, undepleted)
and weak signal/idler, the linearized coupled equations give

    g^2 = C^2 - (kappa/2)^2,     C = 2 gamma sqrt(P1 P2),
    kappa = dbeta + gamma (P1 + P2)        (total nonlinear phase mismatch)

    PIA (idler unseeded):  G_s(z) = 1 + (C/g)^2 sinh^2(g z)
    (for kappa^2 > 4C^2, g is imaginary and sinh -> sin: oscillatory regime)

    PSA at kappa = 0 with |A4(0)| = |A3(0)|: gain extrema over the input
    signal phase are e^{+-2 C z} (G_max * G_min = 1).

These serve two roles: instant approximate spectra without integrating, and
independent analytic oracles for the numerical solvers (SURVEY.md section 4
test plan: "undepleted-pump PSA gain cosh/sinh closed form").
"""

from __future__ import annotations

import numpy as np


def parametric_g(gamma, P1, P2, delta_beta):
    """Parametric gain coefficient g [1/m] (complex-safe: imaginary g in the
    oscillatory regime is returned as its positive-real oscillation rate with
    a negative sign under the square -- use :func:`pia_signal_gain`)."""
    gamma = np.asarray(gamma, dtype=float)
    C = 2.0 * gamma * np.sqrt(np.asarray(P1, float) * np.asarray(P2, float))
    kappa = np.asarray(delta_beta, float) + gamma * (np.asarray(P1, float) + np.asarray(P2, float))
    return C, kappa, C**2 - (kappa / 2.0) ** 2


def pia_signal_gain(z, gamma, P1, P2, delta_beta):
    """Phase-insensitive (idler-unseeded) signal power gain G_s(z), exact in
    the undepleted-pump limit.  Broadcasts over any argument."""
    C, kappa, g2 = parametric_g(gamma, P1, P2, delta_beta)
    z = np.asarray(z, dtype=float)
    g = np.sqrt(np.abs(g2) + 1e-300)
    grow = (C / g) ** 2 * np.sinh(g * z) ** 2
    osc = (C / g) ** 2 * np.sin(g * z) ** 2
    # exactly phase-matched edge (g2 == 0): limit C^2 z^2
    lim = C**2 * z**2
    out = np.where(g2 > 0, grow, np.where(g2 < 0, osc, lim))
    return 1.0 + out


def psa_gain_extrema(z, gamma, P1, P2):
    """PSA gain extrema over input signal phase at kappa = 0 with an
    equal-magnitude idler seed: (G_max, G_min) = (e^{2Cz}, e^{-2Cz})."""
    gamma = np.asarray(gamma, dtype=float)
    C = 2.0 * gamma * np.sqrt(np.asarray(P1, float) * np.asarray(P2, float))
    r = 2.0 * C * np.asarray(z, dtype=float)
    return np.exp(r), np.exp(-r)
