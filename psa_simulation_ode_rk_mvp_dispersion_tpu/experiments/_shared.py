"""Shared experiment defaults (phase-matching config, parity helper).

The parity-critical dispersion default lives with the physics it encodes:
:func:`~..ops.phase_matching.dispersion_at_pump_center` (the NF-spectrum
lambda_ref bug of round 2, fixed in 6c0079b, was exactly an expansion-point
mistake -- keeping the convention in the phase-matching layer makes it a
single point of truth).
"""

from __future__ import annotations

from ..ops.phase_matching import (
    PhaseMatchingConfig,
    PhaseMatchingMethod,
    dispersion_at_pump_center as _dispersion_at_pump_center,
)

_PM_DEFAULT = PhaseMatchingConfig(
    method=PhaseMatchingMethod.SYMMETRIC_EVEN, even_orders=(2, 4), max_order=4,
    atol=0.0, rtol=1e-12,
)
