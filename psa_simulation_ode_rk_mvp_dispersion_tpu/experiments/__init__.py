"""Ready-made experiments wiring the full stack, and their default physics.

Capability parity with reference ``main.py``: ``main_single_simulation``
(:22-117), ``main_gain_spectrum`` (:119-203), ``main_gain_spectrum_dbeta``
(:206-280) -- with the same default physics (pump wavelengths, D/S values,
gamma, loss, powers) so a reference user lands on familiar numbers.  Unlike
the reference (experiments are edited source), every experiment takes keyword
overrides and is reachable from the CLI (``__main__.py``).

Extensions beyond the reference entry points: a mismatch scan (the working
version of the reference's stale ``scan_mismatch_seeded_signal``), a PSA
phase sweep, a 2-D pump-power x wavelength gain map, and the comb / pulse /
noise / SBS family experiments.

Split by model family (round 3); the public API is unchanged -- everything
re-exports here.
"""

from ._shared import _PM_DEFAULT, _dispersion_at_pump_center  # noqa: F401
from .comb import comb  # noqa: F401
from .lle import kerr_cavity  # noqa: F401
from .fwm4 import (  # noqa: F401
    gain_map,
    gain_spectrum,
    gain_spectrum_dbeta,
    mismatch_scan,
    psa_phase_sweep,
    single_simulation,
)
from .fitting import fit_gain  # noqa: F401
from .fluctuations import gain_ripple  # noqa: F401
from .noise import (  # noqa: F401
    mi_sideband_noise,
    noise_figure,
    soliton_jitter,
    soliton_link,
    soliton_squeezing,
    squeezing,
)
from .pulses import (  # noqa: F401
    _SC_BETAS_PS_KM,
    gnlse_pulse,
    supercontinuum,
    vector_pulse,
    vector_supercontinuum,
)
from .sbs import fwm_sbs  # noqa: F401

__all__ = [
    "single_simulation", "gain_spectrum", "gain_spectrum_dbeta",
    "mismatch_scan", "psa_phase_sweep", "gain_map", "comb", "gnlse_pulse",
    "vector_pulse", "supercontinuum", "vector_supercontinuum",
    "noise_figure", "fwm_sbs", "gain_ripple", "squeezing",
    "soliton_squeezing", "soliton_jitter", "soliton_link",
    "mi_sideband_noise", "fit_gain",
]
