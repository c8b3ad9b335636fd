"""Short import alias: ``import psa_tpu`` -> the full framework package."""
import sys

import psa_simulation_ode_rk_mvp_dispersion_tpu as _pkg

sys.modules[__name__] = _pkg
