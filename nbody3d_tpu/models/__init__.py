"""Initial-condition generators ("model families").

- :mod:`nbody3d_tpu.models.galaxy` — the reference's procedural multi-galaxy
  disk generator (``nbody3d.js:51-133``) plus its randomized run config
  (``nbody3d.js:163-177``), made deterministic via seeded numpy RNG.
- :mod:`nbody3d_tpu.models.plummer` — Plummer sphere (BASELINE config #2).
- :mod:`nbody3d_tpu.models.sphere` — uniform ball cloud (config #1) and the
  Fibonacci shell that exists as dead code in the reference
  (``util.js:135-152``).
- :mod:`nbody3d_tpu.models.registry` — named presets mapping to BASELINE's
  config ladder.
"""

from nbody3d_tpu.models.galaxy import (  # noqa: F401
    generate_galaxies,
    mass_to_radius,
    random_galaxy_configs,
)
from nbody3d_tpu.models.plummer import plummer_sphere  # noqa: F401
from nbody3d_tpu.models.sphere import fibonacci_shell, uniform_sphere  # noqa: F401
from nbody3d_tpu.models.registry import PRESETS, make_preset  # noqa: F401
