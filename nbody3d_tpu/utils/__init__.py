"""Host-side utilities: math, camera, checkpointing, profiling."""

from nbody3d_tpu.utils.mathlib import look_at, perspective  # noqa: F401
from nbody3d_tpu.utils.profiling import Ema, StepStats, Timer  # noqa: F401
