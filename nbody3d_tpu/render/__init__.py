"""Headless rendering: point-splat rasterizer + frame IO (SURVEY P3).

Replaces the reference's WebGPU billboard pipeline (``nbody3d.js:313-431``)
with an offline rasterizer fully decoupled from physics: the engine taps
state at chunk boundaries and frames are dumped to PNG/NPY on an
independent cadence — physics throughput never waits on pixels (the
reference, by contrast, couples one sim step to one vsync'd frame,
``nbody3d.js:474-505``).
"""

from nbody3d_tpu.render.colormap import velocity_colormap  # noqa: F401
from nbody3d_tpu.render.rasterize import project_points, render_points  # noqa: F401
from nbody3d_tpu.render.image import save_png  # noqa: F401
