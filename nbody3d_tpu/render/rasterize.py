"""Point-splat rasterizer: circles with depth test, one per body.

Reference semantics rebuilt (``nbody3d.js:313-415``):

- world radius from mass: ``(m / 4.189)^(1/3)`` — unit-density sphere
  (``nbody3d.js:346``), with the minimum apparent-size clamp
  ``max(radius, 2 * |viewVec| / f)`` that keeps far particles ~2px
  (``nbody3d.js:358``), all scaled by ``sizeRatio = 1/sizeFactor``
  (``camera.js:61``);
- camera-facing billboard + circle-SDF discard (``nbody3d.js:354-358,
  377-378``) → a screen-space disc of the projected billboard radius;
- color by velocity magnitude (``nbody3d.js:380``);
- depth-tested with 'less' (``nbody3d.js:401-405``), black clear color
  (``nbody3d.js:421``).
- WebGPU clips ``0 <= z_clip <= w`` while the reference uses a GL-style
  projection matrix mapping [near, far] -> z_ndc in [-1, 1]
  (``matrix.js:106-129``); the net effect — an effective near plane at
  ~2·near·far/(near+far) — is reproduced here for parity
  (see utils.mathlib.perspective).

Implementation: vectorized numpy.  Depth resolve is a single deterministic
scatter-min of packed ``(depth_bits << 32) | rgb24`` uint64 keys — IEEE
non-negative floats order like their bit patterns, so minimum-by-key is the
depth test, with ties broken by color for full determinism (the reference's
GPU rasterization order is unspecified for coincident depths).  Work is
proportional to total splat area: bodies are sorted by radius so each stamp
offset only touches bodies large enough to cover it.  The renderer is off
the hot path by design (SURVEY P3): correctness and determinism over
throughput.
"""

from __future__ import annotations

import math

import numpy as np

from nbody3d_tpu.render.colormap import direction_colormap, velocity_colormap
from nbody3d_tpu.utils import mathlib
from nbody3d_tpu.utils.camera import Camera


def project_points(
    pos: np.ndarray,
    camera: Camera,
    width: int,
    height: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Project world positions. Returns (px, py, depth01, view_depth).

    ``depth01`` is the WebGPU depth-buffer value z_clip/w in [0, 1];
    ``view_depth`` is the positive view-space distance along the camera
    axis (used for apparent-size math).
    """
    aspect = width / height
    vp, _f = camera.view_proj(aspect)
    n = pos.shape[0]
    homo = np.concatenate([pos, np.ones((n, 1), dtype=pos.dtype)], axis=1)
    clip = homo @ vp.T  # (N, 4)
    w = clip[:, 3]
    safe_w = np.where(np.abs(w) < 1e-30, 1e-30, w)
    ndc = clip[:, :3] / safe_w[:, None]
    px = (ndc[:, 0] + 1.0) * 0.5 * width
    py = (1.0 - ndc[:, 1]) * 0.5 * height
    depth01 = clip[:, 2] / safe_w  # WebGPU z in [0,1] visible range
    return px, py, depth01, w  # w_clip == view-space distance for this proj


def render_points(
    pos_mass: np.ndarray,
    vel: np.ndarray,
    camera: Camera,
    *,
    width: int = 1024,
    height: int = 768,
    size_factor: float = 1000.0,
    max_radius_px: int = 64,
    background: tuple[int, int, int] = (0, 0, 0),
    color_mode: str = "magnitude",
) -> np.ndarray:
    """Render one frame. Returns (H, W, 3) uint8.

    ``color_mode``: "magnitude" (``nbody3d.js:380``) or "direction" (the
    reference's alternate visualization, ``nbody3d.js:381``).
    """
    pos = np.asarray(pos_mass, dtype=np.float64)[:, :3]
    mass = np.asarray(pos_mass, dtype=np.float64)[:, 3]
    vel3 = np.asarray(vel, dtype=np.float64)[:, :3]

    aspect = width / height
    _vp, f = camera.view_proj(aspect)
    px, py, depth01, view_w = project_points(pos, camera, width, height)

    # World-space billboard half-extent (nbody3d.js:346,358; camera.js:61).
    view_vec_len = np.linalg.norm(pos - camera.position[None, :], axis=1)
    radius_world = np.cbrt(mass / 4.189)
    half_extent = np.maximum(radius_world, 2.0 * view_vec_len / f) / size_factor

    # Projected pixel radius: perpendicular world length L at view depth d
    # spans L * f / d in NDC y, i.e. L * f / d * H/2 pixels.
    safe_d = np.maximum(view_w, 1e-30)
    r_px = half_extent * f / safe_d * (height * 0.5)

    visible = (view_w > 0) & (depth01 >= 0.0) & (depth01 <= 1.0)
    r_px = np.clip(r_px, 0.5, max_radius_px)
    visible &= (px + r_px >= 0) & (px - r_px < width)
    visible &= (py + r_px >= 0) & (py - r_px < height)

    idx = np.nonzero(visible)[0]
    h, w_ = height, width
    img = np.empty((h, w_, 3), dtype=np.uint8)
    img[:] = np.asarray(background, dtype=np.uint8)
    if idx.size == 0:
        return img

    if color_mode == "direction":
        rgb = (direction_colormap(vel3[idx]) * 255.0).astype(np.uint32)
    else:
        speed = np.linalg.norm(vel3[idx], axis=1)
        rgb = (velocity_colormap(speed) * 255.0).astype(np.uint32)
    rgb24 = (rgb[:, 0] << 16) | (rgb[:, 1] << 8) | rgb[:, 2]

    cx = np.round(px[idx]).astype(np.int64)
    cy = np.round(py[idx]).astype(np.int64)
    depth = depth01[idx].astype(np.float32)
    keys = (np.ascontiguousarray(depth).view(np.uint32).astype(np.uint64) << 32) | rgb24

    # Sort by radius (desc) so stamp offset (dx,dy) only visits the first k
    # bodies with r >= |offset|.
    r = r_px[idx]
    order = np.argsort(-r, kind="stable")
    r = r[order]
    cx, cy, keys = cx[order], cy[order], keys[order]
    neg_r = -r  # ascending for searchsorted

    buf = np.full(h * w_, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    rmax = int(math.ceil(r[0]))
    for dy in range(-rmax, rmax + 1):
        for dx in range(-rmax, rmax + 1):
            d = math.hypot(dx, dy)
            # circle SDF inclusion: |offset| <= r  (nbody3d.js:377-378)
            k = np.searchsorted(neg_r, -d, side="right")
            if k == 0:
                continue
            x = cx[:k] + dx
            y = cy[:k] + dy
            ok = (x >= 0) & (x < w_) & (y >= 0) & (y < h)
            if not ok.any():
                continue
            flat = y[ok] * w_ + x[ok]
            np.minimum.at(buf, flat, keys[:k][ok])

    hit = buf != np.uint64(0xFFFFFFFFFFFFFFFF)
    rgb_out = (buf[hit] & np.uint64(0xFFFFFF)).astype(np.uint32)
    flat_img = img.reshape(-1, 3)
    flat_img[hit, 0] = (rgb_out >> 16) & 0xFF
    flat_img[hit, 1] = (rgb_out >> 8) & 0xFF
    flat_img[hit, 2] = rgb_out & 0xFF
    return img
