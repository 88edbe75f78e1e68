"""Renderer tests: projection, sizing, colormap, depth, golden hash
(SURVEY §4.6)."""

import hashlib

import numpy as np

from nbody3d_tpu.render.colormap import velocity_colormap
from nbody3d_tpu.render.rasterize import project_points, render_points
from nbody3d_tpu.utils.camera import Camera


def centered_camera(radius=5.0):
    return Camera(target=np.zeros(3), radius=radius)


def test_colormap_reference_formula():
    """(v, 1-|v-0.5|, 1-v) at |vel|/40 (nbody3d.js:371-380)."""
    np.testing.assert_allclose(velocity_colormap(0.0), [0.0, 0.5, 1.0])
    np.testing.assert_allclose(velocity_colormap(20.0), [0.5, 1.0, 0.5])
    np.testing.assert_allclose(velocity_colormap(40.0), [1.0, 0.5, 0.0])
    np.testing.assert_allclose(velocity_colormap(80.0), [1.0, 0.0, 0.0])  # clamped


def test_project_center_body():
    cam = centered_camera()
    px, py, depth, w = project_points(np.zeros((1, 3)), cam, 640, 480)
    assert np.isclose(px[0], 320.0)
    assert np.isclose(py[0], 240.0)
    assert 0.0 < depth[0] < 1.0
    assert np.isclose(w[0], 5.0)  # view-space distance


def test_single_body_renders_centered_disc():
    cam = centered_camera()
    pos_mass = np.array([[0, 0, 0, 1e6]], np.float32)
    vel = np.zeros((1, 4), np.float32)
    img = render_points(pos_mass, vel, cam, width=256, height=256, size_factor=1000.0)
    # center pixel colored with colormap(0) = (0, .5, 1) -> (0, 127, 255)
    center = img[128, 128]
    assert center[2] == 255 and center[1] in (127, 128) and center[0] == 0
    # corners are background
    assert tuple(img[0, 0]) == (0, 0, 0)
    # mass 1e6 -> world radius ~62/1000 -> ~2.75 px at this resolution:
    # a proper disc, not a single pixel
    lit = (img.sum(axis=2) > 0).sum()
    assert lit > 4


def test_depth_test_closer_wins():
    cam = centered_camera()
    # Two coincident-in-screen bodies at different depths with different
    # speeds (=> colors); the closer (z = +1 toward camera at (0,0,5)).
    pos_mass = np.array([[0, 0, 1.0, 1e6], [0, 0, -1.0, 1e6]], np.float32)
    vel = np.array([[40.0, 0, 0, 0], [0.0, 0, 0, 0]], np.float32)  # near: red-ish
    img = render_points(pos_mass, vel, cam, width=64, height=64, size_factor=1000.0)
    center = img[32, 32]
    # near body color = colormap(1) = (1, .5, 0)
    assert center[0] == 255 and center[2] == 0


def test_behind_camera_culled():
    cam = centered_camera()
    pos_mass = np.array([[0, 0, 100.0, 1e6]], np.float32)  # behind eye at z=5
    vel = np.zeros((1, 4), np.float32)
    img = render_points(pos_mass, vel, cam, width=32, height=32, size_factor=1000.0)
    assert img.sum() == 0


def test_min_size_clamp_keeps_far_bodies_visible():
    """2*dist/f minimum (nbody3d.js:358): a tiny-mass far body still lights
    at least one pixel."""
    cam = centered_camera(radius=50.0)
    pos_mass = np.array([[0, 0, 0, 1.0]], np.float32)
    vel = np.zeros((1, 4), np.float32)
    img = render_points(pos_mass, vel, cam, width=64, height=64, size_factor=1000.0)
    assert (img.sum(axis=2) > 0).sum() >= 1


def test_golden_hash_stable():
    """Determinism lock: fixed small scene hashes identically across runs."""
    rng = np.random.default_rng(42)
    n = 200
    pos_mass = np.concatenate(
        [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(10, 50, (n, 1))], axis=1
    ).astype(np.float32)
    vel = np.concatenate(
        [rng.normal(scale=15.0, size=(n, 3)), np.zeros((n, 1))], axis=1
    ).astype(np.float32)
    cam = centered_camera()
    img1 = render_points(pos_mass, vel, cam, width=128, height=96, size_factor=1000.0)
    img2 = render_points(pos_mass, vel, cam, width=128, height=96, size_factor=1000.0)
    assert hashlib.sha256(img1.tobytes()).hexdigest() == hashlib.sha256(img2.tobytes()).hexdigest()
    assert (img1.sum(axis=2) > 0).sum() > 50  # plenty of bodies visible


def test_save_png(tmp_path):
    from nbody3d_tpu.render.image import save_png

    img = np.zeros((8, 8, 3), np.uint8)
    img[2, 3] = [255, 10, 20]
    path = tmp_path / "f.png"
    save_png(str(path), img)
    from PIL import Image

    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, img)


def test_direction_colormap():
    """normalize(vel)*0.5+0.5 (nbody3d.js:381)."""
    from nbody3d_tpu.render.colormap import direction_colormap

    rgb = direction_colormap(np.array([[10.0, 0, 0], [0, -5.0, 0], [0, 0, 0]]))
    np.testing.assert_allclose(rgb[0], [1.0, 0.5, 0.5])
    np.testing.assert_allclose(rgb[1], [0.5, 0.0, 0.5])
    np.testing.assert_allclose(rgb[2], [0.5, 0.5, 0.5])  # zero vel -> gray


def test_render_color_mode_direction():
    cam = centered_camera()
    pos_mass = np.array([[0, 0, 0, 1e6]], np.float32)
    vel = np.array([[50.0, 0, 0, 0]], np.float32)  # +x => red-dominant
    img = render_points(pos_mass, vel, cam, width=128, height=128,
                        size_factor=1000.0, color_mode="direction")
    center = img[64, 64]
    assert center[0] == 255 and center[1] in (127, 128) and center[2] in (127, 128)


def test_large_splat_path_matches_offset_loop():
    """The per-body disc fast path (r > _SMALL_MAX) must produce exactly
    what the shared offset loop would: force all bodies down one path or
    the other by scaling radii, same scene."""
    from nbody3d_tpu.render import rasterize

    rng = np.random.default_rng(5)
    n = 64
    pos_mass = np.concatenate(
        [rng.normal(scale=1.0, size=(n, 3)), rng.uniform(1e4, 8e4, (n, 1))],
        axis=1,
    ).astype(np.float32)
    vel = rng.normal(size=(n, 4)).astype(np.float32)
    cam = Camera(target=np.zeros(3))
    kw = dict(width=160, height=120, size_factor=100.0, resolve="numpy")
    img_mixed = rasterize.render_points(pos_mass, vel, cam, **kw)
    # force everything through the offset loop by raising the threshold
    old = rasterize._SMALL_MAX
    try:
        rasterize._SMALL_MAX = 10**9
        img_loop = rasterize.render_points(pos_mass, vel, cam, **kw)
        rasterize._SMALL_MAX = 0  # everything through the per-body path
        img_disc = rasterize.render_points(pos_mass, vel, cam, **kw)
    finally:
        rasterize._SMALL_MAX = old
    np.testing.assert_array_equal(img_mixed, img_loop)
    np.testing.assert_array_equal(img_mixed, img_disc)


def test_native_resolve_matches_numpy():
    """The C depth-resolve (native/_raster.c) is bit-identical to the
    numpy two-regime resolve on a dense multi-scale scene (overlapping
    splats, heavy centrals, partially off-screen discs)."""
    from nbody3d_tpu import native

    if native.raster is None:
        import pytest

        pytest.skip("no C compiler for the native raster module")
    rng = np.random.default_rng(11)
    n = 4000
    pos_mass = np.concatenate(
        [rng.normal(scale=2.5, size=(n, 3)), rng.uniform(10, 50, (n, 1))],
        axis=1,
    ).astype(np.float32)
    pos_mass[:3, 3] = 1e7  # big splats incl. clipped ones
    pos_mass[1, :3] = [4.0, 4.0, 0.0]
    vel = rng.normal(scale=5.0, size=(n, 4)).astype(np.float32)
    cam = Camera(target=np.zeros(3), radius=3.0)
    kw = dict(width=320, height=240, prep="host")
    a = render_points(pos_mass, vel, cam, resolve="numpy", **kw)
    b = render_points(pos_mass, vel, cam, resolve="native", **kw)
    np.testing.assert_array_equal(a, b)


def test_device_prep_matches_host():
    """The device (f32 jnp) projection/color/sort prep — the 16M-scale
    path (VERDICT r2 #7) — produces the same frame as the host f64 prep
    on a dense multi-scale scene (minor sub-pixel rounding differences
    allowed, but none observed on this seed)."""
    rng = np.random.default_rng(9)
    n = 5000
    pos_mass = np.concatenate(
        [rng.normal(scale=2.5, size=(n, 3)), rng.uniform(10, 50, (n, 1))],
        axis=1,
    ).astype(np.float32)
    pos_mass[0, 3] = 1e7
    vel = rng.normal(scale=5.0, size=(n, 4)).astype(np.float32)
    cam = Camera(target=np.zeros(3), radius=5.0)
    kw = dict(width=320, height=240)
    a = render_points(pos_mass, vel, cam, prep="host", **kw)
    b = render_points(pos_mass, vel, cam, prep="device", **kw)
    agree = (a == b).all(axis=2).mean()
    assert agree > 0.999, agree


def test_device_resolve_matches_host():
    """The on-accelerator scatter-min resolve (the relay-friendly 16M
    path) reproduces the exact host resolve up to its stated contract:
    16-bit depth test, rgb565 color (<= 4/255 per channel after bit
    replication).  Pixel winners only differ where two splats land
    within 2^-16 of the depth range."""
    rng = np.random.default_rng(13)
    n = 20_000
    pos_mass = np.concatenate(
        [rng.normal(scale=2.5, size=(n, 3)), rng.uniform(10, 50, (n, 1))],
        axis=1,
    ).astype(np.float32)
    pos_mass[:2, 3] = 1e7  # large splats exercise the host-prefix path
    vel = rng.normal(scale=5.0, size=(n, 4)).astype(np.float32)
    cam = Camera(target=np.zeros(3), radius=4.0)
    kw = dict(width=320, height=240)
    a = render_points(pos_mass, vel, cam, prep="device", **kw)
    b = render_points(pos_mass, vel, cam, resolve="device", **kw)
    # background and lit sets agree except for rare depth-tie flips
    lit_a = a.any(axis=2)
    lit_b = b.any(axis=2)
    assert (lit_a == lit_b).mean() > 0.999
    both = lit_a & lit_b
    diff = np.abs(a[both].astype(int) - b[both].astype(int))
    close = (diff <= 8).all(axis=1)  # rgb565 quantization band
    assert close.mean() > 0.995, close.mean()
    # determinism: same call twice is bit-identical
    c = render_points(pos_mass, vel, cam, resolve="device", **kw)
    np.testing.assert_array_equal(b, c)


def test_device_resolve_single_body():
    """A single small body lands on the same pixel with the same
    (quantized) color through the device resolve."""
    cam = centered_camera()
    pos_mass = np.array([[0, 0, 0, 100.0]], np.float32)
    vel = np.zeros((1, 4), np.float32)
    kw = dict(width=128, height=128, size_factor=1000.0)
    a = render_points(pos_mass, vel, cam, **kw)
    b = render_points(pos_mass, vel, cam, resolve="device", **kw)
    assert a[64, 64].any() and b[64, 64].any()
    assert np.abs(a[64, 64].astype(int) - b[64, 64].astype(int)).max() <= 8


def _pallas_vs_host_images(n, seed, width, height, radius=4.0,
                           heavy=2):
    """Render the same scene through the host resolve and the Pallas
    device resolve, BOTH fed by the device (f32) prep, so any pixel
    difference is the resolve's."""
    from nbody3d_tpu.render import rasterize

    rng = np.random.default_rng(seed)
    pos_mass = np.concatenate(
        [rng.normal(scale=2.5, size=(n, 3)), rng.uniform(10, 50, (n, 1))],
        axis=1,
    ).astype(np.float32)
    if heavy:
        pos_mass[:heavy, 3] = 1e7  # r >= 2: exercises the host-prefix stamp
    vel = rng.normal(scale=5.0, size=(n, 4)).astype(np.float32)
    cam = Camera(target=np.zeros(3), radius=radius)
    kw = dict(width=width, height=height)
    a = render_points(pos_mass, vel, cam, prep="device", **kw)
    b = render_points(pos_mass, vel, cam, resolve="pallas", **kw)
    return a, b


def test_compact_large_order_and_overflow():
    """compact_large: packs exactly the visible r >= 2 splats, preserves
    input order, round-trips the bit-exact u32 fields, and counts past
    its capacity (the caller's fallback trigger)."""
    import jax.numpy as jnp

    from nbody3d_tpu.render.pallas_resolve import compact_large

    rng = np.random.default_rng(2)
    n = 4096
    cx = jnp.asarray(rng.integers(0, 640, n), jnp.int32)
    cy = jnp.asarray(rng.integers(0, 480, n), jnp.int32)
    depth = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.uint32)
    rgb = jnp.asarray(rng.integers(0, 1 << 24, n), jnp.uint32)
    r = jnp.asarray(rng.uniform(0.5, 4.0, n), jnp.float32)
    visible = jnp.asarray(rng.random(n) < 0.7)

    buf, k = compact_large(cx, cy, depth, rgb, r, visible, kmax=1 << 12)
    buf, k = np.asarray(buf), int(k)
    mask = np.asarray(visible) & (np.asarray(r) >= 2.0)
    idx = np.nonzero(mask)[0]
    assert k == len(idx) and k > 0
    np.testing.assert_array_equal(buf[:k, 0].astype(np.int64),
                                  np.asarray(cx)[idx])
    np.testing.assert_array_equal(
        np.ascontiguousarray(buf[:k, 2]).view(np.uint32),
        np.asarray(depth)[idx])
    np.testing.assert_array_equal(
        np.ascontiguousarray(buf[:k, 3]).view(np.uint32),
        np.asarray(rgb)[idx])
    np.testing.assert_array_equal(buf[:k, 4], np.asarray(r)[idx])

    # overflow: capacity below the true count still reports the count
    # (rows past kmax land in the dump slot, never corrupt the prefix)
    kmax = max(k // 2, 1)
    buf2, k2 = compact_large(cx, cy, depth, rgb, r, visible, kmax=kmax)
    assert int(k2) == k
    np.testing.assert_array_equal(np.asarray(buf2)[:kmax], buf[:kmax])


def test_pallas_resolve_bit_identical():
    """The Pallas on-device resolve (render/pallas_resolve.py) is
    BIT-identical to the host packed-u64 resolve on the same device
    prep — full 32-bit depth test, full rgb24, including the composite
    with host-stamped large splats (VERDICT r3 #5)."""
    a, b = _pallas_vs_host_images(20_000, 13, 320, 240)
    np.testing.assert_array_equal(a, b)


def test_pallas_resolve_multi_bin_boundaries():
    """Splats straddling bin boundaries (the halo/fold path): a frame
    wider than one 256-px column bin and taller than several 8-px row
    bins, dense enough that many stamps cross bin edges."""
    a, b = _pallas_vs_host_images(6_000, 7, 640, 100, radius=2.0, heavy=0)
    np.testing.assert_array_equal(a, b)


def test_pallas_resolve_tier3_large_splats():
    """Round 5: splats with r in [16, 64] rasterize ON-DEVICE (tier 3,
    64-px halo bins) — the frame must still be bit-identical to the
    host resolve, with NO host fallback engaged (n_host == 0)."""
    import jax
    import jax.numpy as jnp

    from nbody3d_tpu.render import rasterize
    from nbody3d_tpu.render.pallas_resolve import resolve_all_pallas

    rng = np.random.default_rng(11)
    n = 3000
    pos_mass = np.concatenate(
        [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(10, 50, (n, 1))],
        axis=1,
    ).astype(np.float32)
    # a spread of masses that project to the full radius range incl.
    # the 16..64 px tier at this close camera
    pos_mass[:64, 3] = np.geomspace(1e5, 5e9, 64)
    vel = rng.normal(scale=5.0, size=(n, 4)).astype(np.float32)
    cam = Camera(target=np.zeros(3), radius=2.0)
    kw = dict(width=320, height=240)
    a = render_points(pos_mass, vel, cam, prep="device", **kw)
    b = render_points(pos_mass, vel, cam, resolve="pallas", **kw)
    np.testing.assert_array_equal(a, b)
    # the device covered everything: no host-composite records
    out = rasterize._prep_device_unsorted_raw(
        pos_mass, vel, cam, 320, 240, 1000.0, 64, "magnitude")
    r = np.asarray(jax.device_get(out[4]))
    vis = np.asarray(jax.device_get(out[5]))
    assert ((r >= 16) & (r <= 64) & vis).sum() > 0, "tier 3 not exercised"
    _, _, n_host = resolve_all_pallas(
        *out, width=320, height=240, interpret=True)
    assert int(jax.device_get(n_host)) == 0


def test_pallas_resolve_fallback_beyond_tier_rmax():
    """max_radius_px > 64 sends the r > 64 splats through the host
    fallback composite; the frame still equals the all-host resolve."""
    rng = np.random.default_rng(12)
    n = 1500
    pos_mass = np.concatenate(
        [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(10, 50, (n, 1))],
        axis=1,
    ).astype(np.float32)
    pos_mass[:4, 3] = 5e10  # huge: projects past 64 px
    vel = rng.normal(scale=5.0, size=(n, 4)).astype(np.float32)
    cam = Camera(target=np.zeros(3), radius=2.0)
    kw = dict(width=256, height=160, max_radius_px=96)
    a = render_points(pos_mass, vel, cam, prep="device", **kw)
    b = render_points(pos_mass, vel, cam, resolve="pallas", **kw)
    np.testing.assert_array_equal(a, b)


def test_dekker_square_is_exact():
    """The kernel's circle predicate d2 <= r² must match the host's
    f64 compare for EVERY f32 radius: (hi, lo) = dekker(r) carries r²
    exactly, so d2 < hi | (d2 == hi & lo >= 0)  <=>  d2 <= f64(r)²."""
    import jax

    from nbody3d_tpu.render.pallas_resolve import _dekker_sq

    rng = np.random.default_rng(0)
    r = np.concatenate([
        rng.uniform(0.5, 64.0, 20_000).astype(np.float32),
        # adversarial: radii whose squares sit next to integers
        np.sqrt(np.arange(1, 4097, dtype=np.float64)).astype(np.float32),
        np.nextafter(
            np.sqrt(np.arange(1, 4097, dtype=np.float64)).astype(np.float32),
            np.float32(0.0),
        ),
    ])
    hi, lo = map(np.asarray, jax.jit(_dekker_sq)(r))
    r64 = r.astype(np.float64)
    # exactness: hi + lo == r*r in f64 (both exact for 24-bit r)
    np.testing.assert_array_equal(hi.astype(np.float64) + lo, r64 * r64)
    # the predicate agrees with f64 on every integer d2 in range
    for d2 in (0.0, 1.0, 2.0, 255.0, 256.0, 4095.0, 4096.0):
        want = d2 <= r64 * r64
        got = (d2 < hi) | ((d2 == hi) & (lo >= 0))
        np.testing.assert_array_equal(got, want)


def test_pallas_resolve_corner_radius_threshold():
    """Bodies engineered around the r = 1, sqrt(2), 2 inclusion edges:
    the kernel's f32 thresholds must reproduce the host's f64 circle
    test exactly."""
    from nbody3d_tpu.render import rasterize

    n = 512
    rng = np.random.default_rng(3)
    pos_mass = np.concatenate(
        [rng.normal(scale=1.0, size=(n, 3)),
         rng.uniform(10, 50, (n, 1))], axis=1).astype(np.float32)
    vel = rng.normal(scale=5.0, size=(n, 4)).astype(np.float32)
    cam = Camera(target=np.zeros(3), radius=5.0)
    # sweep size_factor so projected radii cross the thresholds
    for sf in (400.0, 700.0, 1000.0, 1800.0):
        kw = dict(width=200, height=160, size_factor=sf)
        a = render_points(pos_mass, vel, cam, prep="device", **kw)
        b = render_points(pos_mass, vel, cam, resolve="pallas", **kw)
        np.testing.assert_array_equal(a, b)
