"""MXU tile mesh deposit/gather (ops/mesh_pallas.py) vs the XLA oracles.

The Pallas path must reproduce ``tsc_deposit``/``tsc_gather`` exactly
(up to f32 accumulation order): the fast kernel covers in-box particles,
the XLA repair pass covers the rest, and the per-particle partition is
decided in integer cell coordinates so no contribution is dropped or
double-counted.  Runs in interpret mode on the CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody3d_tpu.ops import mesh_pallas as mp
from nbody3d_tpu.ops import pm as pm_mod
from nbody3d_tpu.ops.p3m import (
    _tsc_cells,
    accel_p3m,
    morton_keys,
    solve_accel_long,
    tsc_deposit,
    tsc_gather,
)
from nbody3d_tpu.ops.pm import _box

GRID = 64
BLOCK = 256
EPS2 = 1e-4


def _sorted_cloud(n=4096, outliers=64, seed=1):
    """Clustered cloud with a sparse halo (forces dirty tiles), Morton-
    sorted like accel_p3m lays it out."""
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    pos[:outliers] *= 40.0
    m = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
    pmj = jnp.asarray(np.concatenate([pos, m[:, None]], axis=1))
    ps = pmj[jnp.argsort(morton_keys(pmj, n), stable=True)]
    lo, h = _box(ps[:, :3], GRID)
    return ps, lo, h


def _cells(ps, lo, h):
    return _tsc_cells(ps[:, :3], lo, h, GRID)


class TestTileMesh:
    def test_deposit_matches_oracle(self):
        ps, lo, h = _sorted_cloud()
        c, w, f = _cells(ps, lo, h)
        corners, valid, dirty = mp.tile_corners(c, BLOCK, GRID)
        assert int(jnp.sum(dirty)) > 0, "fixture must exercise the repair path"
        rho = mp.deposit_tiles(c, f, ps[:, 3], corners, GRID, BLOCK,
                               interpret=True)
        rho = mp.repair_deposit(rho, c, w, ps[:, 3], valid, dirty, 16,
                                GRID, BLOCK)
        rho_o = tsc_deposit(ps[:, :3], ps[:, 3], lo, h, GRID)
        scale = float(jnp.max(jnp.abs(rho_o)))
        np.testing.assert_allclose(
            np.asarray(rho), np.asarray(rho_o), atol=2e-6 * scale
        )
        # total mass is conserved bit-for-bit-ish (sum order differs)
        assert abs(float(jnp.sum(rho) - jnp.sum(rho_o))) < 1e-5 * float(
            jnp.sum(rho_o)
        )

    def test_gather_matches_oracle(self):
        ps, lo, h = _sorted_cloud()
        c, w, f = _cells(ps, lo, h)
        corners, valid, dirty = mp.tile_corners(c, BLOCK, GRID)
        rng = np.random.default_rng(0)
        grids = jnp.asarray(rng.normal(size=(3, GRID**3)).astype(np.float32))
        acc = mp.gather_tiles(grids, c, f, corners, GRID, BLOCK,
                              interpret=True)
        acc = mp.repair_gather(acc, grids, c, w, valid, dirty, 16, GRID, BLOCK)
        acc_o = tsc_gather(grids, c, w, GRID)
        scale = float(jnp.max(jnp.abs(acc_o)))
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(acc_o), atol=2e-6 * scale
        )

    def test_mesh_accel_matches_jnp(self):
        ps, lo, h = _sorted_cloud()
        sigma = 1.5 * h
        a_p = mp.mesh_accel_pallas(ps, lo, h, sigma, grid=GRID, eps2=EPS2,
                                   block=BLOCK, interpret=True)
        a_j = mp.mesh_accel_jnp(ps, lo, h, sigma, grid=GRID, eps2=EPS2)
        scale = float(jnp.max(jnp.abs(a_j)))
        np.testing.assert_allclose(
            np.asarray(a_p), np.asarray(a_j), atol=5e-6 * scale
        )

    def test_unaligned_grid_corners_stay_8_aligned(self):
        """grid % 8 != 0 (reachable via SimConfig(pm_grid=100) on TPU —
        auto-dispatch accepts any 32 <= grid <= 128): the y-corner's
        UPPER clip bound must stay 8-aligned, or Mosaic's sublane-offset
        flooring shifts the kernel's box 1-7 cells below where the
        one-hot weights and the repair pass place it.  The alignment is
        the hardware contract (interpret mode can't catch it); oracle
        equality checks the validity bookkeeping still partitions
        exactly with the lowered corner."""
        grid = 100
        block = 16  # fine Morton tiles so some sit wholly near the +y face
        rng = np.random.default_rng(3)
        n = 8192
        # span the full box so tiles hit the +y face (where the clip binds)
        pos = rng.uniform(-50.0, 50.0, size=(n, 3)).astype(np.float32)
        m = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
        pmj = jnp.asarray(np.concatenate([pos, m[:, None]], axis=1))
        ps = pmj[jnp.argsort(morton_keys(pmj, n), stable=True)]
        lo, h = _box(ps[:, :3], grid)
        c, w, f = _tsc_cells(ps[:, :3], lo, h, grid)
        corners, valid, dirty = mp.tile_corners(c, block, grid)
        cy = np.asarray(corners[:, 1])
        by = mp._extents(grid)[1]
        # the fixture must actually reach the binding region of the clip
        assert (cy >= ((grid - by) & ~7)).any(), "no tile near the +y face"
        assert (cy % 8 == 0).all(), "unaligned y corner reached the kernel"
        assert (cy + by <= grid).all()
        rho = mp.deposit_tiles(c, f, ps[:, 3], corners, grid, block,
                               interpret=True)
        # 85 of 512 tiles are dirty in this fixture (uniform cloud +
        # face-clipped boxes): give the repair pass full headroom.
        rho = mp.repair_deposit(rho, c, w, ps[:, 3], valid, dirty,
                                len(corners) // 4, grid, block)
        rho_o = tsc_deposit(ps[:, :3], ps[:, 3], lo, h, grid)
        scale = float(jnp.max(jnp.abs(rho_o)))
        np.testing.assert_allclose(
            np.asarray(rho), np.asarray(rho_o), atol=2e-6 * scale
        )

    def test_deterministic(self):
        ps, lo, h = _sorted_cloud()
        c, w, f = _cells(ps, lo, h)
        corners, valid, dirty = mp.tile_corners(c, BLOCK, GRID)
        r1 = mp.deposit_tiles(c, f, ps[:, 3], corners, GRID, BLOCK,
                              interpret=True)
        r2 = mp.deposit_tiles(c, f, ps[:, 3], corners, GRID, BLOCK,
                              interpret=True)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    def test_overflow_diagnostic(self):
        """A too-small repair budget is detectable: mesh_overflow counts
        dirty tiles; budgets >= that count reproduce the oracle, smaller
        budgets are reported (never silently exact)."""
        ps, lo, h = _sorted_cloud()
        c, w, f = _cells(ps, lo, h)
        nd, ninv = jax.jit(
            mp.mesh_overflow, static_argnums=(1, 2, 3)
        )(c, BLOCK, GRID, 1)
        assert int(nd) >= 1 and int(ninv) >= int(nd)
        corners, valid, dirty = mp.tile_corners(c, BLOCK, GRID)
        rho_o = tsc_deposit(ps[:, :3], ps[:, 3], lo, h, GRID)
        rho_small = mp.repair_deposit(
            mp.deposit_tiles(c, f, ps[:, 3], corners, GRID, BLOCK,
                             interpret=True),
            c, w, ps[:, 3], valid, dirty, 1, GRID, BLOCK,
        )
        if int(nd) > 1:  # truncated budget must actually lose mass
            assert float(jnp.sum(rho_small)) < float(jnp.sum(rho_o)) * (
                1.0 - 1e-9
            )

    @pytest.mark.slow
    def test_grad_pallas_matches_jnp(self):
        """Custom-VJP pairing (Pallas primal, jnp backward): grad through
        the mesh path equals grad through the oracle.  slow: ~50 s of
        trace/compile (the erf-kernel FFT backward); the same pairing
        mechanism runs fast via test_pm_grad_pallas_matches_jnp."""
        ps, lo, h = _sorted_cloud(n=512, outliers=16)
        sigma = 1.5 * h

        def loss(be):
            def fn(ps_):
                a = mp.mesh_accel(
                    ps_, lo, h, sigma, grid=32, eps2=EPS2, block=256,
                    backend=be, interpret=True,
                )
                return jnp.sum(a * a)
            return fn

        g_j = np.asarray(jax.grad(loss("jnp"))(ps))
        g_p = np.asarray(jax.grad(loss("pallas"))(ps))
        scale = np.abs(g_j).max()
        np.testing.assert_allclose(g_p, g_j, rtol=1e-4, atol=1e-5 * scale)

    def test_cic_deposit_matches_oracle(self):
        """Order-2 (CIC) tile deposit + repair equals pm.cic_deposit."""
        ps, lo, h = _sorted_cloud()
        i0, f = pm_mod._cic_cells(ps[:, :3], lo, h, GRID)
        w2 = jnp.stack([1.0 - f, f], axis=0)
        corners, valid, dirty = mp.tile_corners(i0, BLOCK, GRID, order=2)
        assert int(jnp.sum(dirty)) > 0
        rho = mp.deposit_tiles(i0, f, ps[:, 3], corners, GRID, BLOCK,
                               order=2, interpret=True)
        rho = mp.repair_deposit(rho, i0, w2, ps[:, 3], valid, dirty, 16,
                                GRID, BLOCK, order=2)
        rho_o = pm_mod.cic_deposit(ps[:, :3], ps[:, 3], lo, h, GRID)
        scale = float(jnp.max(jnp.abs(rho_o)))
        np.testing.assert_allclose(
            np.asarray(rho), np.asarray(rho_o), atol=2e-6 * scale
        )

    def test_cic_gather_matches_oracle(self):
        ps, lo, h = _sorted_cloud()
        i0, f = pm_mod._cic_cells(ps[:, :3], lo, h, GRID)
        w2 = jnp.stack([1.0 - f, f], axis=0)
        corners, valid, dirty = mp.tile_corners(i0, BLOCK, GRID, order=2)
        rng = np.random.default_rng(0)
        grids = jnp.asarray(rng.normal(size=(3, GRID**3)).astype(np.float32))
        acc = mp.gather_tiles(grids, i0, f, corners, GRID, BLOCK, order=2,
                              interpret=True)
        acc = mp.repair_gather(acc, grids, i0, w2, valid, dirty, 16, GRID,
                               BLOCK, order=2)
        acc_o = pm_mod.cic_gather(grids, i0, f, GRID)
        scale = float(jnp.max(jnp.abs(acc_o)))
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(acc_o), atol=2e-6 * scale
        )

    def test_accel_pm_mesh_backends_agree(self):
        """Full PM solver equality: accel_pm with the tile mesh equals
        the XLA mesh, including padding rows at the tail."""
        rng = np.random.default_rng(5)
        n, n_real = 2048, 2000
        pm = np.zeros((n, 4), np.float32)
        pm[:n_real, :3] = rng.normal(size=(n_real, 3)).astype(np.float32)
        pm[:32, :3] *= 30.0
        pm[:n_real, 3] = rng.uniform(0.5, 1.5, size=(n_real,))
        pmj = jnp.asarray(pm)
        a_j = pm_mod.accel_pm(pmj, 2.0, grid=GRID, eps2=EPS2, n_real=n_real,
                              mesh_backend="jnp")
        a_p = pm_mod.accel_pm(pmj, 2.0, grid=GRID, eps2=EPS2, n_real=n_real,
                              mesh_backend="pallas_interpret")
        scale = float(jnp.max(jnp.abs(a_j[:n_real])))
        np.testing.assert_allclose(
            np.asarray(a_p[:n_real]), np.asarray(a_j[:n_real]),
            atol=5e-6 * scale,
        )

    def test_pm_grad_pallas_matches_jnp(self):
        """jax.grad through the PM tile path equals the XLA-mesh grad."""
        rng = np.random.default_rng(7)
        n = 512
        pm = np.concatenate(
            [rng.normal(size=(n, 3)), rng.uniform(0.5, 1.5, size=(n, 1))],
            axis=1,
        ).astype(np.float32)
        pmj = jnp.asarray(pm)

        def loss(be):
            def fn(x):
                a = pm_mod.accel_pm(x, 1.0, grid=32, eps2=EPS2,
                                    mesh_backend=be)
                return jnp.sum(a * a)
            return fn

        g_j = np.asarray(jax.grad(loss("jnp"))(pmj))
        g_p = np.asarray(jax.grad(loss("pallas_interpret"))(pmj))
        scale = np.abs(g_j).max()
        np.testing.assert_allclose(g_p, g_j, rtol=1e-4, atol=1e-5 * scale)

    def test_accel_p3m_mesh_backends_agree(self):
        """Full solver equality: accel_p3m with the Pallas mesh equals the
        jnp mesh (both with the jnp short-range, CPU)."""
        rng = np.random.default_rng(3)
        n = 2048
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        pos[:32] *= 30.0
        m = rng.uniform(0.5, 1.5, size=(n, 1)).astype(np.float32)
        pmj = jnp.asarray(np.concatenate([pos, m], axis=1))
        a_j = accel_p3m(pmj, 1.0, grid=GRID, short_backend="jnp",
                        mesh_backend="jnp")
        a_p = accel_p3m(pmj, 1.0, grid=GRID, short_backend="jnp",
                        mesh_backend="pallas_interpret")
        scale = float(jnp.max(jnp.abs(a_j)))
        np.testing.assert_allclose(
            np.asarray(a_p), np.asarray(a_j), atol=1e-5 * scale
        )


class TestSplitGather:
    @pytest.mark.slow  # interpret-mode 160^3 FFT dominates (~1 min)
    def test_mesh_accel_matches_jnp_at_split_grid(self):
        """grid > 128 takes the component-split gather (one G^3 grid per
        VMEM block instead of all three): oracle equality end to end —
        the split must change nothing but the blocking."""
        grid = 160
        assert 3 * grid**3 * 4 > mp._GATHER_SPLIT_BYTES
        rng = np.random.default_rng(7)
        n = 2048
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        pos[:32] *= 40.0
        m = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
        pmj = jnp.asarray(np.concatenate([pos, m[:, None]], axis=1))
        ps = pmj[jnp.argsort(morton_keys(pmj, n), stable=True)]
        lo, h = _box(ps[:, :3], grid)
        sigma = 1.5 * h
        a_p = mp.mesh_accel_pallas(ps, lo, h, sigma, grid=grid, eps2=EPS2,
                                   block=128, interpret=True)
        a_j = mp.mesh_accel_jnp(ps, lo, h, sigma, grid=grid, eps2=EPS2)
        scale = float(jnp.max(jnp.abs(a_j)))
        np.testing.assert_allclose(
            np.asarray(a_p), np.asarray(a_j), atol=5e-6 * scale
        )

    def test_gather_split_equals_unsplit(self):
        """The split path must be bit-comparable to the single-call form
        on the same inputs (same kernel math, different blocking)."""
        ps, lo, h = _sorted_cloud()
        c, w, f = _tsc_cells(ps[:, :3], lo, h, GRID)
        corners, valid, dirty = mp.tile_corners(c, BLOCK, GRID)
        rho = tsc_deposit(ps[:, :3], ps[:, 3], lo, h, GRID)
        grids = solve_accel_long(rho, h, EPS2, 1.5 * h, order=3)
        one = mp.gather_tiles(grids, c, f, corners, GRID, BLOCK,
                              interpret=True)
        old = mp._GATHER_SPLIT_BYTES
        try:
            mp._GATHER_SPLIT_BYTES = 0  # force the split at GRID=64
            split = mp.gather_tiles(grids, c, f, corners, GRID, BLOCK,
                                    interpret=True)
        finally:
            mp._GATHER_SPLIT_BYTES = old
        np.testing.assert_array_equal(np.asarray(one), np.asarray(split))


class TestPeriodicTileMesh:
    """Wrap-aware (torus) tile kernels vs the periodic XLA oracles.

    The periodic form routes the x/y TSC stencil spill through halo rows
    (deposit: fold_wrap_xy; gather: pad_wrap_xy) and wraps z inside the
    kernel via the one-hot shift matmul (zmod); the fixture pins
    particles onto faces, edges, and corners of the box so every wrap
    path (single-axis, two-axis, three-axis spill) is exercised, plus a
    seam-straddling Morton tile so the periodic repair pass runs.
    """

    L = 10.0

    def _periodic_cloud(self, n=4096, seed=11, grid=GRID, block=BLOCK):
        from nbody3d_tpu.ops.ewald import wrap_box

        rng = np.random.default_rng(seed)
        pos = rng.uniform(0.0, self.L, size=(n, 3)).astype(np.float32)
        # Face/edge/corner hugging particles: wrap spill in 1/2/3 axes,
        # including exactly-on-boundary coordinates (cell 0 with f<0).
        k = 256
        face = rng.uniform(0.0, self.L, size=(k, 3)).astype(np.float32)
        ax = rng.integers(0, 3, size=k)
        face[np.arange(k), ax] = rng.choice(
            [0.0, 1e-4, self.L - 1e-4], size=k
        ).astype(np.float32)
        pos[:k] = face
        pos[k] = [0.0, 0.0, 0.0]
        pos[k + 1] = [self.L - 1e-5, self.L - 1e-5, self.L - 1e-5]
        pos[k + 2] = [0.0, self.L - 1e-5, 0.0]
        m = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
        pmj = jnp.asarray(np.concatenate([pos, m[:, None]], axis=1))
        pmj = pmj.at[:, :3].set(wrap_box(pmj[:, :3], self.L))
        ps = pmj[jnp.argsort(morton_keys(pmj, n), stable=True)]
        h = jnp.float32(self.L / grid)
        lo = jnp.zeros((3,), jnp.float32)
        return ps, lo, h

    def test_periodic_deposit_matches_oracle(self):
        ps, lo, h = self._periodic_cloud()
        c, w, f = _tsc_cells(ps[:, :3], lo, h, GRID, periodic=True)
        corners, valid, dirty = mp.tile_corners(c, BLOCK, GRID,
                                                periodic=True)
        assert int(jnp.sum(dirty)) > 0, "fixture must exercise the repair path"
        rho = mp.fold_wrap_xy(
            mp.deposit_tiles(mp.pad_cells(c), f, ps[:, 3], corners, GRID,
                             BLOCK, interpret=True, zmod=GRID),
            GRID,
        )
        rho = mp.repair_deposit(rho, c, w, ps[:, 3], valid, dirty, 16,
                                GRID, BLOCK, periodic=True)
        rho_o = tsc_deposit(ps[:, :3], ps[:, 3], lo, h, GRID, periodic=True)
        scale = float(jnp.max(jnp.abs(rho_o)))
        np.testing.assert_allclose(
            np.asarray(rho), np.asarray(rho_o), atol=2e-6 * scale
        )
        # mass conservation across the folds (no halo row dropped)
        assert abs(float(jnp.sum(rho) - jnp.sum(rho_o))) < 1e-5 * float(
            jnp.sum(rho_o)
        )

    def test_periodic_gather_matches_oracle(self):
        from nbody3d_tpu.ops.p3m import tsc_gather

        ps, lo, h = self._periodic_cloud()
        c, w, f = _tsc_cells(ps[:, :3], lo, h, GRID, periodic=True)
        corners, valid, dirty = mp.tile_corners(c, BLOCK, GRID,
                                                periodic=True)
        rng = np.random.default_rng(0)
        grids = jnp.asarray(rng.normal(size=(3, GRID**3)).astype(np.float32))
        acc = mp.gather_tiles(
            mp.pad_wrap_xy(grids, GRID), mp.pad_cells(c), f, corners, GRID,
            BLOCK, interpret=True, zmod=GRID,
        )
        acc = mp.repair_gather(acc, grids, c, w, valid, dirty, 16, GRID,
                               BLOCK, periodic=True)
        acc_o = tsc_gather(grids, c, w, GRID)
        scale = float(jnp.max(jnp.abs(acc_o)))
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(acc_o), atol=2e-6 * scale
        )

    def test_mesh_accel_periodic_matches_jnp(self):
        ps, lo, h = self._periodic_cloud()
        L = jnp.float32(self.L)
        sigma = 1.5 * h
        a_p = mp.mesh_accel_periodic(ps, L, sigma, grid=GRID, block=BLOCK,
                                     backend="pallas_interpret")
        a_j = mp.mesh_accel_periodic_jnp(ps, L, sigma, grid=GRID)
        scale = float(jnp.max(jnp.abs(a_j)))
        np.testing.assert_allclose(
            np.asarray(a_p), np.asarray(a_j), atol=5e-6 * scale
        )

    def test_periodic_overflow_diagnostic(self):
        """mesh_overflow(periodic=True) counts the same dirty set the
        periodic hot path repairs; a truncated budget loses mass."""
        ps, lo, h = self._periodic_cloud()
        c, w, f = _tsc_cells(ps[:, :3], lo, h, GRID, periodic=True)
        nd, ninv = jax.jit(
            mp.mesh_overflow, static_argnums=(1, 2, 3, 4, 5)
        )(c, BLOCK, GRID, 1, 3, True)
        assert int(nd) >= 1 and int(ninv) >= int(nd)
        corners, valid, dirty = mp.tile_corners(c, BLOCK, GRID,
                                                periodic=True)
        assert int(jnp.sum(dirty)) == int(nd)

    def test_accel_p3m_periodic_mesh_backends_agree(self):
        """Full periodic solver: accel_p3m(boundary="periodic") with the
        wrap-aware tile mesh equals the XLA mesh, with and without
        interlacing (the shifted leg re-derives its own tile validity)."""
        ps, lo, h = self._periodic_cloud(n=2048)
        pmj = ps  # already wrapped + sorted; accel_p3m re-sorts anyway
        for interlace in (False, True):
            a_j = accel_p3m(pmj, 1.0, grid=32, boundary="periodic",
                            box_size=self.L, short_backend="jnp",
                            mesh_backend="jnp", interlace=interlace)
            a_p = accel_p3m(pmj, 1.0, grid=32, boundary="periodic",
                            box_size=self.L, short_backend="jnp",
                            mesh_backend="pallas_interpret",
                            interlace=interlace)
            scale = float(jnp.max(jnp.abs(a_j)))
            np.testing.assert_allclose(
                np.asarray(a_p), np.asarray(a_j), atol=1e-5 * scale,
                err_msg=f"interlace={interlace}",
            )

    def test_periodic_grad_pallas_matches_jnp(self):
        """Custom-VJP pairing for the periodic mesh leg (Pallas primal,
        jnp backward): grads agree between backends."""
        ps, lo, h = self._periodic_cloud(n=512, grid=32, block=256)
        L = jnp.float32(self.L)
        sigma = 1.5 * h

        def loss(be):
            def fn(x):
                a = mp.mesh_accel_periodic(x, L, sigma, grid=32, block=256,
                                           backend=be)
                return jnp.sum(a * a)
            return fn

        g_j = np.asarray(jax.grad(loss("jnp"))(ps))
        g_p = np.asarray(jax.grad(loss("pallas_interpret"))(ps))
        scale = np.abs(g_j).max()
        np.testing.assert_allclose(g_p, g_j, rtol=1e-4, atol=1e-5 * scale)
