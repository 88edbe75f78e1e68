"""Step dispatch: backend resolution, block fitting, engine+pallas e2e."""

import numpy as np
import pytest

from nbody3d_tpu.config import SimConfig
from nbody3d_tpu.engine import Simulation
from nbody3d_tpu.models.sphere import uniform_sphere
from nbody3d_tpu.ops.step import fit_block, resolve_backend


def test_fit_block():
    assert fit_block(2048, 1024) == 1024
    assert fit_block(256, 1024) == 256
    assert fit_block(768, 1024) == 768  # n itself when n <= want
    assert fit_block(768, 512) == 256  # 512 doesn't divide 768 -> halve
    assert fit_block(8, 1024) == 8
    with pytest.raises(ValueError):
        fit_block(0, 64)


def test_resolve_backend():
    assert resolve_backend(SimConfig(backend="auto"), "tpu") == ("pallas", False)
    assert resolve_backend(SimConfig(backend="auto"), "cpu") == ("jnp", False)
    assert resolve_backend(SimConfig(backend="pallas"), "cpu") == ("pallas", True)
    assert resolve_backend(SimConfig(backend="pallas"), "tpu") == ("pallas", False)
    assert resolve_backend(SimConfig(backend="jnp"), "tpu") == ("jnp", False)


@pytest.mark.parametrize("force_mode", ["exact", "fast"])
def test_engine_pallas_interpret_end_to_end(force_mode):
    """Engine -> pallas kernel (interpret) -> verlet, vs the jnp engine."""
    pm, vel, _ = uniform_sphere(200, rng=np.random.default_rng(0))
    kw = dict(block_target=64, block_source=64)
    sim_p = Simulation(
        SimConfig(backend="pallas", force_mode=force_mode, **kw), pm, vel, platform="cpu"
    )
    sim_j = Simulation(SimConfig(backend="jnp", **kw), pm, vel, platform="cpu")
    sim_p.step(3)
    sim_j.step(3)
    p_pallas = sim_p.arrays()[0]
    p_jnp = sim_j.arrays()[0]
    tol = 1e-6 if force_mode == "exact" else 1e-3
    np.testing.assert_allclose(p_pallas, p_jnp, rtol=tol, atol=tol)
    assert sim_p.step_count == 3


def test_fused_engine_matches_unfused():
    pm, vel, _ = uniform_sphere(128, rng=np.random.default_rng(1))
    kw = dict(block_target=64, block_source=64)
    sim_f = Simulation(
        SimConfig(backend="pallas", fuse_integrate=True, **kw), pm, vel, platform="cpu"
    )
    sim_u = Simulation(
        SimConfig(backend="pallas", fuse_integrate=False, **kw), pm, vel, platform="cpu"
    )
    sim_f.step(2)
    sim_u.step(2)
    np.testing.assert_allclose(
        sim_f.arrays()[0], sim_u.arrays()[0], rtol=1e-6, atol=1e-7
    )


def test_engine_yoshida4_pallas_matches_jnp():
    """yoshida4 through the sym Pallas path (interpret) vs the jnp engine:
    the composition calls the force kernel 3x per step."""
    pm, vel, _ = uniform_sphere(128, rng=np.random.default_rng(1))
    kw = dict(block_target=64, block_source=64, integrator="yoshida4")
    sim_p = Simulation(
        SimConfig(backend="pallas", force_mode="sym", **kw), pm, vel,
        platform="cpu",
    )
    sim_j = Simulation(SimConfig(backend="jnp", **kw), pm, vel, platform="cpu")
    sim_p.step(2)
    sim_j.step(2)
    np.testing.assert_allclose(
        sim_p.arrays()[0], sim_j.arrays()[0], rtol=2e-3, atol=2e-3
    )
    # the engine's work metric accounts 3 force evals per step
    assert sim_p.pair_interactions_per_step == 3 * (128 * 128 - 128)
