"""Differentiable simulation: ``jax.grad`` through the step loop.

A capability with no possible reference analog (the WebGPU app's state
lives in GPU buffers mutated by shaders, ``nbody3d.js:218-294``): here the
step is a pure function of a pytree, so the whole rollout is
end-to-end differentiable through ``lax.scan`` on the jnp backend — usable
for trajectory optimization / initial-condition fitting.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nbody3d_tpu.config import SimConfig
from nbody3d_tpu.ops.step import make_step_fn
from nbody3d_tpu.state import SimState

N = 8
DT = 1e-2
G = 1e-4


def _rollout_loss(step, pm0):
    target = jnp.asarray([1.0, 0.0, 0.0])

    def loss(v0):
        s = SimState(
            pm0, v0, jnp.zeros((N, 4), jnp.float32), jnp.asarray(0, jnp.int32)
        )

        def body(c, _):
            return step(c, jnp.float32(DT), jnp.float32(G)), None

        out, _ = jax.lax.scan(body, s, None, length=20)
        return jnp.sum((out.pos_mass[0, :3] - target) ** 2)

    return loss


def _setup(rng):
    pm = np.concatenate(
        [rng.standard_normal((N, 3)), rng.uniform(10, 50, (N, 1))], axis=1
    ).astype(np.float32)
    step = make_step_fn(SimConfig(backend="jnp"), N, N, platform="cpu")
    return jnp.asarray(pm), step


def test_grad_matches_finite_difference(rng):
    pm0, step = _setup(rng)
    loss = _rollout_loss(step, pm0)
    v0 = jnp.zeros((N, 4), jnp.float32)
    g = jax.grad(loss)(v0)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0
    # w lane must carry no gradient (it is identically zero in the state)
    eps = 1e-3
    for idx in [(0, 0), (0, 1), (3, 2)]:
        e = jnp.zeros_like(v0).at[idx].set(1.0)
        fd = (loss(v0 + eps * e) - loss(v0 - eps * e)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=2e-2, atol=1e-5)


def test_gradient_descent_reaches_target(rng):
    """Optimize body 0's initial velocity so its 20-step rollout ends at a
    target point — the canonical differentiable-simulation demo."""
    pm0, step = _setup(rng)
    loss = _rollout_loss(step, pm0)
    vg = jax.jit(jax.value_and_grad(loss))
    v = jnp.zeros((N, 4), jnp.float32)
    l0, _ = vg(v)
    for _ in range(40):
        l, g = vg(v)
        v = v - 2.0 * g
    l_final, _ = vg(v)
    assert float(l_final) < 1e-3 * float(l0)
    # only the w lanes were constrained to stay zero by the physics
    assert bool(jnp.isfinite(v).all())


def test_grad_through_grid_solvers(rng):
    """The PM and P3M steps are end-to-end differentiable too: sorts and
    top_k contribute constant (almost-everywhere) index maps, everything
    else (segmented scans, FFT convolution, CIC/TSC weights, erfc pair
    kernel) is smooth in positions/velocities."""
    from nbody3d_tpu.ops.step import make_step_fn as mk

    pm = np.concatenate(
        [rng.standard_normal((32, 3)), rng.uniform(10, 50, (32, 1))], axis=1
    ).astype(np.float32)
    pm0 = jnp.asarray(pm)
    for method in ("pm", "p3m"):
        cfg = SimConfig(method=method, pm_grid=16, backend="jnp")
        step = mk(cfg, 32, 32, platform="cpu")

        def loss(v0):
            s = SimState(
                pm0, v0, jnp.zeros((32, 4), jnp.float32),
                jnp.asarray(0, jnp.int32),
            )

            def body(c, _):
                return step(c, jnp.float32(DT), jnp.float32(G)), None

            out, _ = jax.lax.scan(body, s, None, length=5)
            return jnp.sum(out.pos_mass[0, :3] ** 2)

        v0 = jnp.zeros((32, 4), jnp.float32)
        g = jax.grad(loss)(v0)
        assert bool(jnp.isfinite(g).all()), method
        assert float(jnp.abs(g).max()) > 0, method
        eps = 1e-3
        e = jnp.zeros_like(v0).at[(0, 0)].set(1.0)
        fd = (loss(v0 + eps * e) - loss(v0 - eps * e)) / (2 * eps)
        np.testing.assert_allclose(
            float(g[0, 0]), float(fd), rtol=5e-2, atol=1e-5, err_msg=method
        )
