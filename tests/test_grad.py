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
import pytest

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


def _random_pm_abar(rng, n):
    pm = np.concatenate(
        [rng.standard_normal((n, 3)), rng.uniform(10, 50, (n, 1))], axis=1
    ).astype(np.float32)
    abar = rng.standard_normal((n, 4)).astype(np.float32)
    abar[:, 3] = 0.0
    return jnp.asarray(pm), jnp.asarray(abar)


def test_vjp_reference_matches_autodiff(rng):
    """The closed-form VJP (ops/force_vjp.py docstring math) equals
    jax.vjp through the jnp oracle."""
    from nbody3d_tpu.ops.force_jnp import accel_direct
    from nbody3d_tpu.ops.force_vjp import force_vjp_reference

    pm, abar = _random_pm_abar(rng, 96)
    eps2, gval = 1e-4, jnp.float32(1e-4)
    _, vjp = jax.vjp(lambda p, g: accel_direct(p, g, eps2=eps2), pm, gval)
    pm_ad, g_ad = vjp(abar)
    pm_ref, g_ref = force_vjp_reference(pm, gval, abar, eps2=eps2)
    np.testing.assert_allclose(
        np.asarray(pm_ref), np.asarray(pm_ad), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(float(g_ref), float(g_ad), rtol=1e-5)


def test_vjp_kernel_matches_autodiff_small(rng):
    from nbody3d_tpu.ops.force_jnp import accel_direct
    from nbody3d_tpu.ops.force_vjp import force_vjp_pallas

    pm, abar = _random_pm_abar(rng, 128)
    eps2, gval = 1e-4, jnp.float32(1e-4)
    _, vjp = jax.vjp(lambda p, g: accel_direct(p, g, eps2=eps2), pm, gval)
    pm_ad, g_ad = vjp(abar)
    pm_k, g_k = force_vjp_pallas(
        pm, gval, abar, eps2=eps2, block=32, interpret=True
    )
    scale = float(jnp.max(jnp.abs(pm_ad)))
    np.testing.assert_allclose(
        np.asarray(pm_k), np.asarray(pm_ad), rtol=1e-4, atol=1e-5 * scale
    )
    np.testing.assert_allclose(float(g_k), float(g_ad), rtol=1e-5)


@pytest.mark.parametrize("n,block", [(96, 96), (96, 32), (128, 32)])
def test_vjp_sym_matches_full_grid(rng, n, block):
    """The Newton-3 VJP schedule equals the full-grid VJP kernel across
    all three schedule shapes: nt=1 (diag only), odd nt (middle hops
    only), even nt (middle hops + shared half-hop)."""
    from nbody3d_tpu.ops.force_vjp import force_vjp_pallas, force_vjp_sym_pallas

    pm, abar = _random_pm_abar(rng, n)
    pm = pm.at[0, 3].set(1e5)  # heavy body stresses the self-mask
    eps2, gval = 1e-4, jnp.float32(1e-4)
    pm_f, g_f = force_vjp_pallas(
        pm, gval, abar, eps2=eps2, block=block, interpret=True
    )
    pm_s, g_s = force_vjp_sym_pallas(
        pm, gval, abar, eps2=eps2, block=block, interpret=True
    )
    scale = float(jnp.max(jnp.abs(pm_f)))
    np.testing.assert_allclose(
        np.asarray(pm_s), np.asarray(pm_f), rtol=1e-5, atol=1e-6 * scale
    )
    np.testing.assert_allclose(float(g_s), float(g_f), rtol=1e-5)


@pytest.mark.parametrize("sym", [False, True])
def test_vjp_fast_mode_matches_oracle(rng, sym):
    """precise=False (plain bf16 weights on hardware; identical f32 math
    in interpret mode) computes the same pair algebra as the closed
    form."""
    from nbody3d_tpu.ops.force_vjp import (
        force_vjp_pallas,
        force_vjp_reference,
        force_vjp_sym_pallas,
    )

    pm, abar = _random_pm_abar(rng, 96)
    eps2, gval = 1e-4, jnp.float32(1e-4)
    fn = force_vjp_sym_pallas if sym else force_vjp_pallas
    pm_k, g_k = fn(
        pm, gval, abar, eps2=eps2, block=32, precise=False, interpret=True
    )
    pm_ref, g_ref = force_vjp_reference(pm, gval, abar, eps2=eps2)
    scale = float(jnp.max(jnp.abs(pm_ref)))
    np.testing.assert_allclose(
        np.asarray(pm_k), np.asarray(pm_ref), rtol=1e-4, atol=1e-5 * scale
    )
    np.testing.assert_allclose(float(g_k), float(g_ref), rtol=1e-5)


def test_vjp_sym_matches_autodiff(rng):
    """...and the jnp-autodiff oracle (independent of the full-grid
    kernel's algebra)."""
    from nbody3d_tpu.ops.force_jnp import accel_direct
    from nbody3d_tpu.ops.force_vjp import force_vjp_sym_pallas

    pm, abar = _random_pm_abar(rng, 160)
    eps2, gval = 1e-4, jnp.float32(1e-4)
    _, vjp = jax.vjp(lambda p, g: accel_direct(p, g, eps2=eps2), pm, gval)
    pm_ad, g_ad = vjp(abar)
    pm_k, g_k = force_vjp_sym_pallas(
        pm, gval, abar, eps2=eps2, block=32, interpret=True
    )
    scale = float(jnp.max(jnp.abs(pm_ad)))
    np.testing.assert_allclose(
        np.asarray(pm_k), np.asarray(pm_ad), rtol=1e-4, atol=1e-5 * scale
    )
    np.testing.assert_allclose(float(g_k), float(g_ad), rtol=1e-5)


@pytest.mark.slow
def test_vjp_kernel_matches_autodiff_4k(rng):
    """VERDICT r2 #2 acceptance: the Pallas VJP vs the jnp-grad oracle at
    N >= 4k (interpret mode; heavy body included like the galaxy preset)."""
    from nbody3d_tpu.ops.force_jnp import accel_direct
    from nbody3d_tpu.ops.force_vjp import force_vjp_pallas

    n = 4096
    pm, abar = _random_pm_abar(rng, n)
    pm = pm.at[0, 3].set(1e7)  # heavy central body stresses the self-mask
    eps2, gval = 1e-4, jnp.float32(1e-4)
    _, vjp = jax.vjp(
        lambda p, g: accel_direct(p, g, eps2=eps2, chunk=256), pm, gval
    )
    pm_ad, g_ad = vjp(abar)
    pm_k, g_k = force_vjp_pallas(
        pm, gval, abar, eps2=eps2, block=512, interpret=True
    )
    scale = float(jnp.max(jnp.abs(pm_ad)))
    np.testing.assert_allclose(
        np.asarray(pm_k), np.asarray(pm_ad), rtol=1e-3, atol=1e-5 * scale
    )
    np.testing.assert_allclose(float(g_k), float(g_ad), rtol=1e-4)


def test_grad_through_pallas_step(rng):
    """jax.grad through the FULL pallas-backend step (custom VJP in the
    loop): matches the jnp-backend gradient of the same rollout."""
    pm, _ = _random_pm_abar(rng, 64)
    v0 = jnp.zeros((64, 4), jnp.float32)

    grads = {}
    for backend, mode in (("jnp", "exact"), ("pallas", "sym"), ("pallas", "exact")):
        cfg = SimConfig(
            backend=backend, force_mode=mode, block_target=32, block_source=32
        )
        step = make_step_fn(cfg, 64, 64, platform="cpu")

        def loss(v):
            s = SimState(
                pm, v, jnp.zeros((64, 4), jnp.float32), jnp.asarray(0, jnp.int32)
            )

            def body(c, _):
                return step(c, jnp.float32(DT), jnp.float32(G)), None

            out, _ = jax.lax.scan(body, s, None, length=10)
            return jnp.sum(out.pos_mass[0, :3] ** 2)

        grads[(backend, mode)] = jax.grad(loss)(v0)

    ref = np.asarray(grads[("jnp", "exact")])
    for key in (("pallas", "sym"), ("pallas", "exact")):
        got = np.asarray(grads[key])
        np.testing.assert_allclose(
            got, ref, rtol=2e-3, atol=1e-6 * np.abs(ref).max(), err_msg=str(key)
        )


@pytest.mark.slow
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
