"""Kernel equivalence: Pallas (interpret mode) vs jnp oracle (SURVEY §4.2).

Near-bitwise comparison in the single-source-block regime (the analog of
the reference's deterministic N <= 256 single-workgroup case, SURVEY §2.3);
tolerance-based above, where summation order differs.  Fast mode (MXU bf16
weights) is validated against its documented ~0.4% per-pair noise bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody3d_tpu.ops.force_jnp import accel_direct
from nbody3d_tpu.ops.integrate import verlet_step
from nbody3d_tpu.ops.pallas_force import (
    accel_pallas,
    fused_step_pallas,
    src_limbs,
    src_transposed,
)
from nbody3d_tpu.state import init_state

EPS2 = 1e-4
G = 1e-4
DT = 1e-4


def random_state(rng, n, n_pad=None):
    pm = np.concatenate(
        [rng.normal(size=(n, 3)), rng.uniform(1, 50, size=(n, 1))], axis=1
    ).astype(np.float32)
    v = np.concatenate(
        [rng.normal(size=(n, 3)) * 0.1, np.zeros((n, 1))], axis=1
    ).astype(np.float32)
    return init_state(pm, v, n_pad=n_pad)


def test_force_only_matches_oracle(rng):
    s = random_state(rng, 512)
    oracle = accel_direct(s.pos_mass, G, eps2=EPS2)
    srcT = src_transposed(s.pos_mass, G)
    out = accel_pallas(
        s.pos_mass, srcT, eps2=EPS2,
        block_target=128, block_source=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=1e-5, atol=1e-7)


def test_fast_mode_within_noise_bound(rng):
    """MXU bf16-weight mode: relative error bounded by bf16 weight rounding
    (~0.4% per pair; much less after summation)."""
    s = random_state(rng, 512)
    oracle = np.asarray(accel_direct(s.pos_mass, G, eps2=EPS2))
    srcT = src_transposed(s.pos_mass, G)
    src10 = src_limbs(s.pos_mass, G)
    out = np.asarray(
        accel_pallas(
            s.pos_mass, srcT, src10, eps2=EPS2,
            block_target=128, block_source=256, mode="fast", interpret=True,
        )
    )
    scale = np.abs(oracle).max()
    assert np.abs(out - oracle).max() / scale < 5e-3
    # and it should be much better than plain-bf16 positions would be
    assert np.abs(out - oracle).max() / scale > 0  # sanity: not identical path


def test_src_limbs_reconstruct():
    """The three bf16 limbs reconstruct gm*x AND gm to f32 exactness."""
    rng = np.random.default_rng(0)
    pm = np.concatenate(
        [rng.normal(scale=5, size=(64, 3)), rng.uniform(1, 50, (64, 1))], axis=1
    ).astype(np.float32)
    s10 = np.asarray(src_limbs(jnp.asarray(pm), G))
    gm = (G * pm[:, 3:4]).astype(np.float32)
    for c in range(3):
        recon = s10[:, 3 * c] + s10[:, 3 * c + 1] + s10[:, 3 * c + 2]
        np.testing.assert_allclose(recon, (gm[:, 0] * pm[:, c]), rtol=1e-6, atol=1e-30)
    np.testing.assert_allclose(
        s10[:, 9] + s10[:, 10] + s10[:, 11], gm[:, 0], rtol=1e-7
    )
    np.testing.assert_array_equal(s10[:, 12:], 0.0)


def test_fast_mode_limbs_survive_mxu_bf16_rounding():
    """Regression for the gm-column rounding bug: simulate the MXU's bf16
    input rounding of EVERY src10 column in numpy and assert the
    self/near-pair cancellation still holds with a huge (softening-floor)
    weight.  Interpret mode cannot catch this — it runs dots in f32.
    """
    import ml_dtypes

    def mxu_round(x):
        return np.asarray(x, np.float32).astype(ml_dtypes.bfloat16).astype(np.float64)

    rng = np.random.default_rng(3)
    n = 64
    pm = np.concatenate(
        [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
    ).astype(np.float32)
    # plant a near-coincident pair (distance << softening length)
    pm[1, :3] = pm[0, :3] + 1e-4
    s10 = mxu_round(np.asarray(src_limbs(jnp.asarray(pm), G)))  # MXU input rounding
    pos = pm[:, :3].astype(np.float64)
    gm = (G * pm[:, 3]).astype(np.float64)
    diff = pos[None, :, :] - pos[:, None, :]
    d2 = (diff * diff).sum(-1) + EPS2
    w = mxu_round(d2**-1.5)  # bf16-rounded weights (the documented noise)
    # epilogue math on the rounded operands
    A = w @ s10
    s = A[:, 9] + A[:, 10] + A[:, 11]
    acc = np.stack(
        [
            A[:, 0] + A[:, 1] + A[:, 2] - pos[:, 0] * s,
            A[:, 3] + A[:, 4] + A[:, 5] - pos[:, 1] * s,
            A[:, 6] + A[:, 7] + A[:, 8] - pos[:, 2] * s,
        ],
        axis=1,
    )
    oracle = np.einsum("ts,tsc->tc", gm[None, :] * d2**-1.5, diff)
    scale = np.abs(oracle).max()
    assert np.abs(acc - oracle).max() / scale < 6e-3


def test_single_source_block_vs_same_order_oracle(rng):
    """One source block => identical lane-reduction order => agreement with a
    same-shaped jnp computation to within compiler fma-fusion rounding
    (a few ulps; the reference's own inverseSqrt is approximate)."""
    n = 256
    s = random_state(rng, n)
    srcT = src_transposed(s.pos_mass, G)
    out = accel_pallas(
        s.pos_mass, srcT, eps2=EPS2,
        block_target=n, block_source=n, interpret=True,
    )
    pos = s.pos_mass[:, :3]
    gm = jnp.float32(G) * s.pos_mass[:, 3]
    dx = pos[None, :, 0] - pos[:, None, 0]
    dy = pos[None, :, 1] - pos[:, None, 1]
    dz = pos[None, :, 2] - pos[:, None, 2]
    d2 = dx * dx + (dy * dy + (dz * dz + EPS2))
    w = gm[None, :] * jax.lax.rsqrt(d2 * (d2 * d2))
    ax = jnp.sum(w * dx, axis=1)
    ay = jnp.sum(w * dy, axis=1)
    az = jnp.sum(w * dz, axis=1)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ax), rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(ay), rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out[:, 2]), np.asarray(az), rtol=1e-4, atol=1e-8)


def test_self_pair_contributes_zero():
    """No index mask needed: the self separation is exactly 0, so the
    (finite, softened) self weight multiplies zero (module docstring)."""
    pm = np.array([[1.0, -2.0, 3.0, 1e7]], np.float32)
    s = init_state(pm, np.zeros((1, 4), np.float32), n_pad=8)
    srcT = src_transposed(s.pos_mass, G)
    out = accel_pallas(
        s.pos_mass, srcT, eps2=EPS2, block_target=8, block_source=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.zeros(4, np.float32))


def test_kernel_bitwise_deterministic(rng):
    """Same input => bit-identical output, run to run — the determinism the
    reference loses to its cross-workgroup race for N > 256 (SURVEY §2.3)."""
    s = random_state(rng, 512)
    srcT = src_transposed(s.pos_mass, G)
    kw = dict(eps2=EPS2, block_target=128, block_source=256, interpret=True)
    a1 = accel_pallas(s.pos_mass, srcT, **kw)
    a2 = accel_pallas(s.pos_mass, srcT, **kw)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_fused_step_matches_oracle_step(rng, mode):
    s = random_state(rng, 512)
    acc = accel_direct(s.pos_mass, G, eps2=EPS2)
    ref = verlet_step(s, acc, DT)
    p, v, a = fused_step_pallas(
        s.pos_mass, s.vel, s.accel, DT, G,
        eps2=EPS2, n_real=512, block_target=128, block_source=256,
        mode=mode, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref.pos_mass), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref.vel), rtol=1e-5, atol=1e-6)
    a_ref = np.asarray(ref.accel)
    if mode == "exact":
        np.testing.assert_allclose(np.asarray(a), a_ref, rtol=1e-5, atol=1e-7)
    else:
        # bf16 weight noise: bounded relative to the acceleration scale
        assert np.abs(np.asarray(a) - a_ref).max() / np.abs(a_ref).max() < 6e-3


def test_fused_step_padding(rng):
    """Padded rows stay frozen; real rows match the unpadded run."""
    n, n_pad = 200, 256
    s = random_state(rng, n, n_pad=n_pad)
    s_unpadded = init_state(
        np.asarray(s.pos_mass[:n]), np.asarray(s.vel[:n]), np.asarray(s.accel[:n])
    )
    p, v, a = fused_step_pallas(
        s.pos_mass, s.vel, s.accel, DT, G,
        eps2=EPS2, n_real=n, block_target=128, block_source=128, interpret=True,
    )
    acc = accel_direct(s_unpadded.pos_mass, G, eps2=EPS2)
    ref = verlet_step(s_unpadded, acc, DT)
    np.testing.assert_allclose(np.asarray(p[:n]), np.asarray(ref.pos_mass), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(p[n:]), np.zeros((n_pad - n, 4)))
    np.testing.assert_array_equal(np.asarray(v[n:]), np.zeros((n_pad - n, 4)))
    np.testing.assert_array_equal(np.asarray(a[n:]), np.zeros((n_pad - n, 4)))


def test_shard_decomposition_matches_monolithic(rng):
    """Accumulating per-source-shard partials == monolithic force (the ring
    schedule's correctness invariant)."""
    n = 256
    s = random_state(rng, n)
    oracle = accel_direct(s.pos_mass, G, eps2=EPS2)
    total = jnp.zeros((n, 4), jnp.float32)
    k = 4
    shard = n // k
    for i in range(k):
        part = accel_pallas(
            s.pos_mass,
            src_transposed(s.pos_mass[i * shard : (i + 1) * shard], G),
            eps2=EPS2, block_target=64, block_source=64, interpret=True,
        )
        total = total + part
    np.testing.assert_allclose(np.asarray(total), np.asarray(oracle), rtol=1e-5, atol=1e-7)


def test_dt_zero_is_identity_except_accel(rng):
    """dt=0 through the fused kernel: pos/vel unchanged (pause-adjacent
    semantics; the engine skips stepping entirely when paused)."""
    s = random_state(rng, 256)
    p, v, a = fused_step_pallas(
        s.pos_mass, s.vel, s.accel, 0.0, G,
        eps2=EPS2, n_real=256, block_target=128, block_source=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p), np.asarray(s.pos_mass))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(s.vel))


def test_eps2_must_be_positive(rng):
    s = random_state(rng, 256)
    srcT = src_transposed(s.pos_mass, G)
    with pytest.raises(ValueError, match="eps2"):
        accel_pallas(s.pos_mass, srcT, eps2=0.0, interpret=True)
