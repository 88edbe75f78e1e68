"""Round-2 kernel additions: the symmetric (Newton-3) schedule, the fast-path
self-pair index mask, block-centered limb operands, and Morton ordering.

The headline regression here is the f32-accumulation test: the MXU
accumulates bf16 products in float32, so a softening-floor self-pair weight
(eps2**-1.5 = 1e6) times a heavy body's gm puts an O(1e9) term into the
accumulator and its ulp absorbs every real source contribution in that row
— 100% relative error on the galaxy preset's central body.  Interpret mode
runs dots in f32 end-to-end and float64 simulations hide the absorption,
so this is simulated in numpy with explicit f32 partial sums.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nbody3d_tpu.config import SimConfig
from nbody3d_tpu.ops.force_jnp import accel_direct
from nbody3d_tpu.ops.morton import morton_keys, morton_reorder
from nbody3d_tpu.ops.pallas_force import (
    NO_DIAG,
    accel_pallas,
    accel_sym_pallas,
    src_limbs,
    src_transposed,
    sym_operands,
)
from nbody3d_tpu.ops.step import fit_sym_block, make_step_fn
from nbody3d_tpu.state import init_state

G, EPS2 = 1e-4, 1e-4


def galaxy_like(rng, n, heavy=True):
    """Clustered positions + one reference-style 1e7 central mass."""
    pm = np.concatenate(
        [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(10, 50, (n, 1))], axis=1
    ).astype(np.float32)
    if heavy:
        pm[0, 3] = 1e7  # nbody3d.js:62 central body
    return pm


# ------------------------------------------------------------ sym schedule
@pytest.mark.parametrize("n,block", [(128, 128), (512, 128), (1024, 256), (768, 128)])
def test_sym_matches_oracle(rng, n, block):
    """Round-robin coverage: every unordered pair served exactly once, both
    directions — including the heavy central body."""
    pm = galaxy_like(rng, n)
    out = np.asarray(
        accel_sym_pallas(jnp.asarray(pm), G, eps2=EPS2, block=block, interpret=True)
    )
    oracle = np.asarray(accel_direct(jnp.asarray(pm), G, eps2=EPS2))
    rel = np.abs(out - oracle).max() / np.abs(oracle).max()
    assert rel < 2e-5


def test_sym_padding_sources_neutral(rng):
    """Mass-0 padding rows contribute nothing to real bodies."""
    n, n_pad = 200, 256
    pm = galaxy_like(rng, n, heavy=False)
    s = init_state(pm, np.zeros((n, 4), np.float32), n_pad=n_pad)
    out = np.asarray(
        accel_sym_pallas(s.pos_mass, G, eps2=EPS2, block=128, interpret=True)
    )
    oracle = np.asarray(accel_direct(jnp.asarray(pm), G, eps2=EPS2))
    rel = np.abs(out[:n] - oracle).max() / np.abs(oracle).max()
    assert rel < 2e-5


def test_sym_deterministic(rng):
    pm = galaxy_like(rng, 512)
    kw = dict(eps2=EPS2, block=128, interpret=True)
    a1 = np.asarray(accel_sym_pallas(jnp.asarray(pm), G, **kw))
    a2 = np.asarray(accel_sym_pallas(jnp.asarray(pm), G, **kw))
    np.testing.assert_array_equal(a1, a2)


def test_sym_odd_block_count(rng):
    """Odd block counts are fine since the 3-call form (no shared
    half-hop): hop distances 1..(nt-1)/2 cover every pair exactly once."""
    pm = galaxy_like(rng, 384)  # 3 blocks of 128
    out = np.asarray(
        accel_sym_pallas(jnp.asarray(pm), G, eps2=EPS2, block=128, interpret=True)
    )
    oracle = np.asarray(accel_direct(jnp.asarray(pm), G, eps2=EPS2))
    assert np.abs(out - oracle).max() / np.abs(oracle).max() < 2e-5


def test_fit_sym_block():
    assert fit_sym_block(2048, 2048) == 2048  # nt=1 ok
    assert fit_sym_block(4096, 2048) == 2048  # nt=2
    assert fit_sym_block(3 * 2048, 2048) == 2048  # odd nt fine (3-call form)
    assert fit_sym_block(262144, 2048) == 2048  # nt=128


def test_sym_step_fn_matches_jnp(rng):
    """make_step_fn wiring: force_mode='sym' through the interpret path
    agrees with the jnp backend step."""
    n = 512
    pm = galaxy_like(rng, n)
    vel = np.concatenate(
        [rng.normal(size=(n, 3)) * 0.1, np.zeros((n, 1))], axis=1
    ).astype(np.float32)
    s = init_state(pm, vel, n_pad=512)
    cfg_sym = SimConfig(backend="pallas", force_mode="sym", block_target=128)
    cfg_jnp = SimConfig(backend="jnp")
    out_sym = make_step_fn(cfg_sym, 512, n, platform="cpu")(s, 1e-4, G)
    out_jnp = make_step_fn(cfg_jnp, 512, n, platform="cpu")(s, 1e-4, G)
    np.testing.assert_allclose(
        np.asarray(out_sym.accel), np.asarray(out_jnp.accel), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sym.pos_mass), np.asarray(out_jnp.pos_mass), rtol=1e-5, atol=1e-7
    )


# ------------------------------------------- fast-path self-mask regression
def _bf16(x):
    import ml_dtypes

    return np.asarray(x, np.float32).astype(ml_dtypes.bfloat16).astype(np.float32)


def _mxu_f32_dot(wmat, smat):
    """MXU semantics: exact bf16*bf16 products, sequential f32 accumulation."""
    out = np.zeros((wmat.shape[0], smat.shape[1]), np.float32)
    for c in range(smat.shape[1]):
        acc = np.zeros(wmat.shape[0], np.float32)
        for s in range(wmat.shape[1]):
            acc = (acc + wmat[:, s] * smat[s, c]).astype(np.float32)
        out[:, c] = acc
    return out


def _fast_epilogue_np(A, pos):
    s = A[:, 9] + A[:, 10] + A[:, 11]
    return np.stack(
        [
            A[:, 0] + A[:, 1] + A[:, 2] - pos[:, 0] * s,
            A[:, 3] + A[:, 4] + A[:, 5] - pos[:, 1] * s,
            A[:, 6] + A[:, 7] + A[:, 8] - pos[:, 2] * s,
        ],
        axis=1,
    )


def test_fast_self_mask_required_under_f32_accumulation():
    """The reason fast paths index-mask the self-pair (nbody3d.js:265
    semantics): without the mask, f32 accumulation absorbs every real
    contribution to the heavy central body's row."""
    rng = np.random.default_rng(0)
    n = 256
    pm = galaxy_like(rng, n)
    pm[0, :3] = [0.5, -0.3, 0.2]
    s10 = _bf16(np.asarray(src_limbs(jnp.asarray(pm), G)))
    pos = pm[:, :3].astype(np.float32)
    diff = pos[None, :, :] - pos[:, None, :]
    d2 = (diff * diff).sum(-1).astype(np.float32) + np.float32(EPS2)
    w = _bf16(d2.astype(np.float64) ** -1.5)
    oracle = np.asarray(accel_direct(jnp.asarray(pm), G, eps2=EPS2))[:, :3]

    acc_unmasked = _fast_epilogue_np(_mxu_f32_dot(w, s10), pos)
    central_rel_unmasked = np.abs(acc_unmasked[0] - oracle[0]).max() / np.abs(oracle[0]).max()
    assert central_rel_unmasked > 0.5  # the bug: ~100% error

    w_masked = w.copy()
    np.fill_diagonal(w_masked, 0.0)
    acc_masked = _fast_epilogue_np(_mxu_f32_dot(w_masked, s10), pos)
    central_rel = np.abs(acc_masked[0] - oracle[0]).max() / np.abs(oracle[0]).max()
    assert central_rel < 6e-3  # bf16 weight-noise level


def test_fast_interpret_masks_self_pair(rng):
    """The kernel's masked diagonal dot (interpret mode): with the mask the
    self-pair weight never reaches the accumulator, so a heavy body's
    accel matches the oracle even in interpret arithmetic."""
    n = 256
    pm = galaxy_like(rng, n)
    srcT = src_transposed(jnp.asarray(pm), G)
    src10 = src_limbs(jnp.asarray(pm), G)
    out = np.asarray(
        accel_pallas(
            jnp.asarray(pm), srcT, src10,
            eps2=EPS2, block_target=128, block_source=128, mode="fast",
            interpret=True,  # default static_diag = single-chip (0, 0, NO_DIAG)
        )
    )
    oracle = np.asarray(accel_direct(jnp.asarray(pm), G, eps2=EPS2))
    rel = np.abs(out - oracle).max() / np.abs(oracle).max()
    assert rel < 1e-5  # interpret dots are f32: only mask semantics differ

    # NO_DIAG sentinel is for genuinely disjoint target/source sets (ring
    # hops k > 0): partial forces of the first half against the second.
    tgt, src = pm[:128], pm[128:]
    out2 = np.asarray(
        accel_pallas(
            jnp.asarray(tgt),
            src_transposed(jnp.asarray(src), G),
            src_limbs(jnp.asarray(src), G),
            eps2=EPS2, block_target=128, block_source=128, mode="fast",
            interpret=True, static_diag=(NO_DIAG, 0, NO_DIAG),
        )
    )
    from nbody3d_tpu.ops.force_jnp import accel_partial

    oracle2 = np.asarray(
        accel_partial(
            jnp.asarray(tgt), src_transposed(jnp.asarray(src), G), NO_DIAG,
            eps2=EPS2,
        )
    )
    rel2 = np.abs(out2 - oracle2).max() / np.abs(oracle2).max()
    assert rel2 < 1e-5


# ----------------------------------------------------- momentum (simulated)
def test_sym_momentum_under_mxu_rounding():
    """Momentum conservation of the sym schedule under simulated MXU
    arithmetic (bf16 operands, f32 accumulation, shared weights, centered
    limbs, Morton-ordered blocks): the per-step momentum error must sit
    near f32 reduction order, not the raw-coordinate 1e-3 of round 1."""
    rng = np.random.default_rng(1)
    n, block = 512, 128
    pm = galaxy_like(rng, n)
    # Morton-order the bodies (what the engine does every morton_every steps)
    order = np.argsort(np.asarray(morton_keys(jnp.asarray(pm))))
    pm = pm[order]

    s16, cent = sym_operands(jnp.asarray(pm), G, block)
    s16 = _bf16(np.asarray(s16))
    cent = np.asarray(cent)
    pos = pm[:, :3].astype(np.float32)
    nt = n // block

    # shared bf16 weights per unordered block pair; accumulate both sides
    acc16 = np.zeros((n, 16), np.float32)
    for bi in range(nt):
        for bj in range(bi, nt):
            ti = slice(bi * block, (bi + 1) * block)
            tj = slice(bj * block, (bj + 1) * block)
            diff = pos[None, tj, :] - pos[ti][:, None, :]
            d2 = (diff * diff).sum(-1).astype(np.float32) + np.float32(EPS2)
            w = _bf16(d2.astype(np.float64) ** -1.5)
            if bi == bj:
                np.fill_diagonal(w, 0.0)
            part = _mxu_f32_dot(w, s16[tj])
            wsum = part[:, 9] + part[:, 10] + part[:, 11]
            part[:, 12:15] += wsum[:, None] * cent[bj, :3]
            acc16[ti] += part
            if bi != bj:
                part_r = _mxu_f32_dot(w.T, s16[ti])
                wsum_r = part_r[:, 9] + part_r[:, 10] + part_r[:, 11]
                part_r[:, 12:15] += wsum_r[:, None] * cent[bi, :3]
                acc16[tj] += part_r

    s = acc16[:, 9] + acc16[:, 10] + acc16[:, 11]
    acc = np.stack(
        [
            acc16[:, 0] + acc16[:, 1] + acc16[:, 2] + acc16[:, 12] - pos[:, 0] * s,
            acc16[:, 3] + acc16[:, 4] + acc16[:, 5] + acc16[:, 13] - pos[:, 1] * s,
            acc16[:, 6] + acc16[:, 7] + acc16[:, 8] + acc16[:, 14] - pos[:, 2] * s,
        ],
        axis=1,
    )
    # momentum rate: sum_i m_i a_i should vanish; normalize by sum |m a|
    m = pm[:, 3:4].astype(np.float64)
    dp = (m * acc).sum(0)
    scale = np.abs(m * acc).sum(0).max()
    rel = np.abs(dp).max() / scale
    assert rel < 2e-6, rel


# ------------------------------------------------------------------- morton
def test_morton_reorder_preserves_multiset_and_padding(rng):
    n, n_pad = 200, 256
    pm = galaxy_like(rng, n, heavy=False)
    vel = rng.normal(size=(n, 4)).astype(np.float32)
    vel[:, 3] = 0
    s = init_state(pm, vel, n_pad=n_pad)
    orig_pm = np.asarray(s.pos_mass)  # snapshot: morton_reorder donates
    orig_v = np.asarray(s.vel)
    p, v, a = morton_reorder(s.pos_mass, s.vel, s.accel, n_real=n)
    p, v = np.asarray(p), np.asarray(v)
    # padding stays at the tail
    np.testing.assert_array_equal(p[n:], np.zeros((n_pad - n, 4)))
    # same multiset of bodies, velocities follow their bodies
    perm_rows = {tuple(r) for r in p[:n].tolist()}
    assert perm_rows == {tuple(r) for r in orig_pm[:n].tolist()}
    got = {tuple(r1) + tuple(r2) for r1, r2 in zip(p[:n].tolist(), v[:n].tolist())}
    want = {
        tuple(r1) + tuple(r2)
        for r1, r2 in zip(orig_pm[:n].tolist(), orig_v[:n].tolist())
    }
    assert got == want


def test_morton_orders_spatially():
    """Bodies in the same octant end up contiguous: block radius shrinks."""
    rng = np.random.default_rng(2)
    n = 1024
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [10, 10, 10]], np.float64)
    pm = np.concatenate(
        [
            (centers[rng.integers(0, 4, n)] + rng.normal(scale=0.3, size=(n, 3))),
            rng.uniform(1, 2, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    keys = np.asarray(morton_keys(jnp.asarray(pm)))
    order = np.argsort(keys)
    sorted_pos = pm[order, :3]
    block = 128
    radii = []
    for b in range(n // block):
        blk = sorted_pos[b * block : (b + 1) * block]
        radii.append(np.linalg.norm(blk - blk.mean(0), axis=1).max())
    unsorted_radius = np.linalg.norm(pm[:, :3] - pm[:, :3].mean(0), axis=1).max()
    assert np.median(radii) < unsorted_radius / 3


def test_engine_morton_hook(rng):
    """morton_every re-sorts at chunk boundaries without breaking physics."""
    from nbody3d_tpu.engine import Simulation

    cfg = SimConfig(backend="jnp", morton_every=4)
    sim = Simulation.from_preset("uniform-sphere", cfg, n=256)
    sim.run(8, chunk=4)
    d = sim.diagnostics()
    assert np.isfinite(d.total_energy)
    assert sim.step_count == 8


def test_sym_huge_n_macro_tiles(rng, monkeypatch):
    """Beyond SYM_MAX_N the sym accumulator would blow VMEM; make_step_fn
    switches to the macro-tiled sym schedule (diagonal chunks through the
    sym kernel, unordered chunk pairs through the Newton-3 pair kernel) —
    same physics, still half-compute."""
    import nbody3d_tpu.ops.step as step_mod

    cfg = SimConfig(backend="pallas", force_mode="sym", block_target=64)
    n = 512
    pm = galaxy_like(rng, n)
    vel = np.zeros((n, 4), np.float32)
    s = init_state(pm, vel, n_pad=n)
    # force the macro branch at test scale: cap at 128 -> 4 chunks
    monkeypatch.setattr(step_mod, "MACRO_MIN_N", 256)
    monkeypatch.setattr(step_mod, "SYM_MAX_N", 128)
    out = step_mod.make_step_fn(cfg, n, n, platform="cpu")(s, 1e-4, G)
    ref = step_mod.make_step_fn(SimConfig(backend="jnp"), n, n, platform="cpu")(
        s, 1e-4, G
    )
    a, r = np.asarray(out.accel), np.asarray(ref.accel)
    assert np.abs(a - r).max() / np.abs(r).max() < 2e-5  # interpret: f32 dots


def test_bitlevel_bf16_rounding_matches_rtne():
    """_round_to_bf16_f32 (the fold-proof limb primitive) must agree with
    dtype-cast round-to-nearest-even everywhere, including ties, tiny and
    huge magnitudes.  The bit-level form exists because XLA's
    excess-precision convert folding deletes cast-based residual limbs
    when they share a program with the consuming bf16 dot (docs/DESIGN.md
    landmine #4)."""
    from nbody3d_tpu.ops.pallas_force import _round_to_bf16_f32

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.normal(scale=10.0, size=4096).astype(np.float32),
        rng.normal(scale=1e30, size=64).astype(np.float32),
        rng.normal(scale=1e-30, size=64).astype(np.float32),
        np.float32([0.0, -0.0, 1.0, 1e3, 2.0 ** -126]),
        # exact ties around the bf16 rounding boundary
        np.float32([1.00390625, 1.01171875, -1.00390625]),
    ])
    import ml_dtypes

    want = vals.astype(ml_dtypes.bfloat16).astype(np.float32)
    got = np.asarray(_round_to_bf16_f32(jnp.asarray(vals)))
    np.testing.assert_array_equal(got, want)


def test_limbs_survive_jit_with_consuming_dot(rng):
    """Regression for the XLA convert-folding bug: building the limb
    operand IN THE SAME jit as a consuming dot must keep the residual
    (m/l) limb columns alive.  With the old cast-based limbs, XLA
    simplified m = bf16(v - bf16(v)) to zero on TPU; the bit-level
    construction is opaque to that rewrite.  (On CPU the folding does not
    fire, so this asserts the construction itself; the TPU behavior is
    covered by benchmarks/sym_validate.py's in-jit step checks.)"""
    import jax

    from nbody3d_tpu.ops.pallas_force import src_limbs

    pm = galaxy_like(rng, 256)

    @jax.jit
    def limb_mass(pm):
        s10 = src_limbs(pm, G)
        # consuming matmul, like the kernels do
        probe = jnp.ones((1, 256), jnp.float32)
        return jnp.dot(probe, s10), s10

    consumed, s10 = limb_mass(jnp.asarray(pm))
    s10 = np.asarray(s10)
    # residual limbs must carry mass: m-columns are ~2^-8 of h-columns
    for c in range(4):
        h = np.abs(s10[:, 3 * c]).max()
        m = np.abs(s10[:, 3 * c + 1]).max()
        assert m > 0 and m < h


# ------------------------------------------------- fused epilogue (round 5)
@pytest.mark.parametrize(
    "n,block,n_real",
    [(256, 128, 256), (384, 128, 384), (512, 128, 500), (256, 128, 200)],
)
def test_fused_step_matches_unfused(rng, n, block, n_real):
    """sym_verlet_step_pallas (the all-Pallas fused step: raw hop
    accumulators -> one epilogue pass doing combine + Verlet) reproduces
    the unfused accel+integrate composition — even/odd block counts,
    with and without padded tails."""
    from nbody3d_tpu.ops.integrate import apply_integrator
    from nbody3d_tpu.ops.pallas_force import sym_verlet_step_pallas

    pm = galaxy_like(rng, n, heavy=False)
    pm[n_real:, 3] = 0.0
    vel = np.concatenate(
        [rng.normal(size=(n, 3)).astype(np.float32) * 0.1, np.zeros((n, 1), np.float32)],
        axis=1,
    ).astype(np.float32)
    aold = np.concatenate(
        [rng.normal(size=(n, 3)).astype(np.float32), np.zeros((n, 1), np.float32)],
        axis=1,
    ).astype(np.float32)
    dt = jnp.float32(1e-3)
    acc = accel_sym_pallas(jnp.asarray(pm), G, eps2=EPS2, block=block, interpret=True)
    valid = (jnp.arange(n)[:, None] < n_real) if n_real < n else None
    p0, v0, a0 = apply_integrator(
        "verlet", jnp.asarray(pm), jnp.asarray(vel), jnp.asarray(aold), acc, dt, valid
    )
    p1, v1, a1 = sym_verlet_step_pallas(
        jnp.asarray(pm), jnp.asarray(vel), jnp.asarray(aold), dt, G,
        eps2=EPS2, block=block,
        n_real=(None if n_real >= n else n_real), interpret=True,
    )
    # The epilogue sums the row-layout and transposed-layout partials
    # each-reduced-first (the old path pre-adds all parts elementwise) —
    # identical algebra, different f32 order, so the centered-limb
    # cancellation noise differs at the same 1e-5 class as the kernel's
    # own oracle tolerance (test_sym_matches_oracle).  The hardware
    # conservation gate (bench.py: energy + momentum over 140 steps)
    # covers the physics.
    scale = float(jnp.max(jnp.abs(a0)))
    assert float(jnp.max(jnp.abs(a1 - a0))) / scale < 5e-5
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=0, atol=1e-6)
    if n_real < n:  # padded tails frozen, stored accel zeroed
        np.testing.assert_array_equal(np.asarray(p1[n_real:]), pm[n_real:])
        np.testing.assert_array_equal(np.asarray(v1[n_real:]), vel[n_real:])
        np.testing.assert_array_equal(np.asarray(a1[n_real:]), 0.0)


def test_fused_step_dispatch_and_equivalence(rng):
    """make_step_fn picks the fused branch (fuse_epilogue=True default)
    for sym/verlet and both branches advance the state identically."""
    n = 256
    pm = galaxy_like(rng, n)
    vel = np.concatenate(
        [rng.normal(size=(n, 3)).astype(np.float32) * 0.1, np.zeros((n, 1), np.float32)],
        axis=1,
    ).astype(np.float32)
    s = init_state(pm, vel, n_pad=n)
    cfg_f = SimConfig(backend="pallas", force_mode="sym", block_target=128)
    cfg_u = SimConfig(
        backend="pallas", force_mode="sym", block_target=128, fuse_epilogue=False
    )
    assert cfg_f.fuse_epilogue  # default on
    sf = make_step_fn(cfg_f, n, n, platform="cpu")(s, 1e-4, G)
    su = make_step_fn(cfg_u, n, n, platform="cpu")(s, 1e-4, G)
    np.testing.assert_allclose(
        np.asarray(sf.accel), np.asarray(su.accel), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sf.pos_mass), np.asarray(su.pos_mass), rtol=1e-6, atol=1e-7
    )
    assert int(sf.step) == 1


def test_fused_step_grad_matches_unfused(rng):
    """The fused step's custom_vjp (elementwise integrator AD + the
    hand-written Newton-3 force VJP) matches jax.grad through the unfused
    make_diff_accel + XLA-integrate path."""
    import jax

    from nbody3d_tpu.state import SimState

    n, n_real = 256, 250
    pm = galaxy_like(rng, n, heavy=False)
    pm[n_real:, 3] = 0.0
    vel = np.concatenate(
        [rng.normal(size=(n, 3)).astype(np.float32) * 0.1, np.zeros((n, 1), np.float32)],
        axis=1,
    ).astype(np.float32)
    aold = np.zeros((n, 4), np.float32)
    cfg_f = SimConfig(backend="pallas", force_mode="sym", block_target=128)
    cfg_u = SimConfig(
        backend="pallas", force_mode="sym", block_target=128, fuse_epilogue=False
    )
    step_f = make_step_fn(cfg_f, n, n_real, platform="cpu")
    step_u = make_step_fn(cfg_u, n, n_real, platform="cpu")

    def make_loss(step):
        def loss(pos_mass, vel_, dt, G_):
            st = SimState(pos_mass, vel_, jnp.asarray(aold), jnp.int32(0))
            st = step(st, dt, G_)
            st = step(st, dt, G_)
            return jnp.sum(st.pos_mass[:, :3] ** 2) + jnp.sum(st.vel[:, :3] ** 2)

        return loss

    args = (jnp.asarray(pm), jnp.asarray(vel), jnp.float32(1e-3), jnp.float32(G))
    gf = jax.grad(make_loss(step_f), argnums=(0, 1, 2, 3))(*args)
    gu = jax.grad(make_loss(step_u), argnums=(0, 1, 2, 3))(*args)
    for got, want in zip(gf, gu):
        scale = float(jnp.max(jnp.abs(want))) + 1e-30
        assert float(jnp.max(jnp.abs(got - want))) / scale < 1e-5
