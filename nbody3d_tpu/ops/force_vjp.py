"""Hand-written VJP of the all-pairs softened force — TPU-speed gradients.

``jax.grad`` through the Pallas forward kernels would require Pallas
autodiff (unsupported for these accumulation patterns), and falling back
to the jnp oracle caps differentiable simulation at CPU scale (round-2
gap, VERDICT r2 #2).  The cotangent contraction is itself an all-pairs
kernel with the same tiling as the forward, so we write it by hand and
register it via :func:`jax.custom_vjp`.

Math.  The forward (per unit G; reference pair function
``nbody3d.js:232-237``) is

    F_k = sum_j w_kj m_j d_kj,     d_kj = x_j - x_k,
    w_kj = (|d_kj|^2 + eps2)^{-3/2},   self-pair excluded by index,
    a = G * F.

With the per-pair symmetric 3x3 Jacobian ``S_kj = w_kj I - 3 w5_kj d_kj
d_kj^T`` (``w5 = (r^2+eps2)^{-5/2}``; ``S_kj == S_jk`` since d enters
quadratically), the cotangent ``abar`` pulls back as

    xbar_k = G * sum_{j != k} S_kj (m_k abar_j - m_j abar_k)
    mbar_k = -G * sum_{j != k} w_kj (abar_j . d_kj)
    Gbar   = sum_k abar_k . F_k

(derivation: ``da_i/dx_j = G m_j S_ij`` for j != i and ``da_i/dx_i =
-G sum_j m_j S_ij``; the symmetric combination makes the self term vanish
*algebraically*, but the kernel must still index-mask it — ``w_kk =
eps2^{-3/2}`` is the softening floor (1e6 at defaults), and the two f32
products ``m_k*(w*abar_k)`` and ``abar_k*(w*m_k)`` would cancel only to
f32 rounding, leaving O(ulp(1e13)) garbage for heavy bodies — the same
accumulator-corruption failure the forward fast path had in round 1,
docs/DESIGN.md.)

MXU decomposition (what the Pallas kernel computes per (BT, BS) block
pair, everything per unit G):

    per-pair scalars on the VPU:
      w, w5;  XA_kj  = x_k . abar_j;   XAk_kj = x_j . abar_k
      P = u_j - XA      (u_j = x_j . abar_j)    -> p_kj = d_kj . abar_j
      Q = XAk - v_k     (v_k = x_k . abar_k)    -> q_kj = d_kj . abar_k
      S = w5 * P;  T = w5 * m_j * Q
    three (BT,BS) @ (BS,8) MXU dots against source operands
      W @ [abar_j, m_j]      -> Wa (3), Wm
      S @ [x_j, 1]           -> Sx (3), sigma
      T @ [x_j, 1]           -> Tx (3), tau
    plus two VPU row-reductions
      mbar_part = -rowsum(W * P)
      phi_part  =  rowsum(W * m_j * XAk) - v_k * Wm   (= abar_k . F_k)
    epilogue (uses only the target block's own features):
      xbar_k = m_k Wa - abar_k Wm - 3 m_k (Sx - x_k sigma) + 3 (Tx - x_k tau)

The row-sum identities ``sum_j s d_kj = (S @ x_j) - x_k * (S @ 1)`` trade
the per-pair 3-vector for two matmul columns — the same
"fold the target term out of the contraction" trick as the forward's
``sum(w gm x) - x sum(w gm)`` epilogue.

On-hardware precision (measured round 4 vs a chunked f64 numpy oracle,
``benchmarks/grad_bench.py::accuracy_gate``; the round-3 "~5e-4" figure
was gauged against an f32 XLA oracle whose own MXU einsum rounds its
operands identically — a correlated-error underestimate): the v5e MXU
rounds BOTH sides of every dot to bf16.  The skinny source operands are
always pre-split into three bf16-exact limb planes
(:func:`_vjp_src_operand` — without it the epilogue's row-sum identity
folds subtract large bf16-rounded terms and xbar carried ~2e-2 median
error).  The (BT, BS) weight matrices are handled by the static
``precise`` flag: ``precise=True`` (default) 2-limb-splits them
in-kernel — xbar median ~4e-6 (f32-grade) at 86 G-pair/s sym;
``precise=False`` skips the split — ~2.1e-3 (the forward's bf16
weight-noise class) at 128 G-pair/s.  The interpret-mode tests (f32
semantics) verify the math to ~1e-6; grad_bench gates both modes on
hardware and exits nonzero on violation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody3d_tpu.ops.blocks import divisor_block
from nbody3d_tpu.ops.pallas_force import (
    DEFAULT_BLOCK_TARGET,
    _VMEM_LIMIT,
    _pair_diffs,
    _round_to_bf16_f32,
)


def _limb_planes(v: jax.Array) -> jax.Array:
    """(N, C) f32 -> (N, 3C) bf16-exact limb planes ``[h | m | l]`` with
    ``h + m + l == v`` to f32 exactness (same fold-proof rounding as the
    forward's :func:`~nbody3d_tpu.ops.pallas_force.src_limbs`).

    Pre-splitting the skinny MXU operands makes the implicit bf16 input
    rounding lossless for the *operand* side of every VJP dot; the dots
    are lane-padded to 128 anyway, so tripling 4 columns to 12 is free.
    Without this the epilogue's row-sum identity folds (``Sx - x_k
    sigma``) subtract large bf16-rounded terms and the on-chip xbar
    carried ~2e-2 median relative error (measured r4; the documented
    ~5e-4 had been gauged against an f32 XLA oracle whose own MXU einsum
    rounds identically — correlated-error underestimate)."""
    h = _round_to_bf16_f32(v)
    rem = v - h
    m = _round_to_bf16_f32(rem)
    return jnp.concatenate([h, m, rem - m], axis=1)


def _vjp_src_operand(A: jax.Array, m: jax.Array, x: jax.Array) -> jax.Array:
    """(N, 24) MXU operand: limb planes of ``[A, m]`` (cols 0:12, consumed
    by the W dot) and of ``[x, 1]`` (cols 12:24, consumed by the S/T
    dots).  The ones column is bf16-exact so its m/l limbs are zero."""
    n = x.shape[0]
    ones = jnp.ones((n, 1), jnp.float32)
    return jnp.concatenate(
        [_limb_planes(jnp.concatenate([A, m], axis=1)),
         _limb_planes(jnp.concatenate([x, ones], axis=1))],
        axis=1,
    )


def _fold_limbs_rows(d: jax.Array) -> jax.Array:
    """(BT, 12) limb-plane dot result -> (BT, 4)."""
    return d[:, 0:4] + d[:, 4:8] + d[:, 8:12]


def _fold_limbs_cols(d: jax.Array) -> jax.Array:
    """(12, B) limb-plane TN dot result -> (4, B)."""
    return d[0:4, :] + d[4:8, :] + d[8:12, :]


def _limb_dot_rows(mat: jax.Array, d12: jax.Array, precise: bool) -> jax.Array:
    """``fold_rows(mat @ d12)``; with ``precise`` the (BT, BS) weight
    matrix itself is split into two bf16 limbs in-kernel, so the MXU's
    implicit input rounding applies only to the ~2^-9-relative remainder
    (residual ~2^-17 per product — f32-grade).  The skinny-operand limb
    planes (``d12``, 12 cols) fix the operand side either way; the weight
    side is the residual ~2e-3 xbar error class (same as the forward's
    bf16 weight noise).  Measured on chip at N=256k (grad_bench r4):
    precise xbar median 4e-6 at 86 G-pair/s sym; fast 2.1e-3 at 128."""
    if not precise:
        return _fold_limbs_rows(
            jnp.dot(mat, d12, preferred_element_type=jnp.float32)
        )
    h = _round_to_bf16_f32(mat)
    d = jnp.dot(h, d12, preferred_element_type=jnp.float32) + jnp.dot(
        mat - h, d12, preferred_element_type=jnp.float32
    )
    return _fold_limbs_rows(d)


def _limb_dot_cols(d12: jax.Array, mat: jax.Array, precise: bool) -> jax.Array:
    """TN twin of :func:`_limb_dot_rows`: ``fold_cols(d12^T @ mat)`` with
    the (BT, B) weight matrix 2-limb split (reverse hops of the sym
    schedule)."""
    dn = (((0,), (0,)), ((), ()))
    if not precise:
        return _fold_limbs_cols(lax.dot_general(
            d12, mat, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ))
    h = _round_to_bf16_f32(mat)
    d = lax.dot_general(
        d12, h, dimension_numbers=dn, preferred_element_type=jnp.float32
    ) + lax.dot_general(
        d12, mat - h, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    return _fold_limbs_cols(d)


def force_vjp_reference(
    pos_mass: jax.Array, G, abar: jax.Array, *, eps2: float = 1e-4
) -> tuple[jax.Array, jax.Array]:
    """Dense jnp closed form of the VJP (O(N^2) memory — oracle for the
    kernel tests; see module docstring for the math).  Returns
    ``(pm_bar (N,4) = [xbar, mbar], G_bar ())``."""
    x = pos_mass[:, :3]
    m = pos_mass[:, 3]
    A = abar[:, :3]
    d = x[None, :, :] - x[:, None, :]  # d[k, j] = x_j - x_k
    r2 = jnp.sum(d * d, axis=-1) + jnp.float32(eps2)
    mask = 1.0 - jnp.eye(x.shape[0], dtype=x.dtype)
    w = mask * r2 ** -1.5
    w5 = mask * r2 ** -2.5
    # g[k, j] = m_k abar_j - m_j abar_k
    g = m[:, None, None] * A[None, :, :] - m[None, :, None] * A[:, None, :]
    dg = jnp.sum(d * g, axis=-1)
    xbar = jnp.sum(w[:, :, None] * g, axis=1) - 3.0 * jnp.sum(
        (w5 * dg)[:, :, None] * d, axis=1
    )
    mbar = -jnp.einsum("kj,kjc,jc->k", w, d, A)
    F = jnp.einsum("kj,j,kjc->kc", w, m, d)
    gbar = jnp.vdot(A, F)
    G = jnp.float32(G)
    pm_bar = jnp.concatenate([G * xbar, G * mbar[:, None]], axis=1)
    return pm_bar, gbar


# ------------------------------------------------------------ Pallas kernel


def _vjp_kernel(
    tgtF_ref, srcF_ref, srcD_ref, out_ref, acc_ref, *, eps2, bt, bs, precise
):
    """One (targets i, sources j) block pair of the VJP contraction.

    ``tgtF`` (BT, 8): [x, y, z, m, ax, ay, az, v = x.abar]
    ``srcF`` (8, BS): rows [x, y, z, m, ax, ay, az, u = x.abar] (transposed)
    ``srcD`` (BS, 24): MXU operand, limb planes of [A, m | x, 1]
             (:func:`_vjp_src_operand`)
    ``acc``  (BT, 16) scratch: [Wdot(4) | Sdot(4) | Tdot(4) | mbar, phi, 0, 0]
    ``out``  (BT, 8): [xbar(3), mbar, phi, 0(3)] written at the last j.

    Self-pairs masked by global index (targets == sources, offset 0); see
    module docstring for why the mask is mandatory here despite the
    algebraic cancellation.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    ns = pl.num_programs(1)

    tgt = tgtF_ref[...]
    dx, dy, dz, d2 = _pair_diffs(tgt, srcF_ref, eps2)
    del dx, dy, dz  # folded into the dot-column identities instead
    inv = 1.0 / d2
    w = lax.rsqrt(d2 * (d2 * d2))
    # self-pair mask: global row == global col (square single-set layout)
    trows = lax.broadcasted_iota(jnp.int32, (bt, bs), 0) + i * bt
    cols = lax.broadcasted_iota(jnp.int32, (bt, bs), 1) + j * bs
    w = jnp.where(trows == cols, 0.0, w)
    w5 = w * inv

    # per-pair dot products against the cotangent (VPU, 3 FMAs each)
    xa = (
        tgt[:, 0:1] * srcF_ref[4:5, :]
        + tgt[:, 1:2] * srcF_ref[5:6, :]
        + tgt[:, 2:3] * srcF_ref[6:7, :]
    )  # x_k . abar_j
    xak = (
        tgt[:, 4:5] * srcF_ref[0:1, :]
        + tgt[:, 5:6] * srcF_ref[1:2, :]
        + tgt[:, 6:7] * srcF_ref[2:3, :]
    )  # abar_k . x_j
    p = srcF_ref[7:8, :] - xa  # d_kj . abar_j
    q = xak - tgt[:, 7:8]  # d_kj . abar_k
    s_mat = w5 * p
    t_mat = w5 * srcF_ref[3:4, :] * q

    srcD = srcD_ref[...]
    wdot = _limb_dot_rows(w, srcD[:, 0:12], precise)
    sdot = _limb_dot_rows(s_mat, srcD[:, 12:24], precise)
    tdot = _limb_dot_rows(t_mat, srcD[:, 12:24], precise)
    wm_row = w * srcF_ref[3:4, :]
    mbar = -jnp.sum(w * p, axis=1, keepdims=True)
    # phi = abar_k . F_k folded PER PAIR via q = d . abar_k: accumulating
    # sum(w m xak) and subtracting v_k * Wm at the end cancels two large
    # f32 sums and measured ~0.8 relative gbar error on clustered states.
    phi = jnp.sum(wm_row * q, axis=1, keepdims=True)
    part = jnp.concatenate(
        [wdot, sdot, tdot, mbar, phi, jnp.zeros((bt, 2), jnp.float32)], axis=1
    )

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == ns - 1)
    def _():
        a = acc_ref[...]
        xt = tgt[:, 0:3]
        mt = tgt[:, 3:4]
        at = tgt[:, 4:7]
        wa, wm = a[:, 0:3], a[:, 3:4]
        sx, sig = a[:, 4:7], a[:, 7:8]
        tx, tau = a[:, 8:11], a[:, 11:12]
        xbar = mt * wa - at * wm - 3.0 * mt * (sx - xt * sig) + 3.0 * (
            tx - xt * tau
        )
        out_ref[...] = jnp.concatenate(
            [xbar, a[:, 12:13], a[:, 13:14], jnp.zeros((bt, 3), jnp.float32)],
            axis=1,
        )


@functools.partial(
    jax.jit, static_argnames=("eps2", "block", "precise", "interpret")
)
def force_vjp_pallas(
    pos_mass: jax.Array,
    G: jax.Array | float,
    abar: jax.Array,
    *,
    eps2: float = 1e-4,
    block: int = DEFAULT_BLOCK_TARGET,
    precise: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """All-pairs VJP on the TPU: ``(pm_bar (N,4), G_bar ())``.

    ``abar`` is the ``(N, 4)`` cotangent of the forward's output; its w
    lane is ignored (the forward's w lane is identically zero, so it
    carries no derivative).  Requires ``N % block == 0`` (the engine's
    padding granule guarantees it).  ``precise`` (default) 2-limb-splits
    the weight matrices in-kernel — f32-grade gradients (xbar median
    ~4e-6 vs the f64 oracle) at ~1.4x the fast mode's step cost; fast
    mode carries the forward's ~2e-3 bf16 weight-noise class.
    """
    if eps2 <= 0:
        raise ValueError("eps2 must be > 0")
    n = pos_mass.shape[0]
    b = divisor_block(n, block)
    nt = n // b

    x = pos_mass[:, :3]
    m = pos_mass[:, 3:4]
    A = abar[:, :3]
    v = jnp.sum(x * A, axis=1, keepdims=True)
    tgtF = jnp.concatenate([x, m, A, v], axis=1)  # (N, 8)
    srcF = tgtF.T  # (8, N) rows [x y z m ax ay az u]
    srcD = _vjp_src_operand(A, m, x)  # (N, 24) limb planes

    kernel = functools.partial(
        _vjp_kernel, eps2=float(eps2), bt=b, bs=b, precise=precise
    )
    out = pl.pallas_call(
        kernel,
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((b, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, b), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 24), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, 16), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * n * n,
            bytes_accessed=nt * n * 32 * 3 + n * 32,
            transcendentals=n * n,
        ),
        interpret=interpret,
    )(tgtF, srcF, srcD)

    G = jnp.float32(G)
    pm_bar = jnp.concatenate([G * out[:, 0:3], G * out[:, 3:4]], axis=1)
    gbar = jnp.sum(out[:, 4])
    return pm_bar, gbar


# ---------------------------------------------- Newton-3 (sym) VJP schedule
#
# The per-pair VPU chain (rsqrt chain + the four cotangent dot-product
# matrices) is the VJP's budget (~30 elementwise ops/pair vs 6 skinny MXU
# dots), and every per-pair quantity is shared between the (k, j) and
# (j, k) sides:
#
#   d_jk = -d_kj,  w/w5 symmetric,  g_jk = -g_kj,  (d.g) symmetric
#   =>  the pair's xbar contribution is exactly ANTISYMMETRIC,
#       mbar_j  = +colsum(w (.) q),   phi_j = -colsum(m_k (.) w (.) p)
#
# so one evaluation of the chain serves both directions — the same
# Newton-3 block schedule as the forward (pallas_force.py accel_sym_pallas:
# masked diagonal call + always-active middle hops + even-nt half hop; the
# 3-call condition-free form for the same Mosaic pipelining reason).  Per
# unordered block pair the hops kernel runs the chain once and contracts it
# six ways:
#
#   forward  (to targets k): w @ [A_j, m_j];  S @ [x_j, 1];  T @ [x_j, 1]
#   reverse  (to sources j): [A_k, m_k] x w;  [x_k, 1] x M       (TN dots,
#            contracting the TARGET dim — same orientation note as the
#            forward's reverse dot)             with  M = m_k S - T
#
# and two VPU column reductions (rmbar, rphi).  The reverse epilogue:
#
#   xbar_j += m_j rA - A_j rm + 3 (x_j rM - rMx)
#
# — the mirror of the forward's row-sum identity fold.


def _vjp_pair_terms(tgt, srcFT_ref, eps2):
    """Shared per-pair matrices for one (targets, sources) block pair.
    ``tgt`` (B, 8): [x, m, A, v=x.A]; ``srcFT`` (8, B): same, transposed
    (row 7 = u_j = x_j . A_j).  Returns ``(w, w5, p, q)`` — softened
    inverse-cube/quint weights and the two cotangent dot-product
    matrices ``p = d . A_j``, ``q = d . A_k``."""
    _, _, _, d2 = _pair_diffs(tgt, srcFT_ref, eps2)
    inv = 1.0 / d2
    w = lax.rsqrt(d2 * (d2 * d2))
    w5 = w * inv
    xa = (
        tgt[:, 0:1] * srcFT_ref[4:5, :]
        + tgt[:, 1:2] * srcFT_ref[5:6, :]
        + tgt[:, 2:3] * srcFT_ref[6:7, :]
    )  # x_k . abar_j
    xak = (
        tgt[:, 4:5] * srcFT_ref[0:1, :]
        + tgt[:, 5:6] * srcFT_ref[1:2, :]
        + tgt[:, 6:7] * srcFT_ref[2:3, :]
    )  # abar_k . x_j
    p = srcFT_ref[7:8, :] - xa  # d_kj . abar_j
    q = xak - tgt[:, 7:8]  # d_kj . abar_k
    return w, w5, p, q


def _vjp_forward_part(tgt, srcFT_ref, srcD, w, w5, p, q, bt, precise):
    """Forward-side partials of one block pair -> (BT, 16) in the layout
    [Wa(3), Wm | Sx(3), sigma | Tx(3), tau | mbar, phi | 0, 0].
    ``srcD`` is the (BS, 24) limb-plane operand (:func:`_vjp_src_operand`)."""
    s_mat = w5 * p
    t_mat = w5 * srcFT_ref[3:4, :] * q
    wdot = _limb_dot_rows(w, srcD[:, 0:12], precise)
    sdot = _limb_dot_rows(s_mat, srcD[:, 12:24], precise)
    tdot = _limb_dot_rows(t_mat, srcD[:, 12:24], precise)
    mbar = -jnp.sum(w * p, axis=1, keepdims=True)
    phi = jnp.sum(w * srcFT_ref[3:4, :] * q, axis=1, keepdims=True)
    return jnp.concatenate(
        [wdot, sdot, tdot, mbar, phi, jnp.zeros((bt, 2), jnp.float32)], axis=1
    )


def _vjp_sym_diag_kernel(
    mask_ref, srcFT_ref, tgtF_ref, srcD_ref, out_ref, *, eps2, b, precise
):
    """Diagonal blocks: the masked full (B, B) matrix covers every ordered
    in-block pair, so only the forward-side formulas are needed (same
    structure as pallas_force._sym_diag_kernel)."""
    tgt = tgtF_ref[...]
    w, w5, p, q = _vjp_pair_terms(tgt, srcFT_ref, eps2)
    m = mask_ref[...]
    w = w * m
    w5 = w5 * m
    out_ref[...] = _vjp_forward_part(
        tgt, srcFT_ref, srcD_ref[...], w, w5, p, q, b, precise
    )


def _vjp_sym_hops_kernel(
    srcFT_ref, tgtF_ref, srcD_ref, tgtD_ref, out_tgt_ref, out_src_ref,
    *, eps2, b, nt, k0, precise,
):
    """Off-diagonal hops: target block ``i`` x source block
    ``j = (i + k0 + k) mod nt`` — every step active, both sides served by
    one per-pair chain.  Reverse accumulator layout (nt, 16, B), rows
    [rA(3), rm | rMx(3), rM | rmbar, rphi | 0 x 6]."""
    i = pl.program_id(0)
    k = pl.program_id(1)
    j = lax.rem(i + k0 + k, nt)

    @pl.when(jnp.logical_and(i == 0, k == 0))
    def _():
        out_src_ref[...] = jnp.zeros(out_src_ref.shape, out_src_ref.dtype)

    @pl.when(k == 0)
    def _():
        out_tgt_ref[...] = jnp.zeros(out_tgt_ref.shape, out_tgt_ref.dtype)

    tgt = tgtF_ref[...]
    w, w5, p, q = _vjp_pair_terms(tgt, srcFT_ref, eps2)
    out_tgt_ref[...] += _vjp_forward_part(
        tgt, srcFT_ref, srcD_ref[...], w, w5, p, q, b, precise
    )

    # reverse side: contract the TARGET dim (TN orientation -> (c, B))
    tgtD = tgtD_ref[...]
    m_k = tgt[:, 3:4]
    m_mat = m_k * (w5 * p) - w5 * srcFT_ref[3:4, :] * q  # m_k S - T
    r1 = _limb_dot_cols(tgtD[:, 0:12], w, precise)  # rows [rA(3), rm]
    r2 = _limb_dot_cols(tgtD[:, 12:24], m_mat, precise)  # rows [rMx(3), rM]
    rmbar = jnp.sum(w * q, axis=0, keepdims=True)
    rphi = -jnp.sum(m_k * (w * p), axis=0, keepdims=True)
    part_r = jnp.concatenate(
        [r1, r2, rmbar, rphi, jnp.zeros((6, b), jnp.float32)], axis=0
    )
    out_src_ref[j] = out_src_ref[j] + part_r


def _vjp_combine_kernel(acct_ref, accs_ref, tgtF_ref, out_ref):
    """Elementwise epilogue (Pallas for the same column-slice-cliff reason
    as combine16_pallas): forward + reverse partials -> (B, 8)
    [xbar(3), mbar, phi, 0(3)]."""
    t = acct_ref[...]
    s = accs_ref[...]
    f = tgtF_ref[...]
    x = f[:, 0:3]
    m = f[:, 3:4]
    a = f[:, 4:7]
    xbar = (
        m * t[:, 0:3] - a * t[:, 3:4]
        - 3.0 * m * (t[:, 4:7] - x * t[:, 7:8])
        + 3.0 * (t[:, 8:11] - x * t[:, 11:12])
        + m * s[:, 0:3] - a * s[:, 3:4]
        + 3.0 * (x * s[:, 7:8] - s[:, 4:7])
    )
    mbar = t[:, 12:13] + s[:, 8:9]
    phi = t[:, 13:14] + s[:, 9:10]
    out_ref[...] = jnp.concatenate(
        [xbar, mbar, phi, jnp.zeros((t.shape[0], 3), jnp.float32)], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("eps2", "block", "precise", "interpret")
)
def force_vjp_sym_pallas(
    pos_mass: jax.Array,
    G: jax.Array | float,
    abar: jax.Array,
    *,
    eps2: float = 1e-4,
    block: int = 1024,
    precise: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """All-pairs VJP via the Newton-3 schedule: ``(pm_bar (N,4), G_bar)``.

    Semantically equal to :func:`force_vjp_pallas` (each pair's shared w /
    w5 / p / q feed both directions, so the pair algebra is identical);
    ~half the per-pair VPU chain at equal MXU work.  Default block 1024:
    the hops kernel materializes four (B, B) matrices for its dots — at
    B=2048 that is 64 MB of VMEM before the (nt, 16, B) accumulator.
    """
    if eps2 <= 0:
        raise ValueError("eps2 must be > 0")
    n = pos_mass.shape[0]
    b = divisor_block(n, block)
    nt = n // b
    half = nt // 2

    x = pos_mass[:, :3]
    m = pos_mass[:, 3:4]
    A = abar[:, :3]
    v = jnp.sum(x * A, axis=1, keepdims=True)
    tgtF = jnp.concatenate([x, m, A, v], axis=1)  # (N, 8)
    srcFT = tgtF.T  # (8, N)
    D = _vjp_src_operand(A, m, x)  # (N, 24) limbs: fwd src / rev tgt

    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=_VMEM_LIMIT,
    )
    mask = 1.0 - jnp.eye(b, dtype=jnp.float32)
    acc_t = pl.pallas_call(
        functools.partial(
            _vjp_sym_diag_kernel, eps2=float(eps2), b=b, precise=precise
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 24), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM_LIMIT
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * n * b, bytes_accessed=n * 64, transcendentals=n * b
        ),
        interpret=interpret,
    )(mask, srcFT, tgtF, D)
    acc_s = jnp.zeros((n, 16), jnp.float32)

    if nt > 1:
        ext = (half + 1) * b
        srcFT_e = jnp.concatenate([srcFT, srcFT[:, :ext]], axis=1)
        D_e = jnp.concatenate([D, D[:ext]], axis=0)

        def hops_call(k0, nk, grid_i):
            kernel = functools.partial(
                _vjp_sym_hops_kernel, eps2=float(eps2), b=b, nt=nt, k0=k0,
                precise=precise,
            )
            return pl.pallas_call(
                kernel,
                grid=(grid_i, nk),
                in_specs=[
                    pl.BlockSpec((8, b), lambda i, k: (0, i + k0 + k), memory_space=pltpu.VMEM),
                    pl.BlockSpec((b, 8), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((b, 24), lambda i, k: (i + k0 + k, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((b, 24), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((b, 16), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((nt, 16, b), lambda i, k: (0, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((grid_i * b, 16), jnp.float32),
                    jax.ShapeDtypeStruct((nt, 16, b), jnp.float32),
                ],
                compiler_params=cparams,
                cost_estimate=pl.CostEstimate(
                    flops=80 * grid_i * b * nk * b,
                    bytes_accessed=grid_i * nk * b * 64,
                    transcendentals=grid_i * b * nk * b,
                ),
                interpret=interpret,
            )(srcFT_e, tgtF, D_e, D)

        nk_b = half - 1 if nt % 2 == 0 else half
        if nk_b > 0:
            t_b, s_b = hops_call(1, nk_b, nt)
            acc_t = acc_t + t_b
            acc_s = acc_s + jnp.transpose(s_b, (0, 2, 1)).reshape(n, 16)
        if nt % 2 == 0:
            t_c, s_c = hops_call(half, 1, half)
            acc_t = acc_t.at[: half * b].add(t_c)
            acc_s = acc_s + jnp.transpose(s_c, (0, 2, 1)).reshape(n, 16)

    out = pl.pallas_call(
        _vjp_combine_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(acc_t, acc_s, tgtF)

    G = jnp.float32(G)
    pm_bar = jnp.concatenate([G * out[:, 0:3], G * out[:, 3:4]], axis=1)
    gbar = jnp.sum(out[:, 4])
    return pm_bar, gbar


def make_diff_accel(
    forward_fn,
    *,
    eps2: float = 1e-4,
    block: int = DEFAULT_BLOCK_TARGET,
    precise: bool = True,
    interpret: bool = False,
    sym: bool = True,
):
    """Wrap an ``accel(pos_mass, G) -> (N, 4)`` forward (any Pallas mode)
    with the hand-written VJP, so ``jax.grad`` flows through the TPU
    kernels at TPU speed.  ``sym=True`` (default) runs the backward
    through the Newton-3 schedule (:func:`force_vjp_sym_pallas` — ~1.8x
    the full-grid kernel); both backwards compute the same pair algebra.
    ``precise=True`` (default) 2-limb-splits the in-kernel weight
    matrices: f32-grade gradients (~4e-6 median vs the f64 oracle) at
    ~1.4x fast mode's cost; ``precise=False`` keeps the ~2e-3 bf16
    weight-noise class at full speed (grad_bench gates both).

    The backward is the VJP of the IDEAL pair math; the forward's bf16
    weight noise (~0.2%, fast/sym modes) makes this a slightly
    inexact-forward/exact-backward pairing — the standard trade for
    low-precision kernels (same contract as straight-through bf16
    matmul gradients), bounded by the forward's own accuracy contract.
    """

    @jax.custom_vjp
    def accel(pos_mass, G):
        return forward_fn(pos_mass, G)

    def fwd(pos_mass, G):
        out = forward_fn(pos_mass, G)
        return out, (pos_mass, G)

    def bwd(res, abar):
        pos_mass, G = res
        if sym:
            pm_bar, gbar = force_vjp_sym_pallas(
                pos_mass, G, abar, eps2=eps2,
                block=min(block, 1024), precise=precise, interpret=interpret,
            )
        else:
            pm_bar, gbar = force_vjp_pallas(
                pos_mass, G, abar, eps2=eps2, block=block, precise=precise,
                interpret=interpret,
            )
        return pm_bar, gbar

    accel.defvjp(fwd, bwd)
    return accel
