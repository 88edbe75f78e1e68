"""On-device depth resolve: the packed-key scatter-min as Pallas kernels.

The host resolve (``native/_raster.c``) min-reduces packed
``(depth_bits << 32) | rgb24`` uint64 keys per pixel — exactly the
reference's depth test (``nbody3d.js:401-405``) with color-deterministic
ties.  Fetching its per-body inputs costs ~20 B/body of device→host
traffic (334 MB at 16M — 75 s through a 1-8 MB/s relay).  XLA's
``.at[].min`` scatter was measured and rejected (~102-141 M stamps/s:
colliding-index scatters serialize; docs/DESIGN.md renderer section).

Round 5: EVERY splat rasterizes on the TPU (round 4 left the r >= 2 px
minority to a host composite, whose depth-plane + record fetch and host
stamping made the 16M close-up frame SLOWER than the default view —
VERDICT r4 weak #2).  Three tiers of the same dense one-hot kernel,
differing only in bin geometry (the halo must cover the tier's largest
stamp reach):

  tier 1:  r < 2         bins  8 x 256, 1-px halo  (the bulk)
  tier 2:  2 <= r < 16   bins  8 x 256, 16-px halo (compacted records)
  tier 3:  16 <= r <= 64 bins  8 x 256, 64-px halo (a handful)

- Each bin's local buffer carries the tier's halo so a body's full
  stamp stays tile-local regardless of which side of a bin boundary it
  sits on (the mesh kernels' halo trick, ``ops/mesh_pallas.py``); halos
  fold into the flat framebuffer by lex-min strip overlays after.
- Bodies are binned by center pixel, sorted by bin id, and packed into
  fixed-size chunks of C records (one grid step each, padded per bin so
  a chunk never spans bins).  The output BlockSpec revisits the bin's
  tile across its consecutive chunks (scalar-prefetched ``chunk_bin``
  index map — the block-sparse p3m short-range pattern, p3m.py:835).
  Dead chunks (bin-roundup / invisible-body padding) skip all work
  behind one scalar-prefetched flag and write only a trash tile.
- Per chunk the kernel runs ``rows`` passes; each evaluates the EXACT
  circle inclusion ``dx² + dy² <= r²`` as a (C, lanes) dense compare
  and min-reduces over bodies — dense VPU work, never a scatter.  The
  predicate matches the host's f64 ``d2 <= r*r`` BIT-EXACTLY: d2 is an
  exact-integer f32, and r² (exact in f64 for a 24-bit r) is carried as
  a Dekker two-product pair (hi, lo), so ``d2 <= r²`` lowers to
  ``d2 < hi or (d2 == hi and lo >= 0)`` in pure f32.
- Depth and color resolve lexicographically, bit-identically to the
  u64 min: an f32 depth min (IEEE non-negative floats order as their
  bit patterns and compare equal iff bit-equal), then an rgb24 min
  among depth winners, merged into the accumulator under the same tie
  rule.  rgb24 < 2^24 is exact in f32.

Only the 4 B/px rgb framebuffer crosses the wire afterwards (8 MB at
1080p); the f32 depth plane is fetched ONLY in the fallback composite
(tier overflow past the static capacities, or splats beyond
``max_radius_px`` > 64 — none in the default configuration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Bin geometry shared by all tiers: 8 x 256 pixel bins; lanes must be a
# multiple of 128 and cover BW + 2*halo for every tier's halo <= 64.
_BH = 8
_BW = 256
_LANES = 384  # BW + 2*64 exactly; tiers with smaller halos just pad

# (halo, chunk, static record capacity) per tier; tier 1's capacity is
# the input length itself.
_TIERS = (
    (1, 1024, None),      # r in [0.5, 2)
    (16, 256, 1 << 17),   # r in [2, 16)
    (64, 128, 1 << 15),   # r in [16, 64]
)
_RMAX_T1 = 2.0
_RMAX_T2 = 16.0
_RMAX_T3 = 64.0
#: Largest radius the on-device tiers cover; splats beyond it (only
#: possible when the caller raises ``max_radius_px`` past 64) fall back
#: to the host composite.
TIER_RMAX = _RMAX_T3

# f32 sentinels.  Depths are <= 1.0 and rgb24 < 2^24, so these are
# strictly larger than any real value and survive min untouched.
_RGB_MISS = float(1 << 25)

_VELTKAMP = np.float32(4097.0)  # 2^12 + 1: f32 Veltkamp split constant


def _dekker_sq(r):
    """Exact f32 two-product square: ``(hi, lo)`` with ``hi + lo == r²``
    exactly (classic Veltkamp split + Dekker product; every operation
    below is exact in f32 for r in [0.5, 64]).  This is how the kernel
    evaluates the host's f64 ``d2 <= r*r`` without f64: for a 24-bit
    float r, r² is exact in f64, and (hi, lo) carries the same value."""
    big = _VELTKAMP * r
    rh = big - (big - r)
    rl = r - rh
    hi = r * r
    lo = ((rh * rh - hi) + 2.0 * (rh * rl)) + rl * rl
    return hi, lo


def _resolve_kernel(chunk_bin_ref, chunk_first_ref, lo_ref, hi_ref, blk_ref,
                    rec_ref, dplane_ref, cplane_ref,
                    *, rows, lanes, c, nbx, bw, bh, halo):
    """One chunk-ALIGNED block of C sorted records against its bin's
    halo'd tile.

    ``rec`` (8, C) f32 rows of the BIN-SORTED field array: [cx, cy,
    depth, rgb24, rsq_hi, rsq_lo, valid, 0] in GLOBAL pixel coords —
    the block is fetched straight from the sorted array at prefetched
    block index ``blk[i]`` (round-5 rework: the old path materialized a
    per-chunk record tensor through order/slot gathers in XLA — ~0.85 s
    of the 0.96 s tier-1 at 16M; sorting the fields themselves with one
    variadic ``lax.sort`` and letting the pipeline fetch aligned blocks
    costs 0.17 s and removes every gather).  Records outside the bin's
    ``[lo, hi)`` range in the sorted order (alignment slack from
    rounding the bin's start down to a block boundary) are masked via
    their global slot index; tile-local coordinates are computed
    in-kernel from the prefetched bin id.  Fields ride the SUBLANE axis
    so the HBM array tiles exactly — a (total*C, 8) layout lane-pads
    8 -> 128 (16x, ~8.5 GB of temps at 16M); one in-kernel transpose
    restores the (C, 1) column vectors the row passes need.
    ``dplane``/``cplane`` (1, rows, lanes): the bin's depth / rgb
    planes, lex-min-accumulated across the bin's consecutive chunks.
    Dead chunks (``lo >= hi``) only init their (trash) tile."""
    i = pl.program_id(0)

    @pl.when(chunk_first_ref[i] != 0)
    def _init():
        dplane_ref[0] = jnp.full((rows, lanes), jnp.inf, jnp.float32)
        cplane_ref[0] = jnp.full((rows, lanes), _RGB_MISS, jnp.float32)

    @pl.when(lo_ref[i] < hi_ref[i])
    def _work():
        rec = rec_ref[...].T  # (C, 8)
        cb = chunk_bin_ref[i]
        by = cb // nbx
        bx = cb - by * nbx
        ox = (bx * bw - halo).astype(jnp.float32)
        oy = (by * bh - halo).astype(jnp.float32)
        gidx = blk_ref[i] * c + lax.broadcasted_iota(jnp.int32, (c, 1), 0)
        in_bin = (gidx >= lo_ref[i]) & (gidx < hi_ref[i])
        cx = rec[:, 0:1] - ox
        cy = rec[:, 1:2] - oy
        depth = rec[:, 2:3]
        rgb = rec[:, 3:4]
        rsq_hi = rec[:, 4:5]
        rsq_lo = rec[:, 5:6]
        valid = (rec[:, 6:7] > 0.0) & in_bin

        # Mosaic iota must be integer; f32 holds lane indices < 2^24
        # exactly, and dx/dy/d2 are exact integers in f32 throughout.
        iota = lax.broadcasted_iota(jnp.int32, (c, lanes), 1).astype(
            jnp.float32
        )
        dcol = iota - cx  # (C, lanes)
        dcol2 = dcol * dcol

        d_acc = dplane_ref[0]
        c_acc = cplane_ref[0]
        out_d = []
        out_c = []
        for rr in range(rows):
            dy = rr - cy  # (C, 1)
            d2 = dcol2 + dy * dy
            # exact circle inclusion d2 <= r² via the Dekker pair
            hit = valid & (
                (d2 < rsq_hi) | ((d2 == rsq_hi) & (rsq_lo >= 0.0))
            )
            dmat = jnp.where(hit, depth, jnp.inf)
            dmin = jnp.min(dmat, axis=0, keepdims=True)  # (1, lanes)
            cmat = jnp.where(hit & (dmat == dmin), rgb, _RGB_MISS)
            cmin = jnp.min(cmat, axis=0, keepdims=True)

            od = d_acc[rr : rr + 1, :]
            oc = c_acc[rr : rr + 1, :]
            better = dmin < od
            tie = dmin == od
            out_d.append(jnp.minimum(dmin, od))
            out_c.append(
                jnp.where(
                    better, cmin, jnp.where(tie, jnp.minimum(cmin, oc), oc)
                )
            )
        dplane_ref[0] = jnp.concatenate(out_d, axis=0)
        cplane_ref[0] = jnp.concatenate(out_c, axis=0)


#: Static capacity of :func:`compact_large`'s default buffer (tier 2).
LARGE_KMAX = 1 << 17


@functools.partial(jax.jit, static_argnames=("kmax", "rmin", "rmax"))
def compact_large(cx, cy, depth_bits, rgb24, r, visible, *,
                  kmax=LARGE_KMAX, rmin=2.0, rmax=float("inf")):
    """Pack the visible ``rmin <= r < rmax`` splats into a fixed
    ``(kmax + 1, 5)`` f32 buffer (order-preserving cumsum positions +
    one unique-index scatter — ~0.22 s at 16M vs ~0.9 s for the
    argsort + permutation gathers it replaces).  Rows: [cx, cy,
    bitcast(depth_bits), bitcast(rgb24), r]; row ``kmax`` is the
    overflow dump slot.  Returns ``(buf, n_sel)``; the first
    ``min(n_sel, kmax)`` rows are the splats in original order."""
    maskL = visible & (r >= rmin)
    if np.isfinite(rmax):
        maskL = maskL & (r < rmax)
    pos = jnp.cumsum(maskL.astype(jnp.int32)) - 1
    dest = jnp.where(maskL, jnp.minimum(pos, kmax), kmax)
    rec = jnp.stack(
        [
            cx.astype(jnp.float32),
            cy.astype(jnp.float32),
            lax.bitcast_convert_type(depth_bits, jnp.float32),
            lax.bitcast_convert_type(rgb24, jnp.float32),
            r,
        ],
        axis=1,
    )
    buf = jnp.zeros((kmax + 1, 5), jnp.float32).at[dest].set(rec)
    return buf, jnp.sum(maskL)


def _lex_min(d1, c1, d2, c2):
    """Lexicographic (depth, rgb) min of two plane pairs."""
    lt = d1 < d2
    tie = d1 == d2
    return (
        jnp.minimum(d1, d2),
        jnp.where(lt, c1, jnp.where(tie, jnp.minimum(c1, c2), c2)),
    )


def _fold_axis(plane_d, plane_c, bsz, halo):
    """Fold halo'd tiles along axis 1: (nb, bsz + 2*halo, *rest) ->
    lex-min overlay on (nb * bsz + 2*halo, *rest), tile b occupying
    rows [b * bsz, b * bsz + bsz + 2*halo).  The tile length splits
    into ceil((bsz + 2*halo) / bsz) bsz-aligned strips; each reshapes
    into a flat (nb * bsz) grid shifted by its offset, and the strips
    overlay lexicographically."""
    nb = plane_d.shape[0]
    rest = plane_d.shape[2:]
    tile_len = bsz + 2 * halo
    out_len = nb * bsz + 2 * halo
    out_d = jnp.full((out_len,) + rest, np.inf, jnp.float32)
    out_c = jnp.full((out_len,) + rest, _RGB_MISS, jnp.float32)
    for start in range(0, tile_len, bsz):
        seg_len = min(bsz, tile_len - start)
        seg_d = plane_d[:, start : start + seg_len]
        seg_c = plane_c[:, start : start + seg_len]
        if seg_len < bsz:  # pad the ragged tail strip to bsz
            pad = [(0, 0), (0, bsz - seg_len)] + [(0, 0)] * len(rest)
            seg_d = jnp.pad(seg_d, pad, constant_values=np.inf)
            seg_c = jnp.pad(seg_c, pad, constant_values=_RGB_MISS)
        strip_d = seg_d.reshape((nb * bsz,) + rest)
        strip_c = seg_c.reshape((nb * bsz,) + rest)
        # tile b local row (start + j) -> out row b*bsz + start + j
        lo = start
        hi = out_len - nb * bsz - start
        if hi < 0:  # strip overhangs the out buffer: crop
            strip_d = strip_d[: nb * bsz + hi]
            strip_c = strip_c[: nb * bsz + hi]
            hi = 0
        pad = [(lo, hi)] + [(0, 0)] * len(rest)
        sd = jnp.pad(strip_d, pad, constant_values=np.inf)
        sc = jnp.pad(strip_c, pad, constant_values=_RGB_MISS)
        out_d, out_c = _lex_min(out_d, out_c, sd, sc)
    return out_d, out_c


def _resolve_tier(cx, cy, depth_f, rgb24_f, rsq_hi, rsq_lo, valid, *,
                  width, height, halo, chunk, interpret):
    """Rasterize one tier's records into full-frame (depth, rgb) f32
    planes (miss = +inf / _RGB_MISS).  Inputs are per-record f32/i32
    arrays in ANY order (the resolve is a min — order-independent);
    ``valid`` masks live records.  See the module docstring for the
    bin/chunk machinery."""
    n = cx.shape[0]
    nbx = -(-width // _BW)
    nby = -(-height // _BH)
    nbins = nby * nbx

    # Center pixels sit within r of the screen (the prep's visibility
    # test and r <= halo), so clamping for BINNING only moves stamp
    # cells that were off-screen anyway; the stamp itself still uses
    # the unclamped center (local coords below) — and the tier halo
    # covers the clamp distance, preserving exact geometry.
    cxc = jnp.clip(cx, 0, width - 1)
    cyc = jnp.clip(cy, 0, height - 1)
    bin_id = jnp.where(valid, (cyc // _BH) * nbx + cxc // _BW, nbins)

    # ONE variadic sort carries every field into bin order (round-5
    # rework: 0.17 s vs ~0.85 s of argsort + order/slot gathers + record
    # relayout at 16M — see _resolve_kernel); the kernel then reads
    # chunk-ALIGNED blocks of the sorted array directly, masking the
    # alignment slack at bin boundaries by global slot index.
    (sbin, scx, scy, sdepth, srgb, shi, slo, svalid) = lax.sort(
        (
            bin_id.astype(jnp.int32),
            cx.astype(jnp.float32),
            cy.astype(jnp.float32),
            depth_f,
            rgb24_f,
            rsq_hi,
            rsq_lo,
            valid.astype(jnp.float32),
        ),
        dimension=0,
        num_keys=1,
    )
    sfields = jnp.stack(
        [scx, scy, sdepth, srgb, shi, slo, svalid, jnp.zeros_like(scx)],
        axis=0,
    )  # (8, n) — fields on sublanes: exact HBM tiling (see kernel note)
    pad = (-n) % chunk
    if pad:
        sfields = jnp.pad(sfields, ((0, 0), (0, pad)))

    edges = jnp.searchsorted(
        sbin, jnp.arange(nbins + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)  # (nbins + 1,): per-bin [start, end) in sorted order
    total_chunks = (n + pad) // chunk + 2 * nbins + 1  # static capacity
    return _rasterize_sorted(
        sfields, edges,
        width=width, height=height, halo=halo, chunk=chunk,
        total_chunks=total_chunks, interpret=interpret,
    )


def _rasterize_sorted(sfields, edges, *, width, height, halo, chunk,
                      total_chunks, interpret):
    """Rasterize a bin-sorted field array into folded full-frame
    (depth, rgb) planes.

    ``sfields`` (8, n_pad) with ``n_pad % chunk == 0``; ``edges``
    (nbins + 1,) — each bin's [start, end) range of GLOBAL positions in
    the sorted order (the array may contain other tiers' records
    outside ``[edges[0], edges[-1])``; they are never touched).
    ``total_chunks`` is the static chunk-table capacity: a table
    overflow (possible only when a caller caps it below worst case,
    the tier-capacity contract) drops a SUFFIX of chunks — fully
    dropped bins are masked as unvisited, and the caller accounts the
    uncovered records via its overflow count."""
    nbx = -(-width // _BW)
    nby = -(-height // _BH)
    nbins = nby * nbx

    counts = edges[1:] - edges[:-1]
    # Aligned chunk table: bin b's chunks start at block floor(start/C)
    # and cover through its end — at most ceil(count/C) + 1 blocks.
    base_blk = edges[:-1] // chunk  # (nbins,)
    chunks = jnp.where(
        counts > 0, -(-(edges[1:] - base_blk * chunk) // chunk), 0
    )
    cstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(chunks).astype(jnp.int32)]
    )  # (nbins + 1,)
    cap = jnp.int32(total_chunks)
    cap_eff = jnp.minimum(cstart[-1], cap)
    cid = jnp.arange(total_chunks, dtype=jnp.int32)
    live_chunk = cid < cap_eff
    # dead chunks park on a trash tile (bin index nbins) and skip work
    chunk_bin = jnp.where(
        live_chunk,
        jnp.clip(
            jnp.searchsorted(cstart, cid, side="right") - 1, 0, nbins - 1
        ).astype(jnp.int32),
        jnp.int32(nbins),
    )
    chunk_first = jnp.concatenate(
        [jnp.ones(1, jnp.int32),
         (chunk_bin[1:] != chunk_bin[:-1]).astype(jnp.int32)]
    )
    safe_bin = jnp.minimum(chunk_bin, nbins - 1)
    blk = jnp.where(
        live_chunk, base_blk[safe_bin] + (cid - cstart[safe_bin]), 0
    ).astype(jnp.int32)
    # per-chunk record-index bounds in the sorted order (lo >= hi = dead)
    lo_b = jnp.where(live_chunk, edges[safe_bin], 0).astype(jnp.int32)
    hi_b = jnp.where(live_chunk, edges[safe_bin + 1], 0).astype(jnp.int32)

    rows = _BH + 2 * halo
    kernel = functools.partial(
        _resolve_kernel, rows=rows, lanes=_LANES, c=chunk,
        nbx=nbx, bw=_BW, bh=_BH, halo=halo,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # chunk_bin, chunk_first, lo, hi, blk
        grid=(total_chunks,),
        in_specs=[
            pl.BlockSpec(
                (8, chunk), lambda i, cb, cf, lo, hi, blk: (0, blk[i]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, rows, _LANES), lambda i, cb, cf, lo, hi, blk: (cb[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, _LANES), lambda i, cb, cf, lo, hi, blk: (cb[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    dplane, cplane = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbins + 1, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((nbins + 1, rows, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * total_chunks * rows * chunk * _LANES,
            bytes_accessed=total_chunks * (8 * chunk + 2 * rows * _LANES) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_bin, chunk_first, lo_b, hi_b, blk, sfields)

    # Bins that received no chunk were never visited (garbage planes):
    # mask them to the sentinel, drop the trash tile.  Capacity
    # truncation drops a suffix of the chunk table — bins whose FIRST
    # chunk fell past the cap are unvisited too.
    visited = ((counts > 0) & (cstart[:-1] < cap_eff))[:, None, None]
    dplane = jnp.where(visited, dplane[:nbins], np.inf)
    cplane = jnp.where(visited, cplane[:nbins], _RGB_MISS)

    # Fold halos into the flat framebuffer: rows first, then columns,
    # each a lex-min strip overlay (see _fold_axis), then crop the
    # outer halo ring.
    dplane = dplane.reshape(nby, nbx, rows, _LANES)[:, :, :, : _BW + 2 * halo]
    cplane = cplane.reshape(nby, nbx, rows, _LANES)[:, :, :, : _BW + 2 * halo]
    # rows: (nby, rows, nbx, BW+2h) -> (nby*BH + 2h, nbx, BW+2h)
    d, c = _fold_axis(
        jnp.swapaxes(dplane, 1, 2), jnp.swapaxes(cplane, 1, 2), _BH, halo
    )
    # crop the vertical halo now: global pixel row = fold row - halo
    d = d[halo : height + halo]
    c = c[halo : height + halo]
    # columns: (nbx, BW+2h, H) -> (nbx*BW + 2h, H)
    d, c = _fold_axis(
        jnp.transpose(d, (1, 2, 0)), jnp.transpose(c, (1, 2, 0)), _BW, halo
    )
    d = jnp.swapaxes(d[halo : width + halo], 0, 1)  # (H, W)
    c = jnp.swapaxes(c[halo : width + halo], 0, 1)
    return d, c


@functools.partial(
    jax.jit, static_argnames=("width", "height", "interpret")
)
def resolve_all_pallas(cx, cy, depth_bits, rgb24, r, visible, *,
                       width, height, interpret=False):
    """Rasterize EVERY splat with r <= 64 px on the TPU (all three
    tiers), lex-min-merged into one frame.  Returns ``(rgb_u32 (H, W),
    depth_f32 (H, W), n_host)`` where a miss carries ``rgb ==
    0xFFFFFFFF`` / ``depth == +inf``, and ``n_host`` counts the splats
    the device could NOT cover (r > 64, or tier capacity overflow) —
    the caller stamps those host-side on top (zero in the default
    configuration, where r is clipped to 64).

    Inputs are the device prep's arrays in ANY order (the resolve is a
    min — order-independent): ``cx``/``cy`` i32 center pixels,
    ``depth_bits`` u32 (bit pattern of the clipped [0,1] f32 depth),
    ``rgb24`` u32, ``r`` f32 pixel radius, ``visible`` bool mask.
    Bit-identical to the host packed-u64 resolve on the same inputs
    (exact-d2 circle predicate; see module docstring)."""
    n = cx.shape[0]
    depth_f = lax.bitcast_convert_type(depth_bits, jnp.float32)
    rgb_f = rgb24.astype(jnp.float32)
    rsq_hi, rsq_lo = _dekker_sq(r)
    nbx = -(-width // _BW)
    nby = -(-height // _BH)
    nbins = nby * nbx

    # ONE sort serves all three tiers: key = tier * nbins + bin (tier 3
    # = invalid/too-large, sorted last).  The per-tier compaction
    # passes this replaces (compact_large x2: flag + cumsum + gather
    # over the full arrays) cost ~0.4 s at 16M; the combined sort costs
    # the same as tier 1's alone.
    tier = jnp.where(
        visible & (r <= _RMAX_T3),
        (r >= _RMAX_T1).astype(jnp.int32) + (r >= _RMAX_T2).astype(jnp.int32),
        jnp.int32(3),
    )
    cxc = jnp.clip(cx, 0, width - 1)
    cyc = jnp.clip(cy, 0, height - 1)
    bin_id = (cyc // _BH) * nbx + cxc // _BW
    key = jnp.where(tier < 3, tier * nbins + bin_id, 3 * nbins)

    validf = (tier < 3).astype(jnp.float32)
    (skey, scx, scy, sdepth, srgb, shi, slo, svalid) = lax.sort(
        (
            key.astype(jnp.int32),
            cx.astype(jnp.float32),
            cy.astype(jnp.float32),
            depth_f,
            rgb_f,
            rsq_hi,
            rsq_lo,
            validf,
        ),
        dimension=0,
        num_keys=1,
    )
    sfields = jnp.stack(
        [scx, scy, sdepth, srgb, shi, slo, svalid, jnp.zeros_like(scx)],
        axis=0,
    )
    chunk1 = _TIERS[0][1]
    pad = (-n) % chunk1  # chunk1 is a multiple of every tier's chunk
    if pad:
        sfields = jnp.pad(sfields, ((0, 0), (0, pad)))
    edges_all = jnp.searchsorted(
        skey, jnp.arange(3 * nbins + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    d = c = None
    n_host = jnp.int32(0)
    for t, (halo_t, chunk_t, kmax) in enumerate(_TIERS):
        edges_t = edges_all[t * nbins : (t + 1) * nbins + 1]
        if kmax is None:  # tier 1: worst case = everything
            cap_t = (n + pad) // chunk_t + 2 * nbins + 1
        else:
            # Tier-capacity contract: the chunk table is sized for kmax
            # records; overflow drops a suffix of chunks and the WHOLE
            # tier's records are routed to the host fallback (which
            # re-stamps idempotently under min).
            cap_t = kmax // chunk_t + 2 * nbins + 1
            n_sel = edges_t[-1] - edges_t[0]
            n_host = n_host + jnp.where(n_sel > kmax, n_sel, 0)
        td, tc = _rasterize_sorted(
            sfields, edges_t,
            width=width, height=height, halo=halo_t, chunk=chunk_t,
            total_chunks=cap_t, interpret=interpret,
        )
        d, c = (td, tc) if d is None else _lex_min(d, c, td, tc)

    n_host = n_host + jnp.sum(visible & (r > _RMAX_T3))
    rgb_u32 = jnp.where(
        c >= _RGB_MISS, jnp.uint32(0xFFFFFFFF), c.astype(jnp.uint32)
    )
    return rgb_u32, d, n_host


@functools.partial(
    jax.jit, static_argnames=("width", "height", "interpret")
)
def resolve_small_pallas_masked(cx, cy, depth_bits, rgb24, r, visible, *,
                                width, height, interpret=False):
    """Round-4 contract kept for comparison/tests: rasterize only the
    small splats (r < 2 px); returns ``(rgb_u32, depth_f32, n_large)``
    with ``n_large`` the count of visible r >= 2 splats left for a host
    composite."""
    depth_f = lax.bitcast_convert_type(depth_bits, jnp.float32)
    rsq_hi, rsq_lo = _dekker_sq(r)
    halo1, chunk1, _ = _TIERS[0]
    d, c = _resolve_tier(
        cx, cy, depth_f, rgb24.astype(jnp.float32), rsq_hi, rsq_lo,
        visible & (r < _RMAX_T1),
        width=width, height=height, halo=halo1, chunk=chunk1,
        interpret=interpret,
    )
    rgb_u32 = jnp.where(
        c >= _RGB_MISS, jnp.uint32(0xFFFFFFFF), c.astype(jnp.uint32)
    )
    n_large = jnp.sum(visible & (r >= _RMAX_T1))
    return rgb_u32, d, n_large
