"""On-device depth resolve: the packed-key scatter-min as a Pallas kernel.

The host resolve (``native/_raster.c``) min-reduces packed
``(depth_bits << 32) | rgb24`` uint64 keys per pixel — exactly the
reference's depth test (``nbody3d.js:401-405``) with color-deterministic
ties.  Fetching its per-body inputs costs ~20 B/body of device→host
traffic (334 MB at 16M — 75 s through a 1-8 MB/s relay).  XLA's
``.at[].min`` scatter was measured and rejected (~102-141 M stamps/s:
colliding-index scatters serialize; docs/DESIGN.md renderer section).

This kernel rasterizes the SMALL splats (r < 2 px — the bulk at viewer
scale) on the TPU itself with a dense one-hot formulation that never
scatters:

- The framebuffer is tiled into (BH, BW) pixel bins; each bin's local
  buffer carries a 1-px halo (BH+2, BW+2) so a body's full 3x3 stamp
  stays tile-local regardless of which side of a bin boundary it sits
  on (the mesh kernels' halo trick, ``ops/mesh_pallas.py``); halos are
  folded into the flat framebuffer by one XLA lex-min overlay after.
- Bodies are binned by center pixel, sorted by bin id, and packed into
  fixed-size chunks of C records (one grid step each, padded per bin so
  a chunk never spans bins).  The output BlockSpec revisits the bin's
  tile across its consecutive chunks (scalar-prefetched ``chunk_bin``
  index map — the block-sparse p3m short-range pattern, p3m.py:835).
- Per chunk the kernel runs BH+2 row passes; each builds a (C, lanes)
  one-hot compare — ``|iota - cx_local| <= halfwidth`` with the
  row/offset circle inclusion folded into the halfwidth — and
  min-reduces over bodies.  The work is dense VPU compares
  (~(BH+2)·lanes cells per body), never a serialized scatter.
- Depth and color resolve lexicographically, bit-identically to the
  u64 min: an f32 depth min (IEEE non-negative floats order as their
  bit patterns and compare equal iff bit-equal), then an rgb24 min
  among depth winners, merged into the accumulator under the same tie
  rule.  rgb24 < 2^24 is exact in f32.

Only the framebuffer crosses the wire afterwards: 8 MB of u32 rgb at
1080p (plus the f32 depth plane when large splats must still be
stamped host-side — they are the radius-descending sort's prefix,
stamped with full disc semantics by the C resolve on top of the
fetched buffer, so the composite equals the all-host resolve exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Bin geometry.  BH x BW pixel bins; the local tile carries a 1-px halo.
_BH = 8
_BW = 256
_LANES = 384  # BW + 2 = 258 rounded up to the lane multiple (3 * 128)
_CHUNK = 1024  # bodies per grid step
_RMAX = 2.0  # splats below this radius resolve on-device (3x3 stamp max)

# Smallest f32 whose exact square is >= 2: the corner-offset inclusion
# threshold.  The host resolves |(1,1)| <= r against float64 sqrt(2)
# (or r*r >= 2 in exact f64 — the same predicate on f32 r), so the f32
# compare `r >= _SQRT2_UP` reproduces it bit-exactly.
_SQRT2_UP = float(np.nextafter(np.float32(np.sqrt(2.0)), np.float32(3.0)))
assert float(np.float32(_SQRT2_UP)) ** 2 >= 2.0
assert float(np.float32(np.sqrt(2.0))) ** 2 < 2.0

# f32 sentinels.  Depths are <= 1.0 and rgb24 < 2^24, so these are
# strictly larger than any real value and survive min untouched.
_RGB_MISS = float(1 << 25)


def _resolve_kernel(chunk_bin_ref, chunk_first_ref, rec_ref,
                    dplane_ref, cplane_ref, *, rows, lanes, c):
    """One chunk of C body records against its bin's halo'd tile.

    ``rec`` (1, 8, C) f32 rows: [cx_local, cy_local, depth, rgb24, r,
    valid, 0, 0] with cx_local/cy_local the body center in tile coords
    (halo included: local = pixel - bin_origin + 1).  Fields ride the
    SUBLANE axis so the HBM array tiles exactly — a (total*C, 8) layout
    lane-pads 8 -> 128 (16x, ~8.5 GB of temps at 16M: the same minor-dim
    landmine as the mesh kernels' (N, 4) operands); one in-kernel
    transpose restores the (C, 1) column vectors the row passes need.
    ``dplane``/``cplane`` (1, rows, lanes): the bin's depth / rgb
    planes, lex-min-accumulated across the bin's consecutive chunks.
    """
    i = pl.program_id(0)

    @pl.when(chunk_first_ref[i] != 0)
    def _init():
        dplane_ref[0] = jnp.full((rows, lanes), jnp.inf, jnp.float32)
        cplane_ref[0] = jnp.full((rows, lanes), _RGB_MISS, jnp.float32)

    rec = rec_ref[0].T  # (C, 8)
    cx = rec[:, 0:1]
    cy = rec[:, 1:2]
    depth = rec[:, 2:3]
    rgb = rec[:, 3:4]
    r = rec[:, 4:5]
    valid = rec[:, 5:6] > 0.0

    # Circle inclusion |(dx, dy)| <= r (nbody3d.js:377-378): the center
    # always; edge offsets need r >= 1; corner offsets r >= sqrt(2).
    ctr_hw = jnp.where(r >= 1.0, 1.0, 0.0)  # reach on the dy=0 row
    edge_hw = jnp.where(r >= _SQRT2_UP, 1.0, 0.0)  # reach on dy=+-1 rows
    # Mosaic iota must be integer; f32 holds lane indices < 2^24 exactly.
    iota = lax.broadcasted_iota(jnp.int32, (c, lanes), 1).astype(jnp.float32)
    dcol = jnp.abs(iota - cx)  # (C, lanes)

    d_acc = dplane_ref[0]
    c_acc = cplane_ref[0]
    out_d = []
    out_c = []
    for rr in range(rows):
        dy = rr - cy  # (C, 1)
        hw = jnp.where(dy == 0.0, ctr_hw, edge_hw)
        row_ok = valid & (jnp.abs(dy) <= 1.0) & ((dy == 0.0) | (r >= 1.0))
        hit = row_ok & (dcol <= hw)
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
            jnp.where(better, cmin, jnp.where(tie, jnp.minimum(cmin, oc), oc))
        )
    dplane_ref[0] = jnp.concatenate(out_d, axis=0)
    cplane_ref[0] = jnp.concatenate(out_c, axis=0)


#: Static capacity of :func:`compact_large`'s buffer.  Large splats are
#: the r >= 2 px minority (~9k visible at 16M bodies, viewer scale); the
#: caller falls back to the sorted-prefix path if ``n_large`` exceeds it.
LARGE_KMAX = 1 << 17


@functools.partial(jax.jit, static_argnames=("kmax",))
def compact_large(cx, cy, depth_bits, rgb24, r, visible, *,
                  kmax=LARGE_KMAX):
    """Pack the visible ``r >= _RMAX`` splats into a fixed ``(kmax + 1,
    5)`` f32 buffer (order-preserving cumsum positions + one
    unique-index scatter — ~0.22 s at 16M vs ~0.9 s for the argsort +
    permutation gathers it replaces).  Rows: [cx, cy,
    bitcast(depth_bits), bitcast(rgb24), r]; row ``kmax`` is the
    overflow dump slot.  Returns ``(buf, n_large)``; the first
    ``min(n_large, kmax)`` rows are the splats in original order."""
    maskL = visible & (r >= _RMAX)
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


def _fold_axis(plane_d, plane_c, bsz):
    """Fold halo'd tiles along axis 1: (nb, bsz + 2, *rest) -> lex-min
    overlay on (nb * bsz + 2, *rest), tile b occupying rows
    [b * bsz, b * bsz + bsz + 2).  Adjacent tiles overlap by exactly
    the 2 halo rows, so the overlay splits into the perfectly-tiling
    first ``bsz`` rows plus the 2-row tails shifted down one block."""
    nb = plane_d.shape[0]
    rest = plane_d.shape[2:]
    npad = [(0, 2)] + [(0, 0)] * len(rest)
    main_d = jnp.pad(plane_d[:, :bsz].reshape((nb * bsz,) + rest), npad,
                     constant_values=np.inf)
    main_c = jnp.pad(plane_c[:, :bsz].reshape((nb * bsz,) + rest), npad,
                     constant_values=_RGB_MISS)

    tail_d = jnp.full((nb, bsz) + rest, np.inf, jnp.float32)
    tail_c = jnp.full((nb, bsz) + rest, _RGB_MISS, jnp.float32)
    tail_d = tail_d.at[:, 0:2].set(plane_d[:, bsz : bsz + 2])
    tail_c = tail_c.at[:, 0:2].set(plane_c[:, bsz : bsz + 2])
    ppad = [(bsz, 0)] + [(0, 0)] * len(rest)
    tail_d = jnp.pad(tail_d.reshape((nb * bsz,) + rest), ppad,
                     constant_values=np.inf)[: nb * bsz + 2]
    tail_c = jnp.pad(tail_c.reshape((nb * bsz,) + rest), ppad,
                     constant_values=_RGB_MISS)[: nb * bsz + 2]
    return _lex_min(main_d, main_c, tail_d, tail_c)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "interpret")
)
def resolve_small_pallas(cx, cy, depth_bits, rgb24, r, nvis, *,
                         width, height, interpret=False):
    """Sorted-prefix form of :func:`resolve_small_pallas_masked`:
    ``nvis`` counts the visible bodies, which must be the array prefix
    (the radius-descending device prep's layout,
    ``rasterize._prep_device_raw``)."""
    return resolve_small_pallas_masked(
        cx, cy, depth_bits, rgb24, r, jnp.arange(cx.shape[0]) < nvis,
        width=width, height=height, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("width", "height", "interpret")
)
def resolve_small_pallas_masked(cx, cy, depth_bits, rgb24, r, visible, *,
                                width, height, interpret=False):
    """Rasterize the small splats (r < 2 px) of a device prep on the
    TPU.  Returns ``(rgb_u32 (H, W), depth_f32 (H, W), n_large)`` where
    a miss carries ``rgb == 0xFFFFFFFF`` / ``depth == +inf`` — exactly
    the min over packed u64 keys restricted to the small splats — and
    ``n_large`` counts the visible splats with ``r >= 2`` (left for the
    host's full-disc stamp).

    Inputs are the device prep's arrays in ANY order (the resolve is a
    min — order-independent): ``cx``/``cy`` i32 center pixels,
    ``depth_bits`` u32 (bit pattern of the clipped [0,1] f32 depth),
    ``rgb24`` u32, ``r`` f32 pixel radius, ``visible`` bool mask.
    Feeding the UNSORTED projection output skips the radius
    argsort + 5 full-array permutation gathers the sorted prep pays
    (~0.9 s at 16M — the round-4 frame went 4.65 → ~3 s).
    """
    n = cx.shape[0]
    nbx = -(-width // _BW)
    nby = -(-height // _BH)
    nbins = nby * nbx

    valid = visible & (r < _RMAX)
    # Center pixels sit within r < 2 of the screen (the prep's
    # visibility test), so clamping for BINNING only moves stamp cells
    # that were off-screen anyway; the stamp itself still uses the
    # unclamped center (local coords below), preserving exact geometry.
    cxc = jnp.clip(cx, 0, width - 1)
    cyc = jnp.clip(cy, 0, height - 1)
    bin_id = jnp.where(valid, (cyc // _BH) * nbx + cxc // _BW, nbins)

    order = jnp.argsort(bin_id)
    sbin = bin_id[order]
    edges = jnp.searchsorted(
        sbin, jnp.arange(nbins + 1, dtype=bin_id.dtype), side="left"
    ).astype(jnp.int32)  # (nbins + 1,): per-bin [start, end) in sorted order
    counts = edges[1:] - edges[:-1]
    chunks = jnp.maximum(1, -(-counts // _CHUNK))  # >= 1 so every tile inits
    total_chunks = n // _CHUNK + nbins + (1 if n % _CHUNK else 0)
    cstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(chunks).astype(jnp.int32)]
    )  # (nbins + 1,)
    cid = jnp.arange(total_chunks, dtype=jnp.int32)
    chunk_bin = jnp.clip(
        jnp.searchsorted(cstart, cid, side="right") - 1, 0, nbins - 1
    ).astype(jnp.int32)
    chunk_first = jnp.concatenate(
        [jnp.ones(1, jnp.int32),
         (chunk_bin[1:] != chunk_bin[:-1]).astype(jnp.int32)]
    )

    # Slot s of chunk j -> sorted body index, or dead when past the
    # bin's count (bin-local padding) or past the real chunk list.
    base = edges[chunk_bin] + (cid - cstart[chunk_bin]) * _CHUNK
    slot = base[:, None] + jnp.arange(_CHUNK, dtype=jnp.int32)[None, :]
    live = (slot < edges[chunk_bin + 1][:, None]) & (
        cid[:, None] < cstart[-1]
    )
    gidx = order[jnp.where(live, slot, 0).reshape(-1)]

    by = chunk_bin // nbx
    bx = chunk_bin - by * nbx
    ox = jnp.repeat(bx * _BW - 1, _CHUNK)  # tile origin (halo offset -1)
    oy = jnp.repeat(by * _BH - 1, _CHUNK)
    depth_f = lax.bitcast_convert_type(depth_bits, jnp.float32)
    # ONE (6, N) -> (6, total*C) gather instead of six 1-D permutation
    # gathers: the slot->body indirection is the resolve's main HBM
    # traffic at 16M, and a single gather moves the same bytes in one
    # fused pass.  Fields stacked on axis 0 keep a lane dimension of N
    # or total*C (exact tiles); stacking on axis 1 instead materializes
    # (total*C, 8) minor-dim-8 temps that lane-pad 16x (~8.5 GB at 16M
    # — measured OOM).
    fields = jnp.stack(
        [
            cx.astype(jnp.float32),
            cy.astype(jnp.float32),
            depth_f,
            rgb24.astype(jnp.float32),
            r,
            valid.astype(jnp.float32),
        ],
        axis=0,
    )
    g = fields[:, gidx]  # (6, total*C)
    livef = live.reshape(-1).astype(jnp.float32)
    rec = jnp.concatenate(
        [
            g[0:1] - ox[None, :].astype(jnp.float32),
            g[1:2] - oy[None, :].astype(jnp.float32),
            g[2:5],
            g[5:6] * livef[None, :],
            jnp.zeros((2, total_chunks * _CHUNK), jnp.float32),
        ],
        axis=0,
    ).reshape(8, total_chunks, _CHUNK).transpose(1, 0, 2)

    rows = _BH + 2
    kernel = functools.partial(
        _resolve_kernel, rows=rows, lanes=_LANES, c=_CHUNK
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk_bin, chunk_first
        grid=(total_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, _CHUNK), lambda i, cb, cf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, rows, _LANES), lambda i, cb, cf: (cb[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, _LANES), lambda i, cb, cf: (cb[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    dplane, cplane = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbins, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((nbins, rows, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * total_chunks * rows * _CHUNK * _LANES,
            bytes_accessed=total_chunks * (8 * _CHUNK + 2 * rows * _LANES) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_bin, chunk_first, rec)

    # Fold halos into the flat framebuffer: rows first, then columns,
    # each a lex-min overlay of (nb, bsz + 2, ...) tiles (see
    # _fold_axis), then crop the outer 1-px halo ring.
    dplane = dplane[:, :, : _BW + 2].reshape(nby, nbx, rows, _BW + 2)
    cplane = cplane[:, :, : _BW + 2].reshape(nby, nbx, rows, _BW + 2)
    # rows: (nby, rows, nbx, BW+2) -> (nby*BH + 2, nbx, BW+2)
    d, c = _fold_axis(
        jnp.swapaxes(dplane, 1, 2), jnp.swapaxes(cplane, 1, 2), _BH
    )
    # crop the vertical halo now: global pixel row = fold row - 1
    d = d[1 : height + 1]
    c = c[1 : height + 1]
    # columns: (nbx, BW+2, H) -> (nbx*BW + 2, H)
    d, c = _fold_axis(
        jnp.transpose(d, (1, 2, 0)), jnp.transpose(c, (1, 2, 0)), _BW
    )
    d = jnp.swapaxes(d[1 : width + 1], 0, 1)  # (H, W)
    c = jnp.swapaxes(c[1 : width + 1], 0, 1)

    rgb_u32 = jnp.where(
        c >= _RGB_MISS, jnp.uint32(0xFFFFFFFF), c.astype(jnp.uint32)
    )
    n_large = jnp.sum(visible & (r >= _RMAX))
    return rgb_u32, d, n_large
