"""Kernel optimization sweep: time force-kernel variants on the real chip.

Methodology: each variant runs K steps inside one jitted lax.scan (no
per-call overhead), synced by device_get of an output scalar (the relay's
block_until_ready is a no-op — see .claude/skills/verify/SKILL.md).

Usage: python benchmarks/kernel_sweep.py [N] [K]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS2 = 1e-4


def make_variant(
    n,
    bt,
    bs,
    *,
    mask: bool = True,
    accum: str = "scratch",  # scratch | reduce_per_j | mxu | probe_minimal
    rsqrt_mode: str = "d6",  # d6: rsqrt(d2^3) | split: rsqrt(d2)^3
    precision=None,
    vmem_limit: int | None = None,
):
    """Returns step(pos_mass, srcT) -> accel as a pallas_call."""
    nt, ns = n // bt, n // bs

    def kernel(srcT_ref, src4_ref, tgt_ref, out_ref, *scratch):
        i = pl.program_id(0)
        j = pl.program_id(1)
        tgt = tgt_ref[...]
        tx = tgt[:, 0:1]
        ty = tgt[:, 1:2]
        tz = tgt[:, 2:3]
        sx = srcT_ref[0:1, :]
        sy = srcT_ref[1:2, :]
        sz = srcT_ref[2:3, :]
        gm = srcT_ref[3:4, :]
        if accum == "probe_minimal":
            # Floor probe: no physics, just 3 subs + per-j reduce.
            part = jnp.concatenate(
                [
                    jnp.sum(sx - tx, axis=1, keepdims=True),
                    jnp.sum(sy - ty, axis=1, keepdims=True),
                    jnp.sum(sz - tz, axis=1, keepdims=True),
                    jnp.zeros((bt, 1), jnp.float32),
                ],
                axis=1,
            )

            @pl.when(j == 0)
            def _():
                out_ref[...] = part

            @pl.when(j > 0)
            def _():
                out_ref[...] += part

            return

        dx = sx - tx
        dy = sy - ty
        dz = sz - tz
        d2 = dx * dx + dy * dy + dz * dz + EPS2
        if rsqrt_mode == "d6":
            inv3 = lax.rsqrt(d2 * d2 * d2)
        else:
            r = lax.rsqrt(d2)
            inv3 = r * r * r
        w = gm * inv3
        if mask:
            rows = lax.broadcasted_iota(jnp.int32, (bt, bs), 0) + i * bt
            cols = lax.broadcasted_iota(jnp.int32, (bt, bs), 1) + j * bs
            w = jnp.where(rows == cols, 0.0, w)

        if accum == "scratch":
            accx, accy, accz = scratch
            for acc_ref, d in ((accx, dx), (accy, dy), (accz, dz)):
                c = w * d

                @pl.when(j == 0)
                def _():
                    acc_ref[...] = c

                @pl.when(j > 0)
                def _():
                    acc_ref[...] += c

            @pl.when(j == ns - 1)
            def _():
                out_ref[...] = jnp.concatenate(
                    [
                        jnp.sum(accx[...], axis=1, keepdims=True),
                        jnp.sum(accy[...], axis=1, keepdims=True),
                        jnp.sum(accz[...], axis=1, keepdims=True),
                        jnp.zeros((bt, 1), jnp.float32),
                    ],
                    axis=1,
                )

        elif accum == "reduce_per_j":
            part = jnp.concatenate(
                [
                    jnp.sum(w * dx, axis=1, keepdims=True),
                    jnp.sum(w * dy, axis=1, keepdims=True),
                    jnp.sum(w * dz, axis=1, keepdims=True),
                    jnp.zeros((bt, 1), jnp.float32),
                ],
                axis=1,
            )

            @pl.when(j == 0)
            def _():
                out_ref[...] = part

            @pl.when(j > 0)
            def _():
                out_ref[...] += part

        elif accum == "mxu":
            (acc4,) = scratch
            # src4 input: (bs, 4) columns [x, y, z, 1]
            part = jnp.dot(
                w, src4_ref[...], preferred_element_type=jnp.float32, precision=precision
            )

            @pl.when(j == 0)
            def _():
                acc4[...] = part

            @pl.when(j > 0)
            def _():
                acc4[...] += part

            @pl.when(j == ns - 1)
            def _():
                a = acc4[...]
                # t4 = [tx, ty, tz, 1] built via lane-index select (no
                # captured array constants — Mosaic rejects those)
                lane = lax.broadcasted_iota(jnp.int32, (bt, 4), 1)
                t4 = jnp.where(lane == 3, 1.0, tgt)
                out_ref[...] = a - t4 * a[:, 3:4]

    if accum == "scratch":
        scratch_shapes = [pltpu.VMEM((bt, bs), jnp.float32)] * 3
    elif accum == "mxu":
        scratch_shapes = [pltpu.VMEM((bt, 4), jnp.float32)]
    else:
        scratch_shapes = []

    cp_kw = dict(dimension_semantics=("parallel", "arbitrary"))
    if vmem_limit is not None:
        cp_kw["vmem_limit_bytes"] = vmem_limit
    call = pl.pallas_call(
        kernel,
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec((4, bs), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(**cp_kw),
        cost_estimate=pl.CostEstimate(
            flops=16 * n * n, bytes_accessed=nt * n * 16, transcendentals=n * n
        ),
    )
    return call


def make_turbo(n, bt, bs, vmem_limit=None):
    """Full-MXU variant: d2 via norm expansion with a limb-split bf16
    cross-term matmul (K=18, ~f32-exact), accumulation via the bf16 W@S10
    matmul; VPU does only d2 assembly + cube + rsqrt (~5 ops/pair).

    Inputs: t18 (N,18), s18T (18,N), tn (N,1) = |t|^2+eps2, snT (1,N),
    src10 (N,16) gm-scaled limbs.
    """
    nt, ns = n // bt, n // bs

    def kernel(t18_ref, s18T_ref, tn_ref, snT_ref, src10_ref, out_ref, acc):
        j = pl.program_id(1)
        ns_ = pl.num_programs(1)
        ts = jnp.dot(
            t18_ref[...], s18T_ref[...], preferred_element_type=jnp.float32
        )  # (bt, bs)
        d2 = (tn_ref[...] + snT_ref[...]) - 2.0 * ts
        inv3 = lax.rsqrt(d2 * (d2 * d2))
        part = jnp.dot(inv3, src10_ref[...], preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            acc[...] = part

        @pl.when(j > 0)
        def _():
            acc[...] += part

        @pl.when(j == ns_ - 1)
        def _():
            a = acc[...]
            s = a[:, 9:10]
            tx = t18_ref[:, 0:1] + t18_ref[:, 3:4] + t18_ref[:, 5:6]  # th+tm+tl
            ty = t18_ref[:, 6:7] + t18_ref[:, 9:10] + t18_ref[:, 11:12]
            tz = t18_ref[:, 12:13] + t18_ref[:, 15:16] + t18_ref[:, 17:18]
            ax = (a[:, 0:1] + a[:, 1:2] + a[:, 2:3]) - tx * s
            ay = (a[:, 3:4] + a[:, 4:5] + a[:, 5:6]) - ty * s
            az = (a[:, 6:7] + a[:, 7:8] + a[:, 8:9]) - tz * s
            out_ref[...] = jnp.concatenate(
                [ax, ay, az, jnp.zeros((bt, 1), jnp.float32)], axis=1
            )

    cp_kw = dict(dimension_semantics=("parallel", "arbitrary"))
    if vmem_limit is not None:
        cp_kw["vmem_limit_bytes"] = vmem_limit
    call = pl.pallas_call(
        kernel,
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec((bt, 18), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, bs), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 16), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, 16), jnp.float32)],
        compiler_params=pltpu.CompilerParams(**cp_kw),
        cost_estimate=pl.CostEstimate(
            flops=16 * n * n, bytes_accessed=nt * n * 16, transcendentals=n * n
        ),
    )
    return call


def turbo_prep(pos, gm):
    """Build t18/s18T/tn/snT/src10 from f32 positions."""

    def limbs(v):
        h = v.astype(jnp.bfloat16).astype(jnp.float32)
        rem = v - h
        m = rem.astype(jnp.bfloat16).astype(jnp.float32)
        return h, m, rem - m

    tcols, srows = [], []
    for c in range(3):
        h, m, l = limbs(pos[:, c : c + 1])
        # combos hh, hm, hl, mh, mm, lh
        tcols.extend([h, h, h, m, m, l])
        srows.extend([h, m, l, h, m, h])
    t18 = jnp.concatenate(tcols, axis=1)  # (N, 18)
    s18T = jnp.concatenate([r.T for r in srows], axis=0)  # (18, N)
    tn = (jnp.sum(pos * pos, axis=1, keepdims=True) + EPS2).astype(jnp.float32)
    snT = jnp.sum(pos * pos, axis=1)[None, :]
    cols = []
    for c in range(3):
        h, m, l = limbs(gm[:, None] * pos[:, c : c + 1])
        cols.extend([h, m, l])
    cols.append(gm[:, None])
    cols.append(jnp.zeros((pos.shape[0], 6), jnp.float32))
    src10 = jnp.concatenate(cols, axis=1)
    return t18, s18T, tn, snT, src10


def time_turbo(name, n, k, bt, bs):
    try:
        call = make_turbo(n, bt, bs, vmem_limit=100 * 1024 * 1024)

        @jax.jit
        def run(pos, gm):
            def body(c, _):
                t18, s18T, tn, snT, src10 = turbo_prep(c, gm)
                acc = call(t18, s18T, tn, snT, src10)
                return c + acc[:, :3] * 1e-30, None

            out, _ = lax.scan(body, pos, None, length=k)
            return out

        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.normal(scale=3, size=(n, 3)).astype(np.float32))
        gm = jnp.asarray((1e-4 * rng.uniform(1, 50, n)).astype(np.float32))
        out = run(pos, gm)
        jax.device_get(out[0, 0])
        t0 = time.perf_counter()
        out = run(pos, gm)
        jax.device_get(out[0, 0])
        el = time.perf_counter() - t0
        per_step = el / k
        print(f"{name:50s} {per_step*1e3:8.2f} ms/step {n*n/per_step/1e9:8.1f} G-int/s")
    except Exception as e:
        print(f"{name:50s} FAILED: {type(e).__name__}: {str(e)[:140]}")


def check_turbo_accuracy(n=4096, bt=512, bs=1024):
    """Compare turbo vs exact oracle on clustered data (close pairs)."""
    from nbody3d_tpu.ops.force_jnp import accel_direct

    rng = np.random.default_rng(1)
    pm = np.concatenate(
        [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
    ).astype(np.float32)
    pos = jnp.asarray(pm[:, :3])
    gm = jnp.asarray(1e-4 * pm[:, 3])
    call = make_turbo(n, bt, bs, vmem_limit=100 * 1024 * 1024)
    t18, s18T, tn, snT, src10 = turbo_prep(pos, gm)
    acc = call(t18, s18T, tn, snT, src10)
    oracle = accel_direct(jnp.asarray(pm), 1e-4, eps2=EPS2)
    err = np.abs(np.asarray(acc) - np.asarray(oracle[:, :4]))
    scale = np.abs(np.asarray(oracle)).max()
    print(f"turbo accuracy: max_abs={err.max():.3e} rel_to_scale={err.max()/scale:.3e}")


def time_variant(name, n, k, make):
    try:
        call = make()

        @functools.partial(jax.jit, static_argnames=())
        def run(pos_mass, srcT, src4):
            def body(c, _):
                acc = call(srcT, src4, c)
                # fold accel back into carry so scan can't elide or hoist
                # steps (tiny but non-zero coefficient — x*0 could fold)
                return c + acc * 1e-30, None

            out, _ = lax.scan(body, pos_mass, None, length=k)
            return out

        rng = np.random.default_rng(0)
        pm = np.concatenate(
            [rng.normal(scale=3, size=(n, 3)), rng.uniform(1, 50, size=(n, 1))], axis=1
        ).astype(np.float32)
        pos = jnp.asarray(pm)
        srcT = jnp.concatenate([pos[:, :3].T, (1e-4 * pos[:, 3])[None, :]], axis=0)
        src4 = jnp.concatenate([pos[:, :3], jnp.ones((n, 1), jnp.float32)], axis=1)
        out = run(pos, srcT, src4)
        jax.device_get(out[0, 0])  # warm + sync
        t0 = time.perf_counter()
        out = run(pos, srcT, src4)
        jax.device_get(out[0, 0])
        el = time.perf_counter() - t0
        per_step = el / k
        gints = n * n / per_step / 1e9
        print(f"{name:50s} {per_step*1e3:8.2f} ms/step {gints:8.1f} G-int/s")
        return gints
    except Exception as e:
        print(f"{name:50s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return 0.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    print(f"N={n} K={k} platform={jax.default_backend()}")

    P = jax.lax.Precision
    V = 100 * 1024 * 1024  # let Mosaic use what it needs; it still checks fit
    variants = [
        ("rpj bt512 bs1024", dict(bt=512, bs=1024, accum="reduce_per_j", mask=False)),
        ("rpj bt512 bs2048", dict(bt=512, bs=2048, accum="reduce_per_j", mask=False, vmem_limit=V)),
        ("rpj bt1024 bs1024", dict(bt=1024, bs=1024, accum="reduce_per_j", mask=False, vmem_limit=V)),
        ("rpj bt1024 bs2048", dict(bt=1024, bs=2048, accum="reduce_per_j", mask=False, vmem_limit=V)),
        ("rpj bt2048 bs1024", dict(bt=2048, bs=1024, accum="reduce_per_j", mask=False, vmem_limit=V)),
        ("rpj bt256 bs4096", dict(bt=256, bs=4096, accum="reduce_per_j", mask=False, vmem_limit=V)),
        ("probe_minimal bt512 bs1024", dict(bt=512, bs=1024, accum="probe_minimal", mask=False)),
        ("probe_minimal bt1024 bs2048", dict(bt=1024, bs=2048, accum="probe_minimal", mask=False, vmem_limit=V)),
        ("mxu HIGHEST bt512 bs1024", dict(bt=512, bs=1024, accum="mxu", mask=False, precision=P.HIGHEST, vmem_limit=V)),
        ("mxu DEFAULT bt512 bs1024", dict(bt=512, bs=1024, accum="mxu", mask=False, precision=P.DEFAULT, vmem_limit=V)),
        ("mxu HIGHEST bt1024 bs2048", dict(bt=1024, bs=2048, accum="mxu", mask=False, precision=P.HIGHEST, vmem_limit=V)),
    ]
    if len(sys.argv) > 3 and sys.argv[3] == "turbo":
        check_turbo_accuracy()
        for bt, bs in [(512, 1024), (1024, 1024), (1024, 2048), (2048, 2048)]:
            time_turbo(f"turbo bt{bt} bs{bs}", n, k, bt, bs)
        return
    for name, kw in variants:
        time_variant(name, n, k, lambda kw=kw: make_variant(n, **kw))


if __name__ == "__main__":
    main()
