"""Device mesh construction (the L0 equivalent, SURVEY §1).

The reference's device acquisition (``nbody3d.js:139-161``) maps to JAX
platform/mesh setup.  Multi-host scale-out uses the same SPMD program via
``jax.distributed.initialize`` before mesh construction (SURVEY §5.8) —
XLA owns the wire, the framework owns the schedule.
"""

from __future__ import annotations

import jax


def default_mesh(n_devices: int | None = None, axis: str = "x") -> jax.sharding.Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return jax.make_mesh((n_devices,), (axis,), devices=devices[:n_devices])


def grid_mesh(
    rows: int | None = None,
    cols: int | None = None,
    axes: tuple[str, str] = ("row", "col"),
    n_devices: int | None = None,
) -> jax.sharding.Mesh:
    """2-D (rows x cols) mesh for the grid force decomposition (strategy
    '2d', SURVEY §2.2's TP-analog).  With no shape given, picks the most
    square factorization of the device count — per-step traffic scales with
    N/rows + N/cols, so square minimizes it (~2N/sqrt(D) vs the ring's N).
    """
    devices = jax.devices()
    d = n_devices if n_devices is not None else len(devices)
    if d > len(devices):
        raise ValueError(f"requested {d} devices, have {len(devices)}")
    if rows is None and cols is None:
        rows = int(d**0.5)
        while d % rows != 0:
            rows -= 1
        cols = d // rows
    elif rows is None:
        if d % cols != 0:
            raise ValueError(f"cols={cols} does not divide {d} devices")
        rows = d // cols
    elif cols is None:
        if d % rows != 0:
            raise ValueError(f"rows={rows} does not divide {d} devices")
        cols = d // rows
    if rows * cols != d:
        raise ValueError(f"mesh {rows}x{cols} != {d} devices")
    return jax.make_mesh((rows, cols), axes, devices=devices[:d])


def mesh_info() -> dict:
    """Platform/device info — the framework's answer to the reference's
    adapter feature negotiation + unsupported-browser fallback
    (``nbody3d.js:139-155``)."""
    devices = jax.devices()
    return {
        "platform": jax.default_backend(),
        "n_devices": len(devices),
        "device_kind": devices[0].device_kind if devices else "none",
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
