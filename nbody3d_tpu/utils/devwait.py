"""Wait out relay outages before committing a process to device init.

The TPU in this deployment is reached through a relay; when the tunnel is
down, device acquisition HANGS inside the PJRT client (it does not raise),
so in-process retry logic never fires.  The only robust probe is a
subprocess with a hard timeout.  Call :func:`wait_for_device` before the
first `jax.devices()` / first computation in any benchmark or long-running
entry point.
"""

from __future__ import annotations

import subprocess
import sys
import time


def wait_for_device(budget_s: float = 1800.0, probe_timeout_s: float = 180.0) -> bool:
    """Probe device acquisition in a subprocess until it succeeds or the
    budget runs out.  Returns True if a probe succeeded.

    Skipped (returns True immediately) when the calling process has
    pinned itself to CPU via ``jax.config.update("jax_platforms",
    "cpu")`` — a CPU smoke run must not sit out a TPU relay outage —
    or when the budget is <= 0."""
    if budget_s <= 0:
        return True
    try:
        import jax

        if str(jax.config.jax_platforms or "").startswith("cpu"):
            return True
    except Exception:
        pass
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(
                f"device probe failed {attempt}x for {budget_s:.0f}s; "
                "proceeding anyway",
                file=sys.stderr,
            )
            return False
        print(f"device probe {attempt} failed; retrying in 60 s", file=sys.stderr)
        time.sleep(60)
