"""Shared tile-size resolution for the Pallas kernels.

One policy, one place: ``divisor_block`` halves from the wanted size
while above ``floor`` (preferring power-of-two-ish blocks the Mosaic
pipelines like), then decrements — so the result is ALWAYS a divisor of
``n`` (possibly below ``floor``, down to 1 for prime ``n``; callers that
require lane alignment must check the result).  Previously five
near-identical copies of this loop lived in the VJP kernels, the
limb-combine epilogue, the PM tile path and ``p3m_block``, and had
already started to diverge (round-3 review).  ``ops/step.py:fit_block``
stays separate on purpose: it RAISES when nothing fits, the right
contract for the force kernels whose padding the engine controls.
"""

from __future__ import annotations


def divisor_block(n: int, want: int, floor: int = 8) -> int:
    """Largest block <= ``want`` that divides ``n``: halve while above
    ``floor``, then decrement to the nearest divisor."""
    if n <= 0:
        raise ValueError(f"cannot fit a block into n={n}")
    b = max(1, min(want, n))
    while b > floor and n % b != 0:
        b //= 2
    while n % b != 0:
        b -= 1
    return b
