"""Multi-PROCESS ring step (SURVEY §5.8 DCN analog): spawn 2 real worker
processes connected via jax.distributed + Gloo CPU collectives and check
the particle-sharded step against a single-device reference.

The heavy lifting lives in ``benchmarks/multihost_smoke.py`` (also a
standalone harness); this test shells out because jax.distributed can only
be initialized once per process — it must not touch the test runner's
already-initialized single-process backend.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "multihost_smoke.py")


@pytest.mark.parametrize(
    "strategy,port", [("ring", "29761"), ("gather", "29762")]
)
def test_two_process_sharded_step(strategy, port):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    out = subprocess.run(
        [sys.executable, SCRIPT, "--strategy", strategy, "--port", port],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "multihost smoke: PASS" in out.stdout
