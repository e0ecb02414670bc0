"""Two-process jax.distributed rehearsal (scripts/multihost_smoke.py).

The reference initializes a process group and exits every rank but 0
(generate.py:41-52, "we don't support parallel inference yet"); this
framework actually joins ranks into one SPMD runtime. The smoke spawns two
localhost CPU processes, runs ``jax.distributed.initialize`` through
``parallel.distributed.setup``, and checks a cross-process allgather, a
global-mesh psum, and a tp=8 spec decode spanning both processes against
the single-process token stream.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multihost_smoke():
    # the parent self-selects a free coordinator port (no collision with
    # concurrent manual runs or orphaned children)
    env = dict(os.environ)
    env.pop("LAYERSKIP_SMOKE_PORT", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=600, env=env,
    )
    out = r.stdout.decode(errors="replace")
    assert r.returncode == 0, out[-3000:]
    assert "[parent] multihost smoke: PASS" in out, out[-3000:]
    for rank in range(2):
        assert f"[rank {rank}] tp=8 cross-process spec decode == " \
               f"single-process" in out, out[-3000:]
