"""Multi-host (DCN) path: 2-process jax.distributed dry run.

Covers ``parallel.mesh.maybe_initialize_distributed`` (explicit
coordinator env), per-process loader sharding (``data.loader.
shard_for_host``) and a cross-process grad-psum supervised step — the
pod translation of the reference's ``nn.DataParallel``
(``train_partseg_shapenet.py:248-250``, SURVEY.md §2.7).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # spawns 2 fresh jax processes (~2 min)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dryrun():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers set their own
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_multihost.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "MULTIHOST DRYRUN PASSED" in proc.stdout
