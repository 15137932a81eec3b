"""Multi-host (multi-process jax.distributed) dryrun test (VERDICT r2
item 4).

Spawns two local CPU processes over one global mesh, each feeding its
per-process loader shard, runs one DP TrackNet train step, and asserts
(a) both processes compute the bitwise-same loss and (b) it matches a
single-process run of the same global batch (to cross-process
reduction-order tolerance). The logic lives in
__graft_entry__.dryrun_multihost; this test drives it end-to-end.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multihost_two_processes():
    from __graft_entry__ import dryrun_multihost

    # 2 processes x 2 devices keeps the subprocess compiles tolerable on
    # the 1-core CI host; the device-count split is what's under test.
    dryrun_multihost(n_processes=2, ndev_per_proc=2)
