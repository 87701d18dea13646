"""Multi-host (DCN) dryrun: the SURVEY §2c "multi-host feed over DCN"
leg, validated without real hosts.

Spawns 2 coordinated `jax.distributed` processes x 4 virtual CPU devices
(one global 8-device mesh).  Each process parses its OWN streams and
feeds only its local shards (`make_array_from_process_local_data`); the
decode runs under one global `shard_map` whose psum stat crosses the
process boundary.  Every worker asserts the full reference golden hash
(0xea6d7fcb1340ba3f) on each of its local streams, including the
end-of-stream flush frame.

Set MPEG_TPU_SKIP_MULTIHOST=1 to skip (e.g. on constrained CI runners:
the run costs two extra JAX processes and ~1-2 min of compile).
"""

import os

import pytest

from mpeg_tpu.parallel.multihost import launch


@pytest.mark.skipif(os.environ.get("MPEG_TPU_SKIP_MULTIHOST") == "1",
                    reason="multi-host dryrun disabled by env")
def test_multihost_two_process_golden():
    reports = launch(num_processes=2, local_devices=4)
    assert len(reports) == 2
    for line in reports:
        assert line.startswith("OK process"), line
        assert "golden 0xea6d7fcb1340ba3f" in line, line
