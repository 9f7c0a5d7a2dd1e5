"""Two-process jax.distributed smoke test (VERDICT r4 item 3 / SURVEY §2.9).

The reference trains DDP multi-PROCESS (ref main.py:49-55: one torch process
per GPU, DistributedSampler input shards, NCCL gradient all-reduce). The
TPU-native twin is jax.distributed + per-process Grain `ShardByJaxProcess`
input shards feeding ONE global pjit train step. This test runs it for real:
2 spawned processes x 4 virtual CPU devices each, gloo collectives, the FULL
flagship train step — asserting disjoint+complete input shards and a finite
global loss in every process.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_two_process_train_step():
    import __graft_entry__ as g

    # port distinct from the dryrun default so a concurrent driver run
    # can't collide with the test's coordinator service
    g.dryrun_multiprocess(n_processes=2, devices_per_process=4, port=12329)
