"""Device mesh + sharding layer.

TPU-native equivalent of the reference's PyTorch-Lightning DP/DDP + NCCL
parallelism (ref main.py:43-58, SURVEY.md §2.9): ONE pjit-compiled global-view
program over a `jax.sharding.Mesh`. The batch is sharded over the `data` axis;
XLA inserts the gradient all-reduce and — because BatchNorm statistics are
computed over the *global* batch inside the same program — cross-replica
SyncBN falls out for free (the reference needs accelerator='ddp' +
sync_batchnorm for that, config_manager.py:57).

The mesh is declared 2-D ('data', 'model') with the model axis defaulting to
size 1: the CNN models here need no tensor parallelism (SURVEY.md §2.9 — the
reference has none either), but every sharding goes through this module so a
model axis can be enabled without touching call sites.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize JAX's multi-host runtime for pod-scale runs (DCN between
    hosts, ICI within): a thin wrapper over jax.distributed.initialize that
    no-ops on a single host. Call before any device access."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """A ('data', 'model') mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, f"{n} devices not divisible by model_parallel={model_parallel}"
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """One fused host->device transfer placing every array batch-sharded."""
    sharding = batch_sharding(mesh)
    return jax.device_put(batch, jax.tree_util.tree_map(lambda _: sharding, batch))


def shard_batch_from_local(local_batch: dict, mesh: Mesh) -> dict:
    """Multi-PROCESS twin of shard_batch: each process contributes only its
    local leading-axis shard (what its Grain `ShardByJaxProcess` pipeline
    produced), and the result is one global batch-sharded jax.Array per leaf.
    The global batch size is local * process_count; the data-axis layout must
    place each process's devices contiguously (get_mesh does).

    TPU-native equivalent of the reference's DDP per-rank DistributedSampler
    batches (ref main.py:49-55, SURVEY.md §2.9)."""
    sharding = batch_sharding(mesh)
    nproc = jax.process_count()

    def to_global(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=(x.shape[0] * nproc,) + x.shape[1:]
        )

    return jax.tree_util.tree_map(to_global, local_batch)
