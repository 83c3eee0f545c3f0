"""Device mesh and sharding helpers — the TPU-native data parallelism.

The reference's only parallelism is single-process ``nn.DataParallel``
(``train_partseg_shapenet.py:248-250``): scatter the batch over GPUs,
replicate the module, gather outputs.  The idiomatic TPU equivalent
(SURVEY.md §2.7) is a 1-D ``jax.sharding.Mesh`` over all devices with the
batch axis sharded and parameters replicated; ``jit``'s partitioner then
runs the whole train step SPMD and inserts gradient all-reduces over ICI.
Unlike DataParallel, batch statistics and losses are computed over the
*global* batch (the partitioner turns batch-axis means into cross-device
collectives automatically), and there is no uneven-shard crash to paper
over (the loader drops ragged tails).

Multi-host pods need no extra code here: under
``jax.distributed.initialize`` the same mesh spans all hosts and each host
feeds its addressable shard (``data.loader.shard_for_host``).
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_data_mesh(batch_size: int, devices=None,
                   axis_name: str = "data") -> Mesh:
    """1-D mesh using the most devices that evenly divide the batch.

    Keeps tiny debug batches runnable on large meshes (the leading axis of
    a sharded array must divide the mesh size).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch (pytree of arrays) batch-sharded on the mesh.

    Leading axis of every leaf must be divisible by the mesh size.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when launched under a pod coordinator.

    No-op on single-host runs.  Honors the standard env used by TPU pod
    launchers (``jax.distributed.initialize`` auto-detects TPU pods; the
    env guard avoids touching single-chip axon sessions).  When the
    coordinator address is explicit (``JAX_COORDINATOR_ADDRESS``), the
    process id/count are read from env too — this is the non-TPU path
    (CPU multi-process, exercised by ``tools/dryrun_multihost.py``).
    """
    flag = os.environ.get("PRIFIT_DISTRIBUTED", "").strip().lower()
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr and flag not in ("1", "true", "yes", "on"):
        return False
    kwargs = {}
    if addr:
        kwargs["coordinator_address"] = addr
        npro = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if npro is not None:
            kwargs["num_processes"] = int(npro)
        if pid is not None:
            kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    return True
