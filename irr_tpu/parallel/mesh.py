"""Mesh construction and sharding helpers."""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(batch, mesh: Mesh):
    """Shard every leaf's leading (batch) axis across the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh.

    Works across processes: with a multi-host mesh, each process fills its
    addressable replicas from its (identical, same-seed) host copy.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def rep(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding,
                                                lambda idx: x[idx])
        return jax.tree_util.tree_map(rep, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Multi-host (DCN): one process per host, one global mesh over all devices
# (SURVEY.md §2.8 rebuild note).
# ---------------------------------------------------------------------------

def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Connect this process to the global JAX runtime.

    With no arguments the cluster is auto-detected (TPU pod metadata /
    JAX_COORDINATOR_ADDRESS). Returns (process_index, process_count).
    After this, jax.devices() spans ALL hosts and make_mesh() builds the
    global data mesh.
    """
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def local_shard_slice(chunk, process_index: int, process_count: int):
    """The contiguous slice of a global index batch this process loads.

    The global batch is the concatenation of the process slices in process
    order, matching the device order of make_mesh's 1-D mesh, so
    global_batch_from_local() reassembles exactly the single-process batch.
    """
    n = len(chunk)
    per = n // process_count
    assert per * process_count == n, \
        f"global batch {n} not divisible by {process_count} processes"
    return chunk[process_index * per:(process_index + 1) * per]


def global_batch_from_local(batch, mesh: Mesh):
    """Per-process host-local batch shard -> global sharded jax.Array
    (leading axis on the data mesh axis)."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding,
                                                         np.asarray(x)),
        batch)
