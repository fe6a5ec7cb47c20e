"""Multi-host plumbing, tested single-process (SURVEY.md §2.8).

jax.distributed itself needs a cluster; what can and must be pinned here is
the host-shard math: every process computes the SAME shuffle and takes its
contiguous slice, the slices partition the global batch in process order,
and global_batch_from_local() over a (1-process) mesh reproduces the
unsharded batch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from irr_tpu.parallel.mesh import (make_mesh, local_shard_slice,
                                   global_batch_from_local)


def test_local_shard_slices_partition_batch():
    chunk = np.arange(12)
    parts = [local_shard_slice(chunk, i, 4) for i in range(4)]
    assert all(len(p) == 3 for p in parts)
    np.testing.assert_array_equal(np.concatenate(parts), chunk)


def test_loader_process_slices_reassemble(tmp_path):
    from tests.test_data import _make_chairs_occ
    from irr_tpu.data import DataLoader
    from irr_tpu.data.datasets import FlyingChairsOcc
    root = str(tmp_path)
    _make_chairs_occ(root, n=8)

    def loaders(pc):
        return [DataLoader(
            FlyingChairsOcc(root=root, dstype="full",
                            photometric_augmentations=True,
                            rng=np.random.RandomState(5)),
            batch_size=4, shuffle=True, seed=3,
            process_index=i, process_count=pc) for i in range(pc)]

    [full] = loaders(1)
    halves = loaders(2)
    full_batches = list(iter(full))
    shard_batches = [list(iter(l)) for l in halves]
    assert len(full_batches) == len(shard_batches[0]) == len(shard_batches[1])
    for fb, b0, b1 in zip(full_batches, *shard_batches):
        for k, v in fb.items():
            if isinstance(v, np.ndarray):
                np.testing.assert_array_equal(
                    np.concatenate([b0[k], b1[k]], axis=0), v, err_msg=k)


def test_global_batch_from_local_single_process():
    mesh = make_mesh(len(jax.devices()))
    batch = {"input1": np.random.RandomState(0).rand(
        len(jax.devices()) * 2, 4, 6, 3).astype(np.float32)}
    g = global_batch_from_local(batch, mesh)
    assert isinstance(g["input1"], jax.Array)
    assert g["input1"].shape == batch["input1"].shape
    np.testing.assert_array_equal(np.asarray(g["input1"]), batch["input1"])
