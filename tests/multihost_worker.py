"""Worker process for the REAL two-process multi-host test
(tests/test_multihost.py::test_two_process_train_step_matches_single_process).

Each worker is one "host" of a 2-process jax.distributed cluster over CPU
devices (4 local devices per process, 8 global — the same global mesh the
single-process suite simulates). It exercises the ACTUAL multi-host code
path of the framework (main.py:38-47 / parallel/mesh.py):

  jax.distributed.initialize -> make_mesh over ALL global devices ->
  DataLoader(process_index, process_count) host-shard slicing ->
  global_batch_from_local -> replicate (multi-process branch) ->
  make_train_step over the global mesh -> one real step.

It writes its results (loss scalars, updated params, the indices its
loader shard fed) to an npz; the parent test asserts both processes agree
bit-for-bit with each other and match the single-process 8-device run.

Invoked as:
  python tests/multihost_worker.py <process_id> <port> <outdir> <data_root>
"""

import os
import sys


def run(process_id: int, port: str, outdir: str, data_root: str):
    import jax

    # Belt and braces vs the host's axon sitecustomize: force CPU through
    # the config API (the parent also strips PYTHONPATH down to the repo).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=process_id)
    # share the suite's persistent compile cache (single-core host)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    import numpy as np
    from irr_tpu import models, losses, optim
    from irr_tpu.data import DataLoader
    from irr_tpu.data.datasets import FlyingChairsOccFull
    from irr_tpu.parallel import make_mesh, make_train_step, replicate
    from irr_tpu.parallel.mesh import global_batch_from_local
    from irr_tpu.parallel.train import TrainState

    # --- the loader's host-shard contract: GLOBAL batch_size, each process
    # loads its contiguous slice of every (identically shuffled) batch.
    dataset = FlyingChairsOccFull(root=data_root,
                                  photometric_augmentations=False)
    loader = DataLoader(dataset, batch_size=8, shuffle=True, seed=7,
                        num_workers=1, drop_last=True,
                        process_index=process_id, process_count=2)
    local_batches = list(iter(loader))
    fed_indices = np.concatenate([b["index"] for b in local_batches])

    # --- one real sharded train step over the GLOBAL mesh.
    mesh = make_mesh()  # all 8 global devices
    model = models.FlowNet1S()
    loss_fn = losses.MultiScaleEPE_FlowNet(batch_size=8, div_flow=0.05)
    optimizer = optim.Adam(lr=1e-4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    state = replicate(TrainState(params, optimizer.init(params)), mesh)
    step = make_train_step(model, loss_fn, optimizer, mesh=mesh,
                           donate=False)

    batch = {k: v for k, v in local_batches[0].items()
             if isinstance(v, np.ndarray) and v.dtype != np.int32}
    gbatch = global_batch_from_local(batch, mesh)

    # Pre-sync through the COORDINATION service (gRPC, long timeout)
    # before the first gloo collective: gloo's context init gives the
    # peer only ~30 s to show up at the rendezvous, and on this 1-core
    # host import/compile skew between the two workers can exceed that
    # under load (measured: DEADLINE_EXCEEDED GetKeyValue flakes when
    # the suite runs alongside another heavy job). The barrier aligns
    # both processes to within milliseconds at the collective.
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier(
        "irr_tpu_multihost_presync", timeout_in_ms=600_000)

    state1, loss_dict = step(state, gbatch)

    # Updated params/losses are fully replicated -> every process holds the
    # complete value and can fetch it host-side.
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state1.params)]
    np.savez(os.path.join(outdir, f"proc{process_id}.npz"),
             total_loss=float(loss_dict["total_loss"]),
             fed_indices=fed_indices,
             n_leaves=len(leaves),
             **{f"leaf{i}": l for i, l in enumerate(leaves)})
    print(f"worker {process_id}: OK total_loss="
          f"{float(loss_dict['total_loss']):.6f}", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4])
