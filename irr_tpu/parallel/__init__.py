"""SPMD parallelism: device mesh, sharded train step.

The reference has no active distributed runtime (SURVEY.md §2.8 — its
DataParallel wrap is commented out). Here data parallelism is first-class:
a 1-D `data` mesh axis, batch sharded across it, parameters replicated, and
XLA inserts the gradient all-reduce over ICI. Multi-host (DCN) enters via
`jax.distributed.initialize` + the same global mesh.
"""

from .mesh import make_mesh, shard_batch, replicate
from .train import make_train_step, make_eval_step, TrainState
