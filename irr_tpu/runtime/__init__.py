"""Runtime: logging, meters, checkpointing, epoch loop."""

from .logbook import configure_logging, LoggingBlock, logbook
from .meters import MovingAverage, ExponentialMovingAverage
from .checkpoint import CheckpointSaver
from .loop import TrainingEpoch, EvaluationEpoch, exec_runtime
