"""Training: optimizer/schedule, the AVSR task (losses + decode + metrics),
and the SPMD train loop with checkpointing and early stopping."""

from mocov2_whisper_flamingo_tpu.training.optim import (  # noqa: F401
    one_cycle_lr,
    make_optimizer,
)
from mocov2_whisper_flamingo_tpu.training.task import AVSRTask  # noqa: F401
from mocov2_whisper_flamingo_tpu.training.trainer import Trainer  # noqa: F401
