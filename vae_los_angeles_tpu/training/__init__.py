"""Training layer: fused fit engine, task registry, checkpointing, CLIs."""

from vae_los_angeles_tpu.training.engine import FitResult, fit, hyperparams, predict  # noqa: F401
from vae_los_angeles_tpu.training.tasks import TASKS, Task  # noqa: F401

__all__ = ["FitResult", "TASKS", "Task", "fit", "hyperparams", "predict"]
