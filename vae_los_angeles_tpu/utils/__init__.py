"""Shared utilities: profiling/timing, plotting."""

from vae_los_angeles_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    bench_line,
    block_until_ready,
    device_timer,
)
