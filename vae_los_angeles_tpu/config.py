"""Training and model configuration.

Defaults mirror the reference's static ``Config`` class (reference
``src/config.py:7-42``) exactly; unlike the reference this is a dataclass that
can be instantiated per-run, and every field supports an environment-variable
override (the reference only overrides DEVICE / INPUT_DIM_A / INPUT_DIM_B /
LATENT_DIM, reference ``train_rna2dna.py:166-174``).

Feature dims are configuration, not constants: the reference README documents
782/572 while the live config ships 1177/1211 (SURVEY.md integrity notes), so
nothing in this framework hard-codes them.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def _env(name: str, default, cast):
    raw = os.getenv(name)
    if raw is None:
        return default
    return cast(raw)


@dataclasses.dataclass
class Config:
    """Hyperparameters for model architecture, training and evaluation."""

    # Model architecture (reference src/config.py:11-13)
    input_dim_a: int = 1177  # RNA expression dimension
    input_dim_b: int = 1211  # DNA methylation dimension
    latent_dim: int = 20
    embed_dim: int = 32  # site-embedding width (reference encoders.py:51)

    # Training parameters (reference src/config.py:16-19)
    batch_size: int = 32
    num_epochs: int = 200
    learning_rate: float = 5e-4
    weight_decay: float = 1e-5

    # Loss parameters (reference src/config.py:22-24)
    beta_start: float = 1e-3  # KL weight after warmup
    beta_warmup_epochs: int = 50
    gamma: float = 1.0  # classification loss weight

    # Early stopping (reference src/config.py:27)
    patience: int = 15

    # LR scheduler: ReduceLROnPlateau semantics (reference src/config.py:30-31)
    lr_scheduler_factor: float = 0.5
    lr_scheduler_patience: int = 5

    # Paths (reference src/config.py:34-35)
    checkpoint_dir: str = "checkpoints"
    best_model_name: str = "best_multivae"
    data_dir: str = "data"
    plots_dir: str = "plots"

    # Data split (reference src/config.py:41-42)
    train_test_split: float = 0.2
    random_seed: int = 42

    # Regularisation inside encoders (reference encoders.py:16)
    dropout_rate: float = 0.1

    # TPU-specific knobs (no reference equivalent)
    use_pallas: bool = False  # fused Pallas inference kernels
    platform: Optional[str] = None  # force a jax platform ("cpu"/"tpu")
    # Mixed-precision policy for the XLA training/serving paths:
    # "float32" (default — bit-compatible with the reference's fp32 torch
    # recipe) or "bfloat16" (matmul operands cast to bf16 inside the loss —
    # native MXU rate — with fp32 accumulation, fp32 biases/BatchNorm/losses
    # and fp32 master params + optimizer state; see ops.nn.cast_matmul_params).
    compute_dtype: str = "float32"  # env override: COMPUTE_DTYPE=bfloat16
    # AdamW moment STORAGE dtype ("float32" default = torch-parity recipe;
    # "bfloat16" halves the m/v HBM sweep that dominates wide-regime step
    # time — updates still computed in fp32; see ops.optim.adamw_init).
    moments_dtype: str = "float32"  # env override: MOMENTS_DTYPE=bfloat16
    # Optimizer: "adamw" (default — torch-parity recipe) or "adafactor"
    # (factored second moments, no first moment: ~3x fewer optimizer bytes
    # swept per step — the wide-regime choice; ops.optim.adafactor_init,
    # parity-locked vs transformers.optimization.Adafactor).
    optimizer: str = "adamw"  # env override: OPTIMIZER=adafactor
    # Debug mode (SURVEY §5 sanitizer row): jax_debug_nans re-runs the
    # offending jitted program op-by-op and raises AT the first NaN-producing
    # primitive, instead of training silently to a NaN loss.
    debug_nans: bool = False  # env override: DEBUG_NANS=1

    @classmethod
    def from_env(cls, **overrides) -> "Config":
        """Build a config applying env-var overrides then keyword overrides.

        Env names match the reference's (INPUT_DIM_A, INPUT_DIM_B, LATENT_DIM,
        DEVICE) plus uppercase versions of every other field.
        """
        cfg = cls()
        field_casts = {
            f.name: (int if f.type == "int" else float if f.type == "float" else str)
            for f in dataclasses.fields(cls)
            if f.type in ("int", "float", "str")
        }
        values = {}
        for name, cast in field_casts.items():
            values[name] = _env(name.upper(), getattr(cfg, name), cast)
        for bool_field, env_name in (("use_pallas", "USE_PALLAS"),
                                     ("debug_nans", "DEBUG_NANS")):
            raw = os.getenv(env_name)
            if raw is not None:
                values[bool_field] = raw.lower() in ("1", "true", "yes")
        device = os.getenv("DEVICE")
        if device is not None:
            values["platform"] = device
        values.update(overrides)
        return cls(**values)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
