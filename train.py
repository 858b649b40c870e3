#!/usr/bin/env python
"""Train the tri-modal MultiModalVAE.

This entry point is referenced by the upstream README/run_pipeline.sh but
missing from the reference repo (SURVEY integrity notes); behavior is
reconstructed from optimize_hyperparameters.py:157-211.
"""
from vae_los_angeles_tpu.training.cli import main_multimodal

if __name__ == "__main__":
    main_multimodal()
