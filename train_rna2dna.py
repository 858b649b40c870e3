#!/usr/bin/env python
"""Train the RNA→DNA directional VAE (reference train_rna2dna.py, TPU-native)."""
from vae_los_angeles_tpu.training.cli import main_rna2dna

if __name__ == "__main__":
    main_rna2dna()
