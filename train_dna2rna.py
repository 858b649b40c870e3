#!/usr/bin/env python
"""Train the DNA→RNA directional VAE (reference train_dna2rna.py, TPU-native)."""
from vae_los_angeles_tpu.training.cli import main_dna2rna

if __name__ == "__main__":
    main_dna2rna()
