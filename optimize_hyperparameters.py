#!/usr/bin/env python
"""Entry point mirroring the reference's top-level `optimize_hyperparameters.py`."""
from vae_los_angeles_tpu.evaluation.hpo import main

if __name__ == "__main__":
    main()
