#!/usr/bin/env python
"""Entry point mirroring the reference's top-level `compare_directional_imputation.py`."""
from vae_los_angeles_tpu.evaluation.compare_directional_imputation import main

if __name__ == "__main__":
    main()
