#!/usr/bin/env python
"""Entry point mirroring the reference's `src/knn_comparison/run_comparison.py`."""
from vae_los_angeles_tpu.evaluation.knn_comparison import main

if __name__ == "__main__":
    main()
