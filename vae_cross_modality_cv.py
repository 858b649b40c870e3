#!/usr/bin/env python
"""Entry point mirroring the reference's top-level `vae_cross_modality_cv.py`."""
from vae_los_angeles_tpu.evaluation.cross_modality_cv import main

if __name__ == "__main__":
    main()
