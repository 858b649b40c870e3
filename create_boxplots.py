#!/usr/bin/env python
"""Entry point mirroring the reference's top-level `create_boxplots.py`."""
from vae_los_angeles_tpu.evaluation.create_boxplots import main

if __name__ == "__main__":
    main()
