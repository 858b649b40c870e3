#!/usr/bin/env python
"""Entry point mirroring the reference's top-level `evaluate.py`."""
from vae_los_angeles_tpu.evaluation.evaluate import main

if __name__ == "__main__":
    main()
