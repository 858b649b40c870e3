#!/usr/bin/env python
"""Entry point mirroring the reference's top-level `reconstruct_unmatched.py`."""
from vae_los_angeles_tpu.evaluation.reconstruct_unmatched import main

if __name__ == "__main__":
    main()
