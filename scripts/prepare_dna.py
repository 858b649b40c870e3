#!/usr/bin/env python
"""Entry point mirroring the reference's scripts/prepare_dna.py."""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vae_los_angeles_tpu.data.prepare_dna import main

if __name__ == "__main__":
    main()
