#!/usr/bin/env python
"""Entry point mirroring the reference's top-level `downstream_task.py`."""
from vae_los_angeles_tpu.evaluation.downstream import main

if __name__ == "__main__":
    main()
