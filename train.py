#!/usr/bin/env python
"""Top-level training entry (reference-compatible: `python train.py --flags`)."""
from gims_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
