#!/usr/bin/env python
"""Top-level homography benchmark entry (reference-compatible flags)."""
from gims_tpu.cli.eval_homography_cli import main

if __name__ == "__main__":
    main()
