#!/usr/bin/env python
"""Top-level match-count eval entry (reference-compatible behavior)."""
from gims_tpu.cli.eval_matches_cli import main

if __name__ == "__main__":
    main()
