#!/usr/bin/env python
"""Top-level pair-generation entry (reference-compatible behavior)."""
from gims_tpu.cli.generate_pairs_cli import main

if __name__ == "__main__":
    main()
