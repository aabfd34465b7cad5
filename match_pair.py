#!/usr/bin/env python
"""Match two images end to end (minimum slice CLI)."""
from gims_tpu.cli.match_pair_cli import main

if __name__ == "__main__":
    main()
