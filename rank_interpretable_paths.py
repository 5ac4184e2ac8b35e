#!/usr/bin/env python
"""Pipeline entry point — see warpedganspace_tpu/cli/rank_interpretable_paths.py."""
from warpedganspace_tpu.cli.rank_interpretable_paths import main

if __name__ == "__main__":
    main()
