#!/usr/bin/env python
"""Pipeline entry point — see warpedganspace_tpu/cli/checkpoint2model.py."""
from warpedganspace_tpu.cli.checkpoint2model import main

if __name__ == "__main__":
    main()
