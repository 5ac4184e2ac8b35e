#!/usr/bin/env python
"""Pipeline entry point — see warpedganspace_tpu/cli/train.py."""
from warpedganspace_tpu.cli.train import main

if __name__ == "__main__":
    main()
