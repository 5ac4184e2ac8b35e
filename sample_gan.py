#!/usr/bin/env python
"""Pipeline entry point — see warpedganspace_tpu/cli/sample_gan.py."""
from warpedganspace_tpu.cli.sample_gan import main

if __name__ == "__main__":
    main()
