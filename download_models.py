#!/usr/bin/env python
"""Pipeline entry point — see warpedganspace_tpu/cli/download_models.py."""
from warpedganspace_tpu.cli.download_models import main

if __name__ == "__main__":
    main()
