#!/usr/bin/env python
"""Pipeline entry point — see warpedganspace_tpu/cli/traverse_attribute_space.py."""
from warpedganspace_tpu.cli.traverse_attribute_space import main

if __name__ == "__main__":
    main()
