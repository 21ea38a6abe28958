#!/usr/bin/env python3
"""The canonical experiment driver — same CLI as the reference's
``examples/05_advanced_run.py``. Thin wrapper over
``cavmd_tpu.drivers.advanced_run`` (see that module for the workflow)."""

import sys

from cavmd_tpu.drivers.advanced_run import main

if __name__ == "__main__":
    sys.exit(main())
