"""CLI entry point: ``python -m fwumious_wabbit_tpu <flags>``."""

import sys

from .train.loop import main

if __name__ == "__main__":
    sys.exit(main())
