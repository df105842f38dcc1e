#!/usr/bin/env python
"""Drop-in entry point matching the reference's ``python train.py``
invocation; delegates to distdiff_tpu.cli.train."""

from distdiff_tpu.cli.train import main

if __name__ == "__main__":
    main()
