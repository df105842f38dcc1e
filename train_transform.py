#!/usr/bin/env python
"""Drop-in entry point matching the reference's ``python train_transform.py``
invocation; delegates to distdiff_tpu.cli.train_transform."""

from distdiff_tpu.cli.train_transform import main

if __name__ == "__main__":
    main()
