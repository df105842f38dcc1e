#!/usr/bin/env python
"""Drop-in entry point matching the reference's ``python generate_data.py``
invocation; delegates to distdiff_tpu.cli.generate_data."""

from distdiff_tpu.cli.generate_data import main

if __name__ == "__main__":
    main()
