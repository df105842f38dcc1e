#!/usr/bin/env python
"""Drop-in entry point matching the reference's ``python parse_logs.py``
invocation; delegates to distdiff_tpu.cli.parse_logs."""

from distdiff_tpu.cli.parse_logs import main

if __name__ == "__main__":
    main()
