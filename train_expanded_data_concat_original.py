#!/usr/bin/env python
"""Drop-in entry point matching the reference's
``python train_expanded_data_concat_original.py`` invocation; delegates to
distdiff_tpu.cli.train_expanded."""

from distdiff_tpu.cli.train_expanded import main

if __name__ == "__main__":
    main()
