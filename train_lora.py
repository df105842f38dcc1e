#!/usr/bin/env python
"""Root entry point for LoRA fine-tuning of the diffusion UNet
(beyond-reference surface); delegates to distdiff_tpu.cli.train_lora."""

from distdiff_tpu.cli.train_lora import main

if __name__ == "__main__":
    main()
