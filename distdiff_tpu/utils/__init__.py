from distdiff_tpu.utils import classnames, profiling, prompts, visualize
from distdiff_tpu.utils.logger import Logger
from distdiff_tpu.utils.meters import AverageMeter, Stopwatch
from distdiff_tpu.utils.metrics import accuracy

__all__ = [
    "Logger",
    "AverageMeter",
    "Stopwatch",
    "accuracy",
    "classnames",
    "profiling",
    "prompts",
    "visualize",
]
