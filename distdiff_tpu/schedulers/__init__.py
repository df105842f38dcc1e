from distdiff_tpu.schedulers.ddim import (
    DDIMSchedule,
    add_noise,
    ddim_step,
    guidance_window,
    img2img_start_index,
    make_schedule,
)

__all__ = [
    "DDIMSchedule",
    "make_schedule",
    "ddim_step",
    "add_noise",
    "img2img_start_index",
    "guidance_window",
]
