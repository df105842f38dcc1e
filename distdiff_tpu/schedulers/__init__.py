from distdiff_tpu.schedulers.ddim import (
    DDIMSchedule,
    add_noise,
    ddim_step,
    guidance_window,
    img2img_start_index,
    make_schedule,
)
from distdiff_tpu.schedulers.dpm import (
    DPMSchedule,
    denoise_range_dpm,
    dpm_step,
    make_dpm_schedule,
)


def build_schedule(scheduler: str = "ddim", num_inference_steps: int = 50,
                   **kwargs):
    """Scheduler factory: ``"ddim"`` (the reference's sampler) or
    ``"dpmpp"`` (DPM-Solver++(2M), beyond-reference). Both share the same
    beta/timestep discretization, so strength indexing and the guidance
    window are scheduler-independent."""
    if scheduler == "ddim":
        return make_schedule(num_inference_steps, **kwargs)
    if scheduler in ("dpmpp", "dpmsolver++", "dpm++2m"):
        return make_dpm_schedule(num_inference_steps, **kwargs)
    raise ValueError(f"unknown scheduler: {scheduler!r} "
                     "(expected 'ddim' or 'dpmpp')")


__all__ = [
    "DDIMSchedule",
    "DPMSchedule",
    "build_schedule",
    "make_schedule",
    "make_dpm_schedule",
    "ddim_step",
    "dpm_step",
    "denoise_range_dpm",
    "add_noise",
    "img2img_start_index",
    "guidance_window",
]
