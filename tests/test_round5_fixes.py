"""Round-5 additions: --guidance_step_in_plan window shifting and the
bench clamp-label guard (ADVICE r4)."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from distdiff_tpu.sampling.pipeline import _clamp_window


def test_clamp_window_reference_parity_default():
    # full 50-step plan, strength .5: start 25 < g0 30 — window intact
    assert _clamp_window("transform_guidance", 25, 30, 32) == (True, 30, 32)
    # strength .3: start 35 > g0 — reference silently goes unguided
    guided, g0, g1 = _clamp_window("transform_guidance", 35, 30, 32)
    assert not guided
    # direct keeps the surviving sub-window when it overlaps
    assert _clamp_window("direct_guidance", 31, 30, 32) == (True, 31, 32)
    guided, _, _ = _clamp_window("direct_guidance", 35, 30, 32)
    assert not guided


def test_clamp_window_step_in_plan_shifts():
    # the beyond-reference mode shifts the window to the first executed step
    assert _clamp_window("transform_guidance", 35, 30, 32,
                         step_in_plan=True, n=50) == (True, 35, 37)
    assert _clamp_window("direct_guidance", 35, 30, 32,
                         step_in_plan=True, n=50) == (True, 35, 37)
    # near the end of the plan the shifted window still fits
    assert _clamp_window("transform_guidance", 49, 30, 32,
                         step_in_plan=True, n=50) == (True, 48, 50)
    # no-op when the window already survives
    assert _clamp_window("transform_guidance", 25, 30, 32,
                         step_in_plan=True, n=50) == (True, 30, 32)


def _short_plan_pipe(step_in_plan):
    from distdiff_tpu.config import GuidanceConfig, PipelineConfig
    from distdiff_tpu.models.guide import create_model
    from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

    rng = np.random.RandomState(0)
    config = PipelineConfig.tiny(sample_size=32)
    # 8-step plan, window counted 8-from-the-end starts at index 0 —
    # strength .5 starts at 4, so the default clamps the window out
    config = dataclasses.replace(config, num_inference_steps=8)
    guide = create_model("tiny_resnet", num_classes=4, input_size=32)
    return ExpansionPipeline.create(
        config,
        sampler_cfg=SamplerConfig(guidance_scale=3.0),
        guidance_cfg=GuidanceConfig(
            guidance_type="transform_guidance", guidance_step=8,
            guidance_period=2, K=2, guide_input_size=32,
            step_in_plan=step_in_plan,
        ),
        guide=guide,
        global_protos=rng.randn(4, guide.feature_dim).astype(np.float32),
        local_protos=rng.randn(4, 2, guide.feature_dim).astype(np.float32),
    )


def test_t5_checkpoint_rejected_loudly(tmp_path):
    """The reference resolves CLIPTextModel vs T5EncoderModel from the
    checkpoint config (generate_data.py:140-161); the T5/DeepFloyd branch
    is a documented scope exclusion — the converter must refuse it with a
    clear error instead of mis-converting T5 weights as CLIP."""
    import json

    from distdiff_tpu.weights.convert import convert_sd_checkpoint

    te = tmp_path / "ckpt" / "text_encoder"
    te.mkdir(parents=True)
    (te / "config.json").write_text(
        json.dumps({"architectures": ["T5EncoderModel"]}))
    with pytest.raises(NotImplementedError, match="T5 text encoder"):
        convert_sd_checkpoint(str(tmp_path / "ckpt"))


def test_guidance_active_respects_step_in_plan():
    assert not _short_plan_pipe(False).guidance_active()
    assert _short_plan_pipe(True).guidance_active()


def test_split_expand_guided_with_shifted_window():
    pipe = _short_plan_pipe(True)
    se = pipe.make_split_expand()
    assert se.guided
    assert se.g0 >= se.start and se.g1 - se.g0 == 2
    rng = np.random.RandomState(0)
    b = 2
    ls = pipe.config.latent_size
    out = se(
        pipe.full_params(),
        np.asarray(rng.randn(b, ls, ls, 4), np.float32) * 0.2,
        np.asarray(rng.randn(b, 8, 32), np.float32),
        np.asarray(rng.randn(b, 8, 32), np.float32),
        np.arange(b, dtype=np.int32) % 4,
        np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(b)]),
    )
    assert out.shape == (b, pipe.config.sample_size,
                         pipe.config.sample_size, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_lora_bench_script_runs_tiny(capsys):
    """The LoRA throughput probe must keep importing the real APIs
    (it shipped once with a dead import — VERDICT r4 #7)."""
    import runpy
    import sys

    argv = sys.argv
    sys.argv = ["lora_bench", "--tiny", "--batches", "2", "--iters", "1"]
    try:
        runpy.run_path("scripts/lora_bench.py", run_name="__main__")
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "img/s" in out
