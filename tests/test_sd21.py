"""SD-2.1 model-family surface (beyond-reference; the reference resolves
SD-1.x repo ids only, ``generate_data.py:166-172``): v-prediction DDIM
threaded through the pipeline + the ``--model sd21`` CLI path. Real-geometry
conversion coverage lives in tests/test_weights_real.py (sd21 tests)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from distdiff_tpu.config import GuidanceConfig, PipelineConfig
from distdiff_tpu.models.guide import create_model
from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

CLASSES = ("alpha", "beta")


def _tiny_vpred_pipeline(prediction_type):
    import dataclasses

    cfg = dataclasses.replace(
        PipelineConfig.tiny(sample_size=32), prediction_type=prediction_type
    )
    guide = create_model("tiny_resnet", num_classes=2, input_size=32)
    rng = np.random.RandomState(0)
    gp = rng.randn(2, guide.feature_dim).astype(np.float32)
    lp = rng.randn(2, 2, guide.feature_dim).astype(np.float32)
    return ExpansionPipeline.create(
        cfg,
        sampler_cfg=SamplerConfig(guidance_scale=3.0),
        guidance_cfg=GuidanceConfig(
            guidance_step=4, guidance_period=2, K=2, guide_input_size=32,
        ),
        guide=guide, global_protos=gp, local_protos=lp, strength=0.5,
    )


def test_vpred_pipeline_runs_and_differs_from_epsilon():
    """prediction_type reaches the schedule: the SAME UNet outputs must
    produce different trajectories under epsilon vs v parameterization."""
    outs = {}
    for pt in ("epsilon", "v_prediction"):
        pipe = _tiny_vpred_pipeline(pt)
        assert pipe.sched.prediction_type == pt
        params = pipe.full_params()
        rng = np.random.RandomState(1)
        ls = pipe.config.latent_size
        lat = jnp.asarray(rng.randn(2, ls, ls, 4), jnp.float32)
        cond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
        uncond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        fn = jax.jit(pipe.make_expand_fn())
        img = fn(params, lat, cond, uncond, jnp.asarray([0, 1]), keys)
        img = np.asarray(img)
        assert np.isfinite(img).all()
        outs[pt] = img
        # deterministic per parameterization
        img2 = np.asarray(fn(params, lat, cond, uncond,
                             jnp.asarray([0, 1]), keys))
        np.testing.assert_array_equal(img, img2)
    assert np.abs(outs["epsilon"] - outs["v_prediction"]).max() > 1e-4


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    base = root / "medmnist" / "breastmnist"
    for ci, cat in enumerate(CLASSES):
        shade = 40 + 170 * ci
        for k in range(4):
            p = str(base / "train" / cat / f"img_{k}.png")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            Image.new("RGB", (20, 20), (shade, shade // 2, 10 + k)).save(p)
        p = str(base / "test" / cat / "t_0.png")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.new("RGB", (20, 20), (shade, shade // 2, 200)).save(p)
    return str(root)


def test_cli_generate_data_sd21_tiny(toy_root, tmp_path, monkeypatch):
    """generate_data --model sd21 --tiny: the v-prediction guided expansion
    end-to-end through the CLI, driver, and PNG contract."""
    from distdiff_tpu.cli import generate_data as cli_gen

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "out")
    stats = cli_gen.main([
        "-d", "breastmnist", "--data_root", toy_root, "--tiny",
        "--model", "sd21",
        "--guidance_type", "transform_guidance", "--guidance_step", "4",
        "--guidance_period", "2", "--K", "2",
        "--num_images_per_prompt", "1", "--train_batch_size", "1",
        "--max_units", "4", "--output_dir", out, "--seed", "0",
        "--resolution", "32",
    ])
    assert stats["written"] > 0
    written = []
    for cat in CLASSES:
        cdir = os.path.join(out, cat)
        if os.path.isdir(cdir):
            written += [f for f in os.listdir(cdir) if "_expand_" in f]
    assert written, "no sd21 expansion PNGs written"
