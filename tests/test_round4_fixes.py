"""Round-4 regression tests.

- ``--steps`` must reach the pipeline config in EVERY model branch,
  including ``--tiny`` (the tiny branch silently ignored it, so a
  low-strength quality run could never keep the guidance window inside
  the executed span — guided output bit-equal to unguided).
- ``restore_variables`` accepts a trainer checkpoint (``model_best``)
  as a guide ``--encoder_weight_path``.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _build(argv):
    from distdiff_tpu.cli.generate_data import build_pipeline, parse_args

    return build_pipeline(parse_args(argv))


BASE = ["-d", "breastmnist", "--output_dir", "/tmp/unused"]


def test_steps_flag_reaches_tiny_config():
    pipe = _build(BASE + ["--tiny", "--steps", "20"])
    assert pipe.config.num_inference_steps == 20


def test_steps_default_keeps_config_plan():
    pipe = _build(BASE + ["--tiny"])
    assert pipe.config.num_inference_steps == 10  # tiny default plan


def test_steps_flag_reaches_sd15_config():
    pipe = _build(BASE + ["--tiny", "--steps", "20"])  # warm import path
    from distdiff_tpu.cli.generate_data import parse_args

    args = parse_args(BASE + ["--steps", "30"])
    assert args.steps == 30
    # full sd15 build is too heavy for CI; the config logic is shared and
    # covered by the tiny branches above plus this parse check
    del pipe


def test_restore_variables_accepts_trainer_checkpoint(tmp_path):
    from distdiff_tpu.utils import checkpoints as ckpt

    variables = {
        "params": {"w": np.arange(6.0, dtype=np.float32).reshape(2, 3)},
        "batch_stats": {"m": np.zeros(3, np.float32)},
    }
    state = {
        "params": {"w": variables["params"]["w"] + 1},
        "batch_stats": {"m": variables["batch_stats"]["m"] + 2},
        "opt_state": {"mu": np.full((2, 3), 7.0, np.float32)},
        "step": np.int32(5),
    }
    out = tmp_path / "run"
    ckpt.save_train_checkpoint(str(out), state, epoch=1, best_acc=50.0,
                               is_best=True)
    restored = ckpt.restore_variables(str(out / "model_best"), variables)
    assert set(restored) == {"params", "batch_stats"}
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  state["params"]["w"])
    np.testing.assert_array_equal(np.asarray(restored["batch_stats"]["m"]),
                                  state["batch_stats"]["m"])

    # bare variables checkpoints still restore (the original layout)
    bare = tmp_path / "bare"
    ckpt.save_pytree(str(bare), variables)
    r2 = ckpt.restore_variables(str(bare), variables)
    np.testing.assert_array_equal(np.asarray(r2["params"]["w"]),
                                  variables["params"]["w"])


def test_restore_pytree_numpy_fallback(tmp_path):
    """Cross-backend restore path: a checkpoint saved under one backend
    (e.g. the axon TPU) fails orbax's default sharded restore on another;
    ``_restore_as_numpy`` must reproduce the tree as host numpy, both with
    and without a template (no-template goes through StepMetadata)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from distdiff_tpu.utils import checkpoints as ckpt

    tree = {
        "a": jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4),
        "nested": {"b": jnp.ones((2,), jnp.int32)},
    }
    path = str(tmp_path / "xbackend")
    ckpt.save_pytree(path, tree)

    with ocp.PyTreeCheckpointer() as c:
        no_tpl = ckpt._restore_as_numpy(c, path, None)
        with_tpl = ckpt._restore_as_numpy(
            c, path, jax.tree.map(np.asarray, tree))
    for restored in (no_tpl, with_tpl):
        assert isinstance(restored["a"], np.ndarray)
        np.testing.assert_array_equal(restored["a"], np.asarray(tree["a"]))
        np.testing.assert_array_equal(restored["nested"]["b"],
                                      np.asarray(tree["nested"]["b"]))

def test_restore_variables_missing_collection_raises(tmp_path):
    """A checkpoint lacking a template collection must fail with a clear
    error naming the collection, not a bare KeyError."""
    from distdiff_tpu.utils import checkpoints as ckpt

    bare = tmp_path / "params_only"
    ckpt.save_pytree(str(bare), {"params": {"w": np.ones(4, np.float32)}})
    template = {"params": {"w": np.zeros(4, np.float32)},
                "batch_stats": {"m": np.zeros(2, np.float32)}}
    with pytest.raises(ValueError, match="batch_stats"):
        ckpt.restore_variables(str(bare), template)


def test_quality_loop_rejects_pretrain_stages_without_tiny(tmp_path):
    """--train_vae/--train_unet pretrain TINY geometry; combined with
    --no-tiny their --params_path would silently shadow --sd_checkpoint."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "quality_loop.py")
    spec = importlib.util.spec_from_file_location("quality_loop_g", path)
    ql = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ql)
    with pytest.raises(SystemExit, match="TINY"):
        ql.main(["--workdir", str(tmp_path / "ql"), "--no-tiny",
                 "--train_unet"])


def test_generator_probe_handles_matching_class_names(tmp_path):
    """probe() on numpy per-class stats: an exact train/gen class-name
    match must not trip ndarray truthiness (`x or y`)."""
    import importlib.util
    import os

    from PIL import Image

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "generator_probe.py")
    spec = importlib.util.spec_from_file_location("generator_probe", path)
    gp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gp)

    rng = np.random.RandomState(0)
    for root in ("train", "gen"):
        for cls in ("class_00", "class 01"):
            d = tmp_path / root / (cls if root == "train"
                                   else cls.replace(" ", "_"))
            d.mkdir(parents=True, exist_ok=True)
            for i in range(2):
                Image.fromarray(
                    rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
                        d / f"img_{i}.png")
    row = gp.probe(str(tmp_path / "train"), str(tmp_path / "gen"))
    assert np.isfinite(row["color_bias"])
    assert np.isfinite(row["diversity"])


def test_guidance_active_reports_window_clamp():
    """pipeline.guidance_active(): honest labeling of silently-unguided
    runs (the reference clamps the guidance window to the img2img start
    and says nothing — generate_data.py:1190-1215; bench.py now tags the
    metric when that happens)."""
    from distdiff_tpu.config import GuidanceConfig, PipelineConfig
    from distdiff_tpu.models.guide import create_model
    from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

    guide = create_model("tiny_resnet", num_classes=3, input_size=32,
                         lazy_init=True)
    rng = np.random.RandomState(0)
    gp = rng.randn(3, guide.feature_dim).astype(np.float32)
    lp = rng.randn(3, 2, guide.feature_dim).astype(np.float32)

    def make(gtype, strength):
        return ExpansionPipeline.create(
            PipelineConfig.tiny(sample_size=32),
            sampler_cfg=SamplerConfig(guidance_scale=3.0),
            guidance_cfg=GuidanceConfig(
                guidance_type=gtype, guidance_step=4, guidance_period=2,
                K=2, guide_input_size=32),
            guide=guide, global_protos=gp, local_protos=lp,
            strength=strength, lazy_params=True,
        )

    # tiny plan: 10 steps, window [6, 8). strength 0.5 -> start 5: active.
    assert make("transform_guidance", 0.5).guidance_active()
    assert make("direct_guidance", 0.5).guidance_active()
    # strength 0.3 -> start 7 > g0=6: transform's single trigger is
    # skipped (unguided); direct still runs the surviving [7, 8) step.
    assert not make("transform_guidance", 0.3).guidance_active()
    assert make("direct_guidance", 0.3).guidance_active()
    # no-guidance type never counts as active
    assert not make("none", 0.5).guidance_active()
    # text_to_img starts at 0: never clamped
    assert make("transform_guidance", 0.3).guidance_active(text_to_img=True)
