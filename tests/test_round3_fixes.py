"""Round-3 advisor/verdict fixes:

  * SDXL VAE scaling factor (0.13025, not SD-1.x's 0.18215)
  * --do_classifier_free_guidance parses true/false properly (the reference
    declares it ``type=bool`` so 'False' is truthy — generate_data.py:452-457;
    deliberate deviation, see PARITY.md)
  * strict tokenizer when building a zero-shot head from REAL text weights
  * ImageNet/ImageNet-R/Country211 classname + synset tables
  * LoggerMonitor / plot_overlap multi-log plotting
"""

from __future__ import annotations

import os

import numpy as np
import pytest


# ------------------------------------------------------------- SDXL VAE scale

def test_sdxl_vae_scaling_factor():
    from distdiff_tpu.config import PipelineConfig, VAEConfig

    assert PipelineConfig.sdxl_base().vae.scaling_factor == pytest.approx(0.13025)
    assert VAEConfig.sd15().scaling_factor == pytest.approx(0.18215)


def test_sdxl_pipeline_uses_sdxl_scale():
    """The decode path must divide by the SDXL scale, not the SD-1.x one."""
    from distdiff_tpu.config import PipelineConfig

    cfg = PipelineConfig.sdxl_base()
    assert cfg.vae.scaling_factor == pytest.approx(0.13025)
    # tiny SDXL keeps the test default; only the real geometry is pinned
    assert PipelineConfig.sdxl_tiny().unet.addition_embed_dim is not None


# ------------------------------------------------------------------- CFG flag

@pytest.mark.parametrize("val,expect", [
    ("True", True), ("true", True), ("1", True), ("yes", True),
    ("False", False), ("false", False), ("0", False), ("no", False),
])
def test_cfg_flag_parses_booleans(val, expect):
    from distdiff_tpu.cli.generate_data import parse_args

    args = parse_args(["--output_dir", "/tmp/x",
                       "--do_classifier_free_guidance", val])
    assert args.do_classifier_free_guidance is expect


def test_cfg_flag_default_and_bare():
    from distdiff_tpu.cli.generate_data import parse_args

    assert parse_args(["--output_dir", "/tmp/x"]).do_classifier_free_guidance is True
    args = parse_args(["--output_dir", "/tmp/x", "--do_classifier_free_guidance"])
    assert args.do_classifier_free_guidance is True


def test_cfg_flag_rejects_garbage():
    from distdiff_tpu.cli.generate_data import parse_args

    with pytest.raises(SystemExit):
        parse_args(["--output_dir", "/tmp/x",
                    "--do_classifier_free_guidance", "maybe"])


# ------------------------------------------------------ strict zero-shot head

def test_zero_shot_head_strict_with_real_tower(monkeypatch, tmp_path):
    """Real text variables + no merges file anywhere -> hard failure, not a
    silent hash-tokenizer head (ADVICE r2 medium #2)."""
    import jax
    import jax.numpy as jnp

    from distdiff_tpu.config import TextEncoderConfig
    from distdiff_tpu.models.guide.factory import build_zero_shot_text_features
    from distdiff_tpu.models.text_encoder import CLIPTextEncoder

    monkeypatch.delenv("DISTDIFF_CLIP_BPE", raising=False)
    cfg = TextEncoderConfig(
        vocab_size=512, hidden_size=16, num_layers=1, num_heads=2,
        max_length=8, embed_dim=16, dtype=jnp.float32,
    )
    te = CLIPTextEncoder(cfg)
    variables = te.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    with pytest.raises(RuntimeError, match="BPE"):
        build_zero_shot_text_features(["cat", "dog"], config=cfg,
                                      variables=variables)
    # random-head path (variables=None) still works without a merges file
    feats = build_zero_shot_text_features(["cat", "dog"], config=cfg)
    assert feats.shape == (2, 16)


# ------------------------------------------------------------ classname tables

def test_imagenet_tables_consistent():
    from distdiff_tpu.utils.classnames import (
        CLASS_TO_SYNSET,
        IMAGENET_CLASSES,
        SYNSET_TO_CLASS,
        imagenet_class_to_synset,
        imagenet_synset_to_class,
    )

    assert len(IMAGENET_CLASSES) == 1000
    assert len(set(IMAGENET_CLASSES)) == 1000
    assert len(CLASS_TO_SYNSET) == len(SYNSET_TO_CLASS) == 1000
    # bijection: the two maps are exact inverses
    for name in IMAGENET_CLASSES:
        wnid = imagenet_class_to_synset(name)
        assert wnid.startswith("n") and len(wnid) == 9
        assert imagenet_synset_to_class(wnid) == name
    # spot-check well-known anchors (index order = class index)
    assert IMAGENET_CLASSES[0] == "tench"
    assert imagenet_class_to_synset("tench") == "n01440764"
    assert IMAGENET_CLASSES[1] == "goldfish"


def test_imagenet_r_and_country211():
    from distdiff_tpu.utils.classnames import (
        COUNTRY211_CLASSES,
        IMAGENET_R_CLASSES,
        get_num_classes,
    )

    assert len(IMAGENET_R_CLASSES) == 200
    assert len(COUNTRY211_CLASSES) == 211
    assert get_num_classes("imagenet") == 1000
    assert get_num_classes("imagenet-r") == 200
    assert get_num_classes("country211") == 211


# ---------------------------------------------------------------- LoggerMonitor

def test_logger_monitor_plots_multiple_logs(tmp_path):
    from distdiff_tpu.utils.logger import Logger, LoggerMonitor, plot_overlap

    paths = {}
    for run in ("a", "b"):
        p = os.path.join(tmp_path, f"log_{run}.txt")
        with Logger(p, title=run) as lg:
            lg.set_names(["loss", "acc"])
            for i in range(4):
                lg.append([1.0 / (i + 1), 10.0 * i])
        paths[run] = p

    mon = LoggerMonitor(paths)
    assert len(mon.loggers) == 2
    assert mon.loggers[0].numbers["loss"] == pytest.approx(
        [1.0, 0.5, 1 / 3, 0.25])
    out = os.path.join(tmp_path, "overlap.png")
    mon.savefig(out, names=["loss"])
    assert os.path.getsize(out) > 0

    # plot_overlap returns legend labels for the current figure
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    labels = plot_overlap(mon.loggers[0], ["acc"])
    plt.close("all")
    assert labels == ["a(acc)"]
