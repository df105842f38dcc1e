"""Trainer: data-parallel train step learns a separable toy problem; loops
write the reference's log.txt / results.yaml / checkpoint artifacts."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from distdiff_tpu.data.datasets import ArrayDataset, BatchLoader
from distdiff_tpu.data.transforms import Compose, ToArray
from distdiff_tpu.models.guide.resnet import ResNet, tiny_resnet_config
from distdiff_tpu.train import (
    TrainConfig,
    create_train_state,
    fit,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def _toy_data(n=64, size=16):
    """Two classes separable by mean brightness."""
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 2, n)
    images = np.where(
        labels[:, None, None, None] == 1,
        rng.rand(n, size, size, 3) * 0.5 + 0.5,
        rng.rand(n, size, size, 3) * 0.5,
    ).astype(np.float32)
    return (images * 255).astype(np.uint8), labels


def test_train_step_learns_and_artifacts(tmp_path):
    images, labels = _toy_data()
    ds = ArrayDataset(images, labels, Compose([ToArray()]))
    train_loader = BatchLoader(ds, batch_size=16, shuffle=True, seed=0)
    test_loader = BatchLoader(ds, batch_size=16)

    module = ResNet(tiny_resnet_config(num_classes=2))
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )
    cfg = TrainConfig(lr=0.05, epochs=3, weight_decay=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=len(train_loader))
    state = create_train_state(module, variables, tx)
    train_step = make_train_step(module, tx)
    eval_step = make_eval_step(module)

    ckpt_dir = str(tmp_path / "checkpoint" / "seed0")
    result = fit(
        train_step, eval_step, state, train_loader, test_loader, cfg,
        ckpt_dir, lr_at_epoch=lambda e: cfg.lr, log_stdout=False,
    )
    assert result["best_accuracy"] > 75.0, result

    # reference on-disk artifacts
    assert os.path.exists(os.path.join(ckpt_dir, "log.txt"))
    with open(os.path.join(ckpt_dir, "log.txt")) as f:
        header = f.readline().rstrip().split("\t")
        assert header == [
            "Learning Rate", "Train Loss", "Valid Loss", "Train Acc.", "Valid Acc.",
        ]
        assert len(f.readlines()) == 3  # one row per epoch
    with open(os.path.join(ckpt_dir, "results.yaml")) as f:
        saved = yaml.safe_load(f)
    assert saved["best_accuracy"] == result["best_accuracy"]
    assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint"))
    assert os.path.isdir(os.path.join(ckpt_dir, "model_best"))


def test_augmentations_shapes():
    from distdiff_tpu.train.augment import (
        GridMask,
        cutmix_data,
        jsd_consistency_loss,
        mixup_data,
        soft_target_cross_entropy,
    )

    rng = np.random.default_rng(0)
    images = rng.random((8, 16, 16, 3)).astype(np.float32)
    targets = rng.integers(0, 3, 8)

    mixed, ta, tb, lam = mixup_data(images, targets, 1.0, rng)
    assert mixed.shape == images.shape and 0.0 <= lam <= 1.0

    mixed, ta, tb, lam = cutmix_data(images, targets, 1.0, rng)
    assert mixed.shape == images.shape and 0.0 <= lam <= 1.0
    logits = jnp.asarray(rng.random((8, 3)), jnp.float32)
    mask = jnp.ones(8)
    loss = soft_target_cross_entropy(logits, ta, tb, lam, mask)
    assert np.isfinite(float(loss))

    gm = GridMask(d1=4, d2=8, prob=1.0)
    gm.set_prob(10, 10)
    masked = gm(images, rng)
    assert masked.shape == images.shape
    assert (masked == 0).sum() > 0  # some pixels occluded

    j = jsd_consistency_loss(logits, logits, logits, mask)
    assert abs(float(j)) < 1e-5  # identical views -> zero divergence


def test_augmix_dataset_and_pil_ops(tmp_path):
    from PIL import Image

    from distdiff_tpu.train.augment import AUGMENTATIONS_ALL, AugMixDataset
    from distdiff_tpu.train.augment.pil_ops import Cutout, RandAugment

    img = Image.new("RGB", (24, 24), (128, 64, 32))
    for op in AUGMENTATIONS_ALL:
        out = op(img, severity=3)
        assert out.size == img.size

    ra = RandAugment(2, 9)
    assert ra(img).size == img.size

    arr = np.ones((16, 16, 3), np.float32)
    cut = Cutout(8)(arr)
    assert (cut == 0).any() and (arr == 1).all()

    class RawDS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return img, 1

    amds = AugMixDataset(
        RawDS(),
        pil_stage=lambda im, rng: im,
        array_stage=lambda im: np.asarray(im, np.float32) / 255.0,
    )
    views, target = amds[0]
    assert views.shape == (3, 24, 24, 3) and target == 1
