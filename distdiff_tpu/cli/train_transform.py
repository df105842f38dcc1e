"""Expansion × transformation-augmentation matrix — the reference's
``train_transform.py``: train with ``--transform_type`` in
default/autoaug/randaug/cutout (transform-level), cutmix/augmix/gridmask/
mixup (batch- or loss-level), over original data replicated (expand_num+1)×
or original ⊕ expanded filtered to ``--expand_num`` images per source
(``train_transform.py:158-169,230-258``).
"""

from __future__ import annotations

import argparse
import math

import numpy as np

from distdiff_tpu.cli.common import add_dataset_args, add_train_args, ensure_dir, set_seed, setup_logging
from distdiff_tpu.cli.train import build_dataset, build_model

TRANSFORM_TYPES = (
    "default", "autoaug", "randaug", "cutout",
    "cutmix", "augmix", "gridmask", "mixup",
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Expansion x augmentation trainer")
    add_dataset_args(p)
    add_train_args(p)
    p.add_argument("--transform_type", type=str, default="default",
                   choices=TRANSFORM_TYPES)
    p.add_argument("--data_expanded_dir", type=str, nargs="*", default=[])
    p.add_argument("--expand_num", type=int, default=5)
    return p.parse_args(argv)


def build_transform(args):
    """Transform-level augmentation stack (``get_transform``,
    ``train_transform.py:101-144``)."""
    from distdiff_tpu.data.transforms import (
        Compose, IMAGENET_MEAN, IMAGENET_STD, Normalize, RandomCrop,
        RandomHorizontalFlip, RandomRotation, Resize, ToArray,
    )
    from distdiff_tpu.train.augment import AutoAugmentCIFAR, Cutout, RandAugment

    size = args.input_size
    stack = [Resize(int(size * 256 / 224)), RandomRotation(15), RandomCrop(size),
             RandomHorizontalFlip()]
    if args.transform_type == "autoaug":
        stack.append(AutoAugmentCIFAR())
    elif args.transform_type == "randaug":
        stack.append(RandAugment(2, 9))
    stack += [ToArray(), Normalize(IMAGENET_MEAN, IMAGENET_STD)]
    if args.transform_type == "cutout":
        stack.append(Cutout(size // 4))
    return Compose(stack)


def main(argv=None):
    args = parse_args(argv)
    setup_logging()
    set_seed(args.manualSeed)

    from distdiff_tpu.data.datasets import (
        BatchLoader, ConcatDataset, DatasetByClassNames, RepeatDataset,
    )
    from distdiff_tpu.train import (
        TrainConfig, create_train_state, cross_entropy, fit,
        make_eval_step, make_optimizer, make_train_step,
    )
    from distdiff_tpu.train.augment import (
        AugMixDataset, GridMask, cutmix_data, jsd_consistency_loss,
        mixup_data, soft_target_cross_entropy,
    )

    is_augmix = args.transform_type == "augmix"
    # augmix applies its own stages inside AugMixDataset: base datasets stay
    # raw-PIL (transform None), and the wrapper produces 3-view stacks
    # (reference train_transform.py:256-271).
    tf = None if is_augmix else build_transform(args)
    loaded = build_dataset(args, train_tf=tf, raw_train=is_augmix)

    if args.data_expanded_dir:
        expanded = [
            DatasetByClassNames(root, loaded.classnames, tf,
                                expand_num=args.expand_num)
            for root in args.data_expanded_dir
        ]
        train_ds = ConcatDataset([loaded.train, *expanded])
        # exact (N+1)x ratio assert (train_transform.py:249)
        expected = len(loaded.train) * (args.expand_num + 1)
        assert len(train_ds) == expected, (
            f"expansion ratio mismatch: {len(train_ds)} != {expected}"
        )
    else:
        # no-expansion control: original x (expand_num+1) replicas (:245)
        train_ds = RepeatDataset(loaded.train, args.expand_num + 1)

    if is_augmix:
        from distdiff_tpu.data.transforms import (
            Compose, IMAGENET_MEAN, IMAGENET_STD, Normalize, RandomCrop,
            RandomHorizontalFlip, RandomRotation, Resize, ToArray,
        )

        size = args.input_size
        pil_stage = Compose([
            Resize(int(size * 256 / 224)), RandomRotation(15),
            RandomCrop(size), RandomHorizontalFlip(),
        ])
        array_compose = Compose([ToArray(), Normalize(IMAGENET_MEAN,
                                                      IMAGENET_STD)])
        train_ds = AugMixDataset(
            train_ds, pil_stage, lambda img: array_compose(img),
            seed=args.manualSeed or 0,
        )

    gm = build_model(args, loaded.num_classes)
    train_loader = BatchLoader(train_ds, args.train_batch, shuffle=True,
                               seed=args.manualSeed or 0)
    test_loader = BatchLoader(loaded.test, args.test_batch)

    cfg = TrainConfig(lr=args.lr, epochs=args.epochs, momentum=args.momentum,
                      weight_decay=args.weight_decay)
    tx = make_optimizer(cfg, steps_per_epoch=len(train_loader))
    state = create_train_state(gm.module, gm.variables, tx)
    eval_step = make_eval_step(gm.module)

    rng = np.random.default_rng(args.manualSeed or 0)
    gridmask = GridMask() if args.transform_type == "gridmask" else None
    mix_state = {}

    if args.transform_type in ("mixup", "cutmix"):
        mix_fn = mixup_data if args.transform_type == "mixup" else cutmix_data

        def loss_fn(logits, targets, mask):
            ta, tb, lam = mix_state["ta"], mix_state["tb"], mix_state["lam"]
            if args.transform_type == "mixup":
                return lam * cross_entropy(logits, ta, mask) + (
                    1 - lam
                ) * cross_entropy(logits, tb, mask)
            return soft_target_cross_entropy(logits, ta, tb, lam, mask)

        train_step = make_train_step(gm.module, tx, loss_fn=loss_fn)

        def on_batch(images, targets, mask):
            mixed, ta, tb, lam = mix_fn(images, targets, rng=rng)
            mix_state.update(ta=ta, tb=tb, lam=lam)
            return mixed, targets, mask

    elif args.transform_type == "augmix":
        # 3-view JSD loss: pack views into the batch axis (B*3)
        def loss_fn(logits, targets, mask):
            lc, l1, l2 = (
                logits[0::3], logits[1::3], logits[2::3]
            )
            ce = cross_entropy(lc, targets[0::3], mask[0::3])
            return ce + 12.0 * jsd_consistency_loss(lc, l1, l2, mask[0::3])

        train_step = make_train_step(gm.module, tx, loss_fn=loss_fn)

        def on_batch(images, targets, mask):
            # images arrive as [B, 3, H, W, C] from AugMixDataset collation
            b = images.shape[0]
            flat = images.reshape(b * 3, *images.shape[2:])
            return flat, np.repeat(targets, 3), np.repeat(mask, 3)

    else:
        train_step = make_train_step(gm.module, tx)

        def on_batch(images, targets, mask):
            if gridmask is not None:
                images = gridmask(images, rng)
            return images, targets, mask

    def lr_at_epoch(e):
        return args.lr * 0.5 * (1 + math.cos(math.pi * e / args.epochs))

    # GridMask's prob ramps linearly with the epoch index (reference
    # train_transform.py:381 hardcodes an 80-epoch ramp; clamped by the
    # actual budget so short runs still apply the mask) — driven by
    # fit's on_epoch.
    on_epoch = (
        (lambda e: gridmask.set_prob(e, min(80, args.epochs)))
        if gridmask is not None else None
    )

    result = fit(
        train_step, eval_step, state, train_loader, test_loader, cfg,
        ensure_dir(args.checkpoint), lr_at_epoch, on_batch=on_batch,
        on_epoch=on_epoch,
    )
    print("Best acc:")
    print(result["best_accuracy"])
    return result


if __name__ == "__main__":
    main()
