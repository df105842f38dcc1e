"""Golden tests for the torchvision-exact AutoAugment-CIFAR10 + RandAugment
(train/augment/tv_policies.py) against the PUBLISHED tables — torchvision
itself is not installed in this image, so the goldens are the policy table
from the AutoAugment paper (Cubuk et al. 2019) as shipped in
torchvision/transforms/autoaugment.py, and torchvision's
``_augmentation_space`` bin formulas evaluated by hand.
"""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from distdiff_tpu.train.augment.tv_policies import (
    CIFAR10_POLICY,
    AutoAugmentCIFAR10,
    RandAugment,
    apply_op,
    augmentation_space,
)

# The published 25-sub-policy CIFAR-10 AutoAugment table, duplicated here
# verbatim as the golden (torchvision AutoAugmentPolicy.CIFAR10).
GOLDEN_CIFAR10 = [
    (("Invert", 0.1, None), ("Contrast", 0.2, 6)),
    (("Rotate", 0.7, 2), ("TranslateX", 0.3, 9)),
    (("Sharpness", 0.8, 1), ("Sharpness", 0.9, 3)),
    (("ShearY", 0.5, 8), ("TranslateY", 0.7, 9)),
    (("AutoContrast", 0.5, None), ("Equalize", 0.9, None)),
    (("ShearY", 0.2, 7), ("Posterize", 0.3, 7)),
    (("Color", 0.4, 3), ("Brightness", 0.6, 7)),
    (("Sharpness", 0.3, 9), ("Brightness", 0.7, 9)),
    (("Equalize", 0.6, None), ("Equalize", 0.5, None)),
    (("Contrast", 0.6, 7), ("Sharpness", 0.6, 5)),
    (("Color", 0.7, 7), ("TranslateX", 0.5, 8)),
    (("Equalize", 0.3, None), ("AutoContrast", 0.4, None)),
    (("TranslateY", 0.4, 3), ("Sharpness", 0.2, 6)),
    (("Brightness", 0.9, 6), ("Color", 0.2, 8)),
    (("Solarize", 0.5, 2), ("Invert", 0.0, None)),
    (("Equalize", 0.2, None), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.2, None), ("Equalize", 0.6, None)),
    (("Color", 0.9, 9), ("Equalize", 0.6, None)),
    (("AutoContrast", 0.8, None), ("Solarize", 0.2, 8)),
    (("Brightness", 0.1, 3), ("Color", 0.7, 0)),
    (("Solarize", 0.4, 5), ("AutoContrast", 0.9, None)),
    (("TranslateY", 0.9, 9), ("TranslateY", 0.7, 9)),
    (("AutoContrast", 0.9, None), ("Solarize", 0.8, 3)),
    (("Equalize", 0.8, None), ("Invert", 0.1, None)),
    (("TranslateY", 0.7, 9), ("AutoContrast", 0.9, None)),
]


def _checker(size=32):
    """Asymmetric RGB test image (gradient + corner markers)."""
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
    arr[:4, :4] = 255
    arr[-4:, -4:] = 0
    return Image.fromarray(arr)


def test_cifar10_policy_table_matches_published():
    assert len(CIFAR10_POLICY) == 25
    assert CIFAR10_POLICY == GOLDEN_CIFAR10


def test_autoaugment_magnitude_bins_10():
    space = augmentation_space(10, 32, 32, include_identity=False,
                               include_invert=True)
    # 14 ops, Invert present, Identity absent
    assert "Invert" in space and "Identity" not in space
    assert len(space) == 14
    np.testing.assert_array_equal(
        space["Posterize"][0], [8, 8, 7, 7, 6, 6, 5, 5, 4, 4])
    np.testing.assert_allclose(space["Solarize"][0],
                               np.linspace(255.0, 0.0, 10))
    np.testing.assert_allclose(space["Rotate"][0][2], 30.0 * 2 / 9)
    np.testing.assert_allclose(space["ShearY"][0][8], 0.3 * 8 / 9)
    # TranslateX max bin = 150/331 of the image width (torchvision formula)
    np.testing.assert_allclose(space["TranslateX"][0][9],
                               150.0 / 331.0 * 32)
    np.testing.assert_allclose(space["Brightness"][0][7], 0.9 * 7 / 9)
    # signedness flags
    for name in ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
                 "Brightness", "Color", "Contrast", "Sharpness"):
        assert space[name][1] is True, name
    for name in ("Posterize", "Solarize", "AutoContrast", "Equalize",
                 "Invert"):
        assert bool(space[name][1]) is False, name


def test_randaugment_space_14_ops_31_bins():
    space = augmentation_space(31, 40, 32, include_identity=True,
                               include_invert=False)
    assert list(space) == [
        "Identity", "ShearX", "ShearY", "TranslateX", "TranslateY",
        "Rotate", "Brightness", "Color", "Contrast", "Sharpness",
        "Posterize", "Solarize", "AutoContrast", "Equalize",
    ]
    # default magnitude bin 9 of 31
    assert float(space["Solarize"][0][9]) == pytest.approx(255.0 * 21 / 30)
    assert int(space["Posterize"][0][9]) == 7  # 8 - round(9/7.5) = 8 - 1
    # translations use height for Y, width for X
    np.testing.assert_allclose(space["TranslateY"][0][30],
                               150.0 / 331.0 * 40)
    np.testing.assert_allclose(space["TranslateX"][0][30],
                               150.0 / 331.0 * 32)


def test_apply_op_matches_pil_semantics():
    img = _checker()
    arr = np.asarray(img)

    # point ops delegate to the exact PIL calls torchvision's PIL backend uses
    assert np.array_equal(np.asarray(apply_op(img, "Solarize", 128.0)),
                          np.asarray(ImageOps.solarize(img, 128.0)))
    assert np.array_equal(np.asarray(apply_op(img, "Posterize", 4)),
                          np.asarray(ImageOps.posterize(img, 4)))
    assert np.array_equal(np.asarray(apply_op(img, "Invert", 0.0)),
                          np.asarray(ImageOps.invert(img)))
    assert np.array_equal(np.asarray(apply_op(img, "Equalize", 0.0)),
                          np.asarray(ImageOps.equalize(img)))
    assert np.array_equal(np.asarray(apply_op(img, "AutoContrast", 0.0)),
                          np.asarray(ImageOps.autocontrast(img)))
    # enhancement ops are enhance(1 + magnitude)
    assert np.array_equal(np.asarray(apply_op(img, "Brightness", -0.5)),
                          np.asarray(ImageEnhance.Brightness(img).enhance(0.5)))
    assert np.array_equal(np.asarray(apply_op(img, "Contrast", 0.4)),
                          np.asarray(ImageEnhance.Contrast(img).enhance(1.4)))
    assert np.array_equal(np.asarray(apply_op(img, "Identity", 0.0)),
                          arr)


def test_translate_moves_content_by_integer_pixels():
    img = _checker()
    arr = np.asarray(img)
    out = np.asarray(apply_op(img, "TranslateX", 5.9))  # int() -> 5 px
    # content shifts +5 in x; the vacated left strip is zero-filled
    np.testing.assert_array_equal(out[:, 5:], arr[:, :-5])
    assert (out[:, :5] == 0).all()
    out_y = np.asarray(apply_op(img, "TranslateY", -3.0))
    np.testing.assert_array_equal(out_y[:-3], arr[3:])
    assert (out_y[-3:] == 0).all()


def test_rotate_is_counterclockwise_pil():
    img = _checker()
    out = np.asarray(apply_op(img, "Rotate", 90.0))
    np.testing.assert_array_equal(
        out, np.asarray(np.rot90(np.asarray(img), k=-3)))
    # equivalently PIL's own rotate
    np.testing.assert_array_equal(
        out, np.asarray(img.rotate(90, resample=Image.NEAREST)))


def test_shear_matrix_matches_published_affine():
    img = _checker()
    m = 0.3
    expected = img.transform(img.size, Image.AFFINE, (1, m, 0, 0, 1, 0),
                             resample=Image.NEAREST)
    assert np.array_equal(np.asarray(apply_op(img, "ShearX", m)),
                          np.asarray(expected))


def test_autoaugment_deterministic_and_in_range():
    img = _checker()
    aa = AutoAugmentCIFAR10()
    a = aa(img, rng=np.random.default_rng(7))
    b = aa(img, rng=np.random.default_rng(7))
    c = aa(img, rng=np.random.default_rng(8))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert a.size == img.size
    # different seed eventually differs (not a constant function)
    outs = {np.asarray(aa(img, rng=np.random.default_rng(s))).tobytes()
            for s in range(12)}
    assert len(outs) > 1
    assert c.size == img.size


def test_randaugment_deterministic_and_uses_fixed_bin():
    img = _checker()
    ra = RandAugment()  # torchvision defaults: 2 ops, magnitude 9, 31 bins
    assert (ra.num_ops, ra.magnitude, ra.num_magnitude_bins) == (2, 9, 31)
    a = ra(img, rng=np.random.default_rng(3))
    b = ra(img, rng=np.random.default_rng(3))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert a.size == img.size
    outs = {np.asarray(ra(img, rng=np.random.default_rng(s))).tobytes()
            for s in range(12)}
    assert len(outs) > 1
