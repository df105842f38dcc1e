"""Data layer: registry fixtures, expanded-tree reader, SD dataset caching."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from distdiff_tpu.data import (
    BatchLoader,
    ConcatDataset,
    DatasetByClassNames,
    ImageListDataset,
    RepeatDataset,
    SDDataset,
    collate_sd,
    load_dataset,
    template_for,
)
from distdiff_tpu.data.transforms import eval_transform, sd_transform, train_transform


def _write_img(path, color, size=(40, 40)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, color).save(path)


@pytest.fixture
def caltech_tree(tmp_path):
    root = tmp_path / "data" / "caltech-101"
    cats = [f"class_{i:03d}" for i in range(100)]
    # keep it fast: only 3 populated classes get >0 images; the rest get 1
    for ci, cat in enumerate(cats):
        n = 3 if ci < 3 else 1
        for k in range(n):
            _write_img(str(root / "train" / cat / f"img_{k}.png"), (ci % 255, 10, 10))
        _write_img(str(root / "test" / cat / "t0.png"), (ci % 255, 20, 20))
    # distractor dirs that must be dropped
    for dropped in ["BACKGROUND_Google", "Faces_easy"]:
        _write_img(str(root / "train" / dropped / "x.png"), (0, 0, 0))
        _write_img(str(root / "test" / dropped / "x.png"), (0, 0, 0))
    return str(tmp_path / "data")


def test_caltech_loader(caltech_tree):
    ds = load_dataset("caltech-101", train_transform(32), eval_transform(32),
                      data_root=caltech_tree)
    assert ds.num_classes == 100
    assert len(ds.train) == 3 * 3 + 97
    assert len(ds.test) == 100
    # classnames space-normalized
    assert ds.classnames[0] == "class 000"
    img, label = ds.train[0]
    assert img.shape == (32, 32, 3) and label == 0


def test_imagenette_loader(tmp_path):
    root = tmp_path / "data" / "imagenette2-320"
    for split in ["train", "val"]:
        for ci in range(3):
            _write_img(str(root / split / f"n{ci:04d}" / "a.png"), (ci, ci, ci))
    ds = load_dataset("imagenette2-320", None, None, data_root=str(tmp_path / "data"))
    assert ds.num_classes == 3 and len(ds.train) == 3


def test_dtd_loader(tmp_path):
    root = tmp_path / "data" / "dtd"
    cats = ["banded", "dotted"]
    for cat in cats:
        for k in range(3):
            _write_img(str(root / "images" / cat / f"{cat}_{k}.jpg"), (5, 5, 5))
    os.makedirs(root / "labels", exist_ok=True)
    (root / "labels" / "train1.txt").write_text("banded/banded_0.jpg\ndotted/dotted_0.jpg\n")
    (root / "labels" / "val1.txt").write_text("banded/banded_1.jpg\n")
    (root / "labels" / "test1.txt").write_text("banded/banded_2.jpg\ndotted/dotted_2.jpg\n")
    ds = load_dataset("dtd", None, None, data_root=str(tmp_path / "data"))
    # train = train1 + val1 merged
    assert len(ds.train) == 3 and len(ds.test) == 2
    assert ds.classnames == ["banded", "dotted"]


def test_oxford_pets_loader(tmp_path):
    root = tmp_path / "data" / "oxford_pets"
    breeds = [f"breed{chr(ord('a')+i)}" for i in range(37)]
    lines = []
    for bi, b in enumerate(breeds):
        _write_img(str(root / "images" / f"{b}_1.jpg"), (bi, 0, 0))
        lines.append(f"{b}_1 {bi + 1} 1 1")
    os.makedirs(root / "annotations", exist_ok=True)
    (root / "annotations" / "trainval.txt").write_text("\n".join(lines) + "\n")
    (root / "annotations" / "test.txt").write_text(lines[0] + "\n")
    ds = load_dataset("oxford_pets", None, None, data_root=str(tmp_path / "data"))
    assert ds.num_classes == 37
    assert len(ds.train) == 37 and len(ds.test) == 1


def test_fgvc_aircraft_loader(tmp_path):
    root = tmp_path / "data" / "fgvc_aircraft"
    variants = ["707-320", "A310", "F-16A B"]
    (root / "images").mkdir(parents=True)
    (root / "variants.txt").write_text("\n".join(variants) + "\n")
    lines_tr, lines_te = [], []
    for vi, v in enumerate(variants):
        _write_img(str(root / "images" / f"im{vi}.jpg"), (vi, vi, vi))
        lines_tr.append(f"im{vi} {v}")
    lines_te.append(f"im0 {variants[0]}")
    (root / "images_variant_train.txt").write_text("\n".join(lines_tr) + "\n")
    (root / "images_variant_val.txt").write_text("")
    (root / "images_variant_test.txt").write_text("\n".join(lines_te) + "\n")
    ds = load_dataset("fgvc_aircraft", None, None, data_root=str(tmp_path / "data"))
    assert ds.num_classes == 3
    assert len(ds.train) == 3 and len(ds.test) == 1
    assert ds.classnames[2] == "F-16A B"


def test_oxford_flowers_loader(tmp_path):
    root = tmp_path / "data" / "oxford_flowers"
    cat_to_name = {str(i + 1): f"flower {i}" for i in range(102)}
    for i in range(102):
        _write_img(str(root / "train" / str(i + 1) / "a.jpg"), (i % 255, 0, 0))
        _write_img(str(root / "valid" / str(i + 1) / "b.jpg"), (i % 255, 1, 1))
    (root / "cat_to_name.json").write_text(json.dumps(cat_to_name))
    ds = load_dataset("oxford_flowers", None, None, data_root=str(tmp_path / "data"))
    assert ds.num_classes == 102
    assert ds.classnames[0] == "flower 0"


def _cifar100_names():
    return [f"cls{i:03d}" for i in range(100)]


def test_cifar100_subset_pickle_branch(tmp_path):
    """Pickle branch: test split from the torchvision cifar-100-python
    download (dataloader.py:132-165), train from the class-dir subset tree."""
    import pickle

    data_root = tmp_path / "data"
    names = _cifar100_names()
    pkl = data_root / "cifar-100-python"
    pkl.mkdir(parents=True)
    with open(pkl / "meta", "wb") as f:
        pickle.dump({"fine_label_names": names}, f)
    n_test = 7
    test_images = np.arange(n_test * 3072, dtype=np.uint8).reshape(n_test, 3072) % 255
    with open(pkl / "test", "wb") as f:
        pickle.dump({"data": test_images.tolist(),
                     "fine_labels": list(range(n_test))}, f)
    root = data_root / "cifar100_subset"
    for ci, name in enumerate(names):
        n = 2 if ci < 2 else 1
        for k in range(n):
            _write_img(str(root / name / f"im{k}.png"), (ci % 255, 0, 0), size=(32, 32))
    ds = load_dataset("cifar100_subset", None, eval_transform(32),
                      data_root=str(data_root))
    assert ds.num_classes == 100
    assert len(ds.train) == 2 * 2 + 98
    assert len(ds.test) == n_test
    assert ds.classnames == [n.replace("_", " ") for n in names]
    img, label = ds.test[3]
    assert img.shape == (32, 32, 3) and label == 3
    # pickle rows are CHW-flattened uint8; check the reshape/transpose orientation
    raw = test_images[3].reshape(3, 32, 32).transpose(1, 2, 0)
    assert np.asarray(ds.test.images[3]).shape == raw.shape


def test_cifar100_subset_fallback_tree(tmp_path):
    """No cifar-100-python pickles: classnames from the train tree, test from
    the optional cifar100_subset_test sibling dir (or empty)."""
    data_root = tmp_path / "data"
    root = data_root / "cifar100_subset"
    names = ["apple", "bear", "wolf_cub"]
    for ci, name in enumerate(names):
        _write_img(str(root / name / "a.png"), (ci, ci, ci))
    ds = load_dataset("cifar100_subset", None, None, data_root=str(data_root))
    assert ds.classnames == ["apple", "bear", "wolf cub"]
    assert len(ds.train) == 3 and len(ds.test) == 0
    # now with the sibling test tree
    for name in names:
        _write_img(str(data_root / "cifar100_subset_test" / name / "t.png"), (9, 9, 9))
    ds2 = load_dataset("cifar100_subset", None, None, data_root=str(data_root))
    assert len(ds2.test) == 3


@pytest.fixture
def cars_tree(tmp_path):
    """Stanford-cars devkit .mat fixture written with scipy.savemat, matching
    the structures the reference parses (dataloader.py:167-228): annotations
    as a struct array with fname/class fields, cars_meta as a char-cell row."""
    from scipy import io as sio

    data_root = tmp_path / "data"
    root = data_root / "stanford_cars"
    (root / "devkit").mkdir(parents=True)
    # 196 names in "Make Model Year" order; loader must move year to front
    meta_names = [f"Make{i:03d} Model {1990 + (i % 30)}" for i in range(196)]
    sio.savemat(str(root / "devkit" / "cars_meta.mat"),
                {"class_names": np.array([meta_names], dtype=object)})

    def write_annos(path, image_dir, entries):
        ann = np.zeros((len(entries),), dtype=[("fname", "O"), ("class", "O")])
        for i, (fname, label1) in enumerate(entries):
            ann[i] = (fname, float(label1))
            _write_img(str(root / image_dir / fname), (label1 % 255, 0, 0))
        sio.savemat(path, {"annotations": ann.reshape(1, -1)})

    # the real devkit's train annos cover all 196 classes (the assert at
    # dataloader.py:208 relies on it); one image per class + an extra class-1
    write_annos(str(root / "devkit" / "cars_train_annos.mat"), "cars_train",
                [(f"tr{k}.jpg", k + 1) for k in range(196)] + [("trx.jpg", 1)])
    write_annos(str(root / "cars_test_annos_withlabels.mat"), "cars_test",
                [("te0.jpg", 2), ("te1.jpg", 196)])
    return str(data_root)


def test_stanford_cars_loader(cars_tree):
    ds = load_dataset("stanford_cars", None, eval_transform(32),
                      data_root=cars_tree)
    assert ds.num_classes == 196
    assert len(ds.train) == 197 and len(ds.test) == 2
    # year-first reorder, label-sorted (dataloader.py:186-196)
    assert ds.classnames[0] == "1990 Make000 Model"
    assert ds.classnames[195] == f"{1990 + (195 % 30)} Make195 Model"
    # labels are the 0-based .mat classes
    _, label = ds.train[195]
    assert label == 195
    _, te_label = ds.test[0]
    assert te_label == 1
    img, _ = ds.test[1]
    assert img.shape == (32, 32, 3)


def test_expanded_tree_reader(tmp_path):
    root = tmp_path / "expanded"
    for cls in ["cat", "dog"]:
        for i in range(4):
            _write_img(str(root / cls / f"orig_expand_{i}.png"), (i, i, i))
    ds_all = DatasetByClassNames(str(root), ["cat", "dog"], eval_transform(16))
    assert len(ds_all) == 8
    ds_2 = DatasetByClassNames(str(root), ["cat", "dog"], eval_transform(16),
                               expand_num=2)
    assert len(ds_2) == 4  # only _expand_0 and _expand_1 per class
    # missing class dirs tolerated
    ds_m = DatasetByClassNames(str(root), ["cat", "bird"], eval_transform(16))
    assert len(ds_m) == 4


def test_concat_repeat_and_loader(tmp_path):
    _write_img(str(tmp_path / "c" / "x.png"), (1, 2, 3))
    base = ImageListDataset([str(tmp_path / "c" / "x.png")] * 5, [0] * 5,
                            eval_transform(16))
    ds = ConcatDataset([base, RepeatDataset(base, 2)])
    assert len(ds) == 15
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 4
    imgs, labels, mask = batches[-1]
    assert imgs.shape == (4, 16, 16, 3)  # padded tail
    assert mask.sum() == 3  # 15 = 3*4 + 3


def test_sd_dataset_cache_and_collate(caltech_tree, tmp_path):
    calls = {"text": 0, "img": 0}

    def encode_text(prompts):
        calls["text"] += 1
        return np.stack([np.full((4, 8), len(p), np.float32) for p in prompts])

    def encode_images(imgs):
        calls["img"] += 1
        assert imgs.ndim == 4 and imgs.shape[-1] == 3
        return np.zeros((imgs.shape[0], 4, 4, 4), np.float32)

    kw = dict(
        dataset="caltech-101",
        encode_text_fn=encode_text,
        encode_images_fn=encode_images,
        size=32,
        data_root=caltech_tree,
        cache_root=str(tmp_path / "cache"),
        encode_batch=16,
    )
    ds = SDDataset(**kw)
    n_img_calls = calls["img"]
    assert n_img_calls > 0
    assert len(ds) == 3 * 3 + 97
    item = ds[0]
    assert item.latent.shape == (4, 4, 4)
    assert item.cond.shape == (4, 8)
    assert item.target == 0 and item.class_name == "class 000"

    # second construction hits the latent disk cache
    ds2 = SDDataset(**kw)
    assert calls["img"] == n_img_calls
    np.testing.assert_allclose(ds2.latents, ds.latents)

    batch = collate_sd([ds[0], ds[1]])
    assert batch["latents"].shape == (2, 4, 4, 4)
    assert batch["cond"].shape == (2, 4, 8)
    assert batch["targets"].tolist() == [0, 0]


def test_templates():
    assert template_for("dtd") == "{} texture."
    assert template_for("unknown_ds") == "a photo of a {}."
    assert "pet" in template_for("oxford_pets")


def test_sd_transform_range(tmp_path):
    _write_img(str(tmp_path / "x.png"), (255, 0, 128), size=(50, 70))
    from distdiff_tpu.data import load_image

    img = load_image(str(tmp_path / "x.png"))
    arr = sd_transform(32)(img, np.random.default_rng(0))
    assert arr.shape == (32, 32, 3)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    assert arr.max() > 0.9  # the 255 channel maps near +1
