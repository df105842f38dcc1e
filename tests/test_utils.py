"""Logger format parity, metrics, meters, profiling, grids, tokenizer."""

import os

import jax.numpy as jnp
import numpy as np

from distdiff_tpu.utils import AverageMeter, Logger, accuracy
from distdiff_tpu.utils.classnames import CIFAR100_CLASSES, get_num_classes
from distdiff_tpu.utils.profiling import PhaseTimer, device_memory_stats
from distdiff_tpu.utils.prompts import PHOTO_TEMPLATES, expand_templates
from distdiff_tpu.utils.visualize import make_grid


def test_logger_format_and_resume(tmp_path):
    path = str(tmp_path / "log.txt")
    with Logger(path, title="t") as lg:
        lg.set_names(["A", "B"])
        lg.append([1.0, 2.0])
        lg.append([3.0, 4.5])
    with open(path) as f:
        lines = f.read().rstrip().split("\n")
    assert lines[0] == "A\tB"
    assert lines[1].split("\t") == ["1.000000", "2.000000"]

    # resume mode re-reads columns and appends
    with Logger(path, resume=True) as lg:
        assert lg.names == ["A", "B"]
        assert lg.numbers["B"] == [2.0, 4.5]
        lg.set_names(["A", "B"])  # no-op on resume
        lg.append([5.0, 6.0])
    with open(path) as f:
        assert len(f.read().rstrip().split("\n")) == 4


def test_accuracy_topk():
    logits = jnp.asarray([
        [0.1, 0.9, 0.0, 0.0],
        [0.8, 0.1, 0.05, 0.05],
        [0.1, 0.2, 0.3, 0.4],
    ])
    targets = jnp.asarray([1, 2, 0])
    top1, top3 = accuracy(logits, targets, (1, 3))
    np.testing.assert_allclose(float(top1), 100.0 / 3, atol=1e-4)
    np.testing.assert_allclose(float(top3), 200.0 / 3, atol=1e-4)


def test_meter_and_timer():
    m = AverageMeter()
    m.update(2.0, 2)
    m.update(4.0)
    assert m.avg == (2.0 * 2 + 4.0) / 3
    t = PhaseTimer(sync=False)
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2 and "a" in t.report()
    assert isinstance(device_memory_stats(), dict)


def test_classnames_and_prompts():
    assert len(CIFAR100_CLASSES) == 100
    assert get_num_classes("caltech-101") == 100
    assert get_num_classes("unknown") == -1
    bank = expand_templates(["dog"], PHOTO_TEMPLATES)
    assert len(bank["dog"]) == len(PHOTO_TEMPLATES)
    assert "dog" in bank["dog"][0]


def test_make_grid():
    imgs = np.zeros((5, 8, 8, 3), np.float32)
    grid = make_grid(imgs, ncols=3, pad=1)
    assert grid.shape == (2 * 9 + 1, 3 * 9 + 1, 3)


def test_clip_tokenizer_bpe(tmp_path):
    """Real BPE path with a miniature merges file."""
    from distdiff_tpu.models.tokenizer import CLIPTokenizer, load_tokenizer

    merges = "#version\nl o\nlo w</w>\ne r</w>\n"
    path = str(tmp_path / "merges.txt")
    with open(path, "w") as f:
        f.write(merges)
    tok = CLIPTokenizer(path, max_length=8)
    ids = tok(["lower low"])
    assert ids.shape == (1, 8)
    assert ids[0, 0] == tok.bot
    assert tok.eot in ids[0]
    # "low" merges to a single token (l+o then lo+w</w>)
    low_ids = tok.encode("low")
    assert len(low_ids) == 1

    # fallback hash tokenizer when no merges available
    ht = load_tokenizer(None, max_length=8, vocab_size=100)
    out = ht(["hello world"])
    assert out.shape == (1, 8)
    out2 = ht(["hello world"])
    np.testing.assert_array_equal(out, out2)  # deterministic
