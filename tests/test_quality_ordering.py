"""Statistical quality ordering: guided expansion beats unguided (VERDICT r3 #3).

Runs the CALIBRATED quality-loop recipe (docs/quality_loop_v5e_r4.md,
run cal11) — 5 seeds x {original, +unguided, +guided} downstream trainings
on a class-overlapping toy dataset with the tiny VAE/UNet pre-trained
in-loop — and asserts the DistDiff ordering ``guided > unguided`` holds
with the measured-on-v5e margin structure.

This reproduces the committed hardware artifact, it is NOT an
every-commit test: ~19 min on a v5e, several x that on 1-core CPU. Gate:

    DISTDIFF_RUN_QUALITY_ORDERING=1 python -m pytest \
        tests/test_quality_ordering.py -q -m slow

Reference protocol: /root/reference/scripts/exps/train_expand.sh:9-31
(3-seed loop over train_expanded_data_concat_original.py) +
/root/reference/parse_logs.py:21-66 (mean±std aggregation).
"""

import importlib.util
import os

import pytest


def _load_quality_loop():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "quality_loop.py")
    spec = importlib.util.spec_from_file_location("quality_loop", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("DISTDIFF_RUN_QUALITY_ORDERING"),
    reason="multi-seed statistical run (~19 min on TPU); set "
           "DISTDIFF_RUN_QUALITY_ORDERING=1 to reproduce the "
           "docs/quality_loop_v5e_r4.md artifact",
)
def test_guided_beats_unguided_five_seeds(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # save/ caches land in tmp
    ql = _load_quality_loop()
    table = ql.main([
        "--workdir", str(tmp_path / "ql"),
        "--seeds", "1", "2", "3", "4", "5",
        "--epochs", "12", "--train_batch", "16", "--input_size", "16",
        "--num_images_per_prompt", "4",
        "--n_classes", "4", "--n_train", "8", "--n_test", "40",
        "--toy_noise", "30", "--toy_jitter", "55",
        "--strength", "0.5", "--guidance_scale", "1.0", "--steps", "20",
        "--train_guide", "--train_vae", "--train_unet",
    ])
    for variant in ("original", "unguided", "guided"):
        assert table[variant]["n"] == 5, (variant, table)
    # the DistDiff claim, measured at +2.12 (~3 sigma of the mean) on the
    # v5e: prototype-energy guidance recovers accuracy that unguided
    # expansion destroys. Require a >1-point mean separation so the test
    # fails on a real regression, not on seed noise.
    assert table["guided"]["mean"] > table["unguided"]["mean"] + 1.0, table
    # and guided expansion must not degrade the downstream model below
    # original-only by more than the measured noise floor (~1.5 = one
    # per-variant std at this scale).
    assert table["guided"]["mean"] > table["original"]["mean"] - 1.5, table


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("DISTDIFF_RUN_QUALITY_ORDERING"),
    reason="multi-seed statistical run (~19 min on TPU); set "
           "DISTDIFF_RUN_QUALITY_ORDERING=1 to reproduce the "
           "docs/quality_loop_v5e_r4.md cal14 artifact",
)
def test_full_ordering_starved_regime(tmp_path, monkeypatch):
    """cal14: guided > unguided > original in ONE run (v5e-measured
    76.60 > 75.80 > 65.60 at 5 seeds; at 60 seeds 76.98 > 75.87 > 66.09
    with the paired guided-unguided margin +1.12 at t=3.12 — every
    pairwise gap >=3 sigma, docs/quality_loop_v5e_r4.md r5 section).
    The expansion-vs-original gap (~+10, ~5 sigma) is asserted hard; at
    5 seeds the ~1-pt guided-vs-unguided edge sits under the 200-image
    test set's binomial noise floor (~2.8 sd/seed), so it is asserted
    as non-inferiority (>= -0.5); the >=3-sigma claim needs the 60-seed
    extension."""
    monkeypatch.chdir(tmp_path)
    ql = _load_quality_loop()
    table = ql.main([
        "--workdir", str(tmp_path / "ql"),
        "--seeds", "1", "2", "3", "4", "5",
        "--epochs", "12", "--train_batch", "16", "--input_size", "16",
        "--num_images_per_prompt", "5",
        "--n_classes", "4", "--n_train", "5", "--n_test", "50",
        "--toy_noise", "30", "--toy_jitter", "55",
        "--strength", "0.45", "--guidance_scale", "1.0", "--steps", "20",
        "--train_guide", "--guide_epochs", "40",
        "--train_vae", "--train_unet",
    ])
    for variant in ("original", "unguided", "guided"):
        assert table[variant]["n"] == 5, (variant, table)
    orig = table["original"]["mean"]
    ung = table["unguided"]["mean"]
    gui = table["guided"]["mean"]
    # expansion lifts the starved baseline by ~10 points (~5 sigma);
    # require half the measured margin so only a real regression fails.
    assert ung > orig + 5.0, table
    assert gui > orig + 5.0, table
    # guidance must not hurt relative to unguided expansion.
    assert gui >= ung - 0.5, table
