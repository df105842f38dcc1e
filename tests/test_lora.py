"""LoRA adapters (train/lora.py): identity at init, targeted leaves only,
denoising-loss training actually learns, save/load roundtrip."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from distdiff_tpu.config import UNetConfig  # noqa: E402
from distdiff_tpu.models import UNet2DCondition  # noqa: E402
from distdiff_tpu.schedulers.ddim import make_schedule  # noqa: E402
from distdiff_tpu.train.lora import (  # noqa: E402
    apply_lora,
    init_lora,
    load_lora,
    lora_keys,
    make_lora_train_step,
    merge_lora,
    save_lora,
)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 6, cfg.cross_attention_dim), jnp.float32)
    variables = jax.jit(unet.init)(jax.random.PRNGKey(0), x,
                                   jnp.array([1, 3]), ctx)
    return unet, variables["params"], x, ctx


def test_lora_targets_attention_projections(tiny_unet):
    _, params, _, _ = tiny_unet
    keys = lora_keys(params)
    assert keys, "no targets found"
    for want in ("to_q", "to_k", "to_v", "to_out"):
        assert any(want in k for k in keys), (want, keys[:8])
    # only 2-D kernels, never convs or norms
    assert all(k.endswith("kernel") for k in keys)
    assert not any("conv" in k or "norm" in k for k in keys)


def test_lora_init_is_identity(tiny_unet):
    unet, params, x, ctx = tiny_unet
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = apply_lora(params, lora, alpha=8.0)
    ref = unet.apply({"params": params}, x, jnp.array([5, 9]), ctx)
    out = unet.apply({"params": merged}, x, jnp.array([5, 9]), ctx)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_lora_apply_changes_only_targets(tiny_unet):
    _, params, _, _ = tiny_unet
    lora = init_lora(jax.random.PRNGKey(2), params, rank=2)
    # make b nonzero so the adapted leaves move
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    merged = apply_lora(params, lora, alpha=1.0)
    keys = set(lora_keys(params))
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = jax.tree_util.tree_flatten_with_path(merged)[0]
    for (path, a), (_, b) in zip(flat_p, flat_m):
        names = "/".join(p.key for p in path if hasattr(p, "key"))
        if names in keys:
            assert not np.allclose(a, b), names
        else:
            np.testing.assert_array_equal(a, b, err_msg=names)


def test_lora_missing_leaf_raises(tiny_unet):
    _, params, _, _ = tiny_unet
    lora = init_lora(jax.random.PRNGKey(3), params, rank=2)
    lora["not/a/real/leaf/kernel"] = {
        "a": jnp.zeros((4, 2)), "b": jnp.zeros((2, 4))}
    with pytest.raises(KeyError):
        apply_lora(params, lora)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
def test_lora_training_learns(tiny_unet, prediction_type):
    """30 jitted steps on a fixed tiny batch must cut the denoising loss —
    gradients reach the adapters through apply_lora."""
    unet, params, x, ctx = tiny_unet
    sched = make_schedule(num_inference_steps=10,
                          prediction_type=prediction_type)
    tx = optax.adamw(1e-2)
    lora = init_lora(jax.random.PRNGKey(4), params, rank=4)
    opt_state = tx.init(lora)
    step = jax.jit(make_lora_train_step(unet, sched, tx, alpha=4.0))

    losses = []
    rng = jax.random.PRNGKey(5)
    for i in range(30):
        lora, opt_state, loss = step(lora, opt_state, params, x, ctx,
                                     jax.random.fold_in(rng, i % 4))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses
    # base params were never touched
    assert not np.allclose(
        np.asarray(lora[lora_keys(params)[0]]["b"]), 0.0)


def test_lora_save_load_roundtrip(tiny_unet, tmp_path):
    unet, params, x, ctx = tiny_unet
    lora = init_lora(jax.random.PRNGKey(6), params, rank=3)
    lora = jax.tree.map(lambda v: v + 0.05, lora)
    f = str(tmp_path / "adapter.npz")
    save_lora(f, lora, alpha=6.0)
    lora2, alpha = load_lora(f)
    assert alpha == 6.0
    m1 = merge_lora(params, lora, alpha=6.0)
    m2 = merge_lora(params, lora2, alpha=alpha)
    out1 = unet.apply({"params": m1}, x, jnp.array([2, 7]), ctx)
    out2 = unet.apply({"params": m2}, x, jnp.array([2, 7]), ctx)
    np.testing.assert_allclose(out1, out2, atol=1e-7)
