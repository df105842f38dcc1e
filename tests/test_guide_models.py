"""Guide-model factory, encode_image API, and torch checkpoint import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distdiff_tpu.models.guide import create_model, zero_shot_logits
from distdiff_tpu.models.guide.factory import _flatten, load_weights


def test_tiny_resnet_api():
    gm = create_model("tiny_resnet", num_classes=5, input_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    feats = jax.jit(gm.encode_image)(x)
    assert feats.shape == (2, gm.feature_dim)
    logits = jax.jit(gm.logits)(x)
    assert logits.shape == (2, 5)
    # max pooling variant (reference encode_image pooling kwarg)
    feats_max = jax.jit(lambda xx: gm.encode_image(xx, "max"))(x)
    assert feats_max.shape == feats.shape


def test_unknown_arch_raises():
    with pytest.raises(ValueError, match="unknown arch"):
        create_model("not_an_arch", num_classes=3)


def test_zero_shot_logits():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(4, 16), jnp.float32)
    txt = jnp.asarray(rng.randn(7, 16), jnp.float32)
    out = zero_shot_logits(img, txt)
    assert out.shape == (4, 7)
    # scale-invariance of inputs (both sides are normalized)
    out2 = zero_shot_logits(img * 3.0, txt * 0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_torch_state_dict_roundtrip(tmp_path):
    """Synthesize a reference-style torch checkpoint (module.-prefixed,
    OIHW/out-in layouts) from known values and import it."""
    torch = pytest.importorskip("torch")

    gm = create_model("tiny_resnet", num_classes=3, input_size=32)
    params = _flatten(gm.variables["params"])
    stats = _flatten(gm.variables["batch_stats"])

    rng = np.random.RandomState(0)
    state = {}
    expected = {}

    def ours_to_torch(key):
        parts = key.split("/")
        if parts[0].startswith("layer"):
            layer, idx = parts[0].rsplit("_", 1)
            rest = parts[1:]
            if rest[0] == "downsample_conv":
                rest = ["downsample", "0", rest[1]]
            elif rest[0] == "downsample_bn":
                rest = ["downsample", "1", rest[1]]
            return ".".join([f"{layer}.{idx}"] + rest)
        return ".".join(parts)

    for key, val in params.items():
        new = rng.randn(*val.shape).astype(np.float32)
        expected[("params", key)] = new
        tkey = ours_to_torch(key)
        if key.endswith("/kernel"):
            if new.ndim == 4:
                arr = new.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            else:
                arr = new.T
            tkey = tkey.replace(".kernel", ".weight")
        elif key.endswith("/scale"):
            arr = new
            tkey = tkey.replace(".scale", ".weight")
        else:
            arr = new
        state["module." + tkey] = torch.tensor(arr)
    for key, val in stats.items():
        new = rng.rand(*val.shape).astype(np.float32)
        expected[("batch_stats", key)] = new
        tkey = ours_to_torch(key)
        tkey = tkey.replace(".mean", ".running_mean").replace(".var", ".running_var")
        state["module." + tkey] = torch.tensor(new)

    path = str(tmp_path / "checkpoint.pth.tar")
    torch.save({"state_dict": state}, path)

    load_weights(gm, path)
    got_p = _flatten(gm.variables["params"])
    got_s = _flatten(gm.variables["batch_stats"])
    for (coll, key), val in expected.items():
        got = got_p[key] if coll == "params" else got_s[key]
        np.testing.assert_allclose(got, val, atol=1e-6, err_msg=key)
