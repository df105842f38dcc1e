"""Guide-model factory — parity with the reference's ``create_model``
(``model_utils.py:43-104``): archs ``resnet50``/``resnext50``/
``mobilenetv2``/``wideresnet50``/``open_clip_vit_b32``, checkpoint loading
with ``module.``-prefix stripping, and the uniform ``encode_image`` API.

Checkpoints: native orbax trees, plus an importer for torch state dicts
(the reference's ``train.py`` writes ``checkpoint.pth.tar`` — guide weights
trained with the reference remain loadable here).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from distdiff_tpu.models.guide.clip_vit import (
    CLIPViT,
    CLIPViTConfig,
    tiny_clip_vit_config,
    zero_shot_logits,
)
from distdiff_tpu.models.guide.mobilenet import MobileNetV2, MobileNetV2Config
from distdiff_tpu.models.guide.resnet import (
    ResNet,
    resnet50_config,
    resnext50_config,
    tiny_resnet_config,
    wideresnet50_config,
)

ARCHS = (
    "resnet50",
    "resnext50",
    "mobilenetv2",
    "wideresnet50",
    "open_clip_vit_b32",
    "tiny_resnet",   # test-only miniature (not in the reference)
)


@dataclasses.dataclass
class GuideModel:
    """A guide classifier: module + variables + the two calls DistDiff needs
    (`forward` -> logits for train/eval, `encode_image` -> features for
    prototypes/energy)."""

    arch: str
    module: Any
    variables: Any  # {'params': ..., 'batch_stats': ...?}
    feature_dim: int
    num_classes: int
    # set for open_clip_vit_b32: [num_classes, embed_dim] text features
    class_text_features: Optional[jnp.ndarray] = None

    def encode_image(self, x: jnp.ndarray, pooling: str = "avg") -> jnp.ndarray:
        return self.module.apply(
            self.variables, x, pooling, method=self.module.encode_image
        )

    def logits(self, x: jnp.ndarray) -> jnp.ndarray:
        out = self.module.apply(self.variables, x)
        if self.arch == "open_clip_vit_b32":
            assert self.class_text_features is not None, (
                "open_clip_vit_b32 needs class_text_features (zero-shot head)"
            )
            out = zero_shot_logits(out, self.class_text_features)
        return out


def _init(module, input_size: int, lazy: bool = False) -> Any:
    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if lazy:
        # eval_shape + constant fill: no init program to compile. BatchNorm
        # variance must be positive — fill everything with a small positive
        # constant. Bench/compile-check use only.
        shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), dummy)
        return jax.tree.map(lambda s: jnp.full(s.shape, 0.05, s.dtype), shapes)
    return jax.jit(module.init)(jax.random.PRNGKey(0), dummy)


def create_model(
    arch: str,
    num_classes: int,
    pretrained: bool = False,
    class_names: Optional[Sequence[str]] = None,
    weight_path: Optional[str] = None,
    input_size: int = 224,
    class_text_features: Optional[np.ndarray] = None,
    lazy_init: bool = False,
) -> GuideModel:
    """Build a guide model. ``pretrained`` ImageNet initialisation requires a
    converted checkpoint on disk (no network egress); pass ``weight_path``."""
    if arch == "resnet50":
        module = ResNet(resnet50_config(num_classes))
        feature_dim = module.cfg.feature_dim
    elif arch == "resnext50":
        module = ResNet(resnext50_config(num_classes))
        feature_dim = module.cfg.feature_dim
    elif arch == "wideresnet50":
        module = ResNet(wideresnet50_config(num_classes))
        feature_dim = module.cfg.feature_dim
    elif arch == "mobilenetv2":
        module = MobileNetV2(MobileNetV2Config(num_classes=num_classes))
        feature_dim = 1280
    elif arch == "open_clip_vit_b32":
        module = CLIPViT(CLIPViTConfig())
        feature_dim = 512
    elif arch == "tiny_resnet":
        module = ResNet(tiny_resnet_config(num_classes))
        feature_dim = module.cfg.feature_dim
        input_size = min(input_size, 64)
    else:
        raise ValueError(f"unknown arch {arch!r}; expected one of {ARCHS}")

    variables = _init(module, input_size, lazy=lazy_init)
    gm = GuideModel(
        arch=arch,
        module=module,
        variables=variables,
        feature_dim=feature_dim,
        num_classes=num_classes,
        class_text_features=(
            jnp.asarray(class_text_features) if class_text_features is not None else None
        ),
    )
    if weight_path:
        load_weights(gm, weight_path)
    return gm


def build_zero_shot_text_features(
    classnames: Sequence[str],
    template: str = "a photo of a {}.",
    bpe_path: Optional[str] = None,
    config=None,
    variables=None,
) -> np.ndarray:
    """Encode class-template prompts into the CLIP contrastive space — the
    zero-shot head construction of the reference's ``wrap_clip_forward``
    (``model_utils.py:14-27``). With no pretrained text tower this produces
    a mechanically-correct random-feature head (tests/smoke); pass converted
    OpenCLIP ``variables`` for a real head."""
    import jax
    import jax.numpy as jnp

    from distdiff_tpu.config import TextEncoderConfig
    from distdiff_tpu.models.text_encoder import CLIPTextEncoder
    from distdiff_tpu.models.tokenizer import load_tokenizer

    if config is None:
        # CLIP ViT-B/32 text tower geometry
        config = TextEncoderConfig(
            hidden_size=512, num_layers=12, num_heads=8, embed_dim=512,
        )
    te = CLIPTextEncoder(config)
    tok = load_tokenizer(bpe_path, max_length=config.max_length,
                         vocab_size=config.vocab_size)
    ids = jnp.asarray(tok([template.format(c) for c in classnames]))
    if variables is None:
        variables = jax.jit(te.init)(jax.random.PRNGKey(0), ids[:1])
    feats = jax.jit(
        lambda v, i: te.apply(v, i, method=te.encode_pooled)
    )(variables, ids)
    return np.asarray(feats, np.float32)


# ------------------------------------------------------------- checkpoints

def load_weights(gm: GuideModel, path: str) -> None:
    """Load guide weights from an orbax dir, a numpy .npz of the flat tree,
    or a torch ``checkpoint.pth.tar`` (reference format)."""
    if os.path.isdir(path):
        from distdiff_tpu.utils import checkpoints as ckpt

        gm.variables = ckpt.restore_variables(path, gm.variables)
    elif path.endswith(".npz"):
        flat = dict(np.load(path))
        gm.variables = _unflatten_into(gm.variables, flat)
    else:
        gm.variables = _load_torch_state_dict(gm, path)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(template, flat):
    def rebuild(t, prefix=""):
        if isinstance(t, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in t.items()}
        key = prefix[:-1]
        arr = flat[key]
        assert arr.shape == tuple(np.shape(t)), (key, arr.shape, np.shape(t))
        return jnp.asarray(arr)

    return rebuild(template)


def _torch_key_to_ours(key: str) -> Optional[str]:
    """Map torchvision/timm resnet-family state-dict names to our tree.

    The reference strips a ``module.`` DataParallel prefix the same way
    (``model_utils.py:89-102``).
    """
    if key.startswith("module."):
        key = key[len("module."):]
    parts = key.split(".")
    # layerN.M.xxx -> layerN_M/xxx ; downsample.0 -> downsample_conv etc.
    if parts[0].startswith("layer") and len(parts) >= 3:
        block = f"{parts[0]}_{parts[1]}"
        rest = parts[2:]
        if rest[0] == "downsample":
            sub = "downsample_conv" if rest[1] == "0" else "downsample_bn"
            return f"{block}/{sub}/{rest[2]}"
        return f"{block}/{'/'.join(rest)}"
    return "/".join(parts)


def _load_torch_state_dict(gm: GuideModel, path: str):
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]

    params = _flatten(gm.variables.get("params", {}))
    stats = _flatten(gm.variables.get("batch_stats", {}))
    new_params = dict(params)
    new_stats = dict(stats)
    loaded = 0
    for tkey, tval in state.items():
        ours = _torch_key_to_ours(tkey)
        if ours is None:
            continue
        arr = tval.detach().cpu().numpy()
        base, leaf = ours.rsplit("/", 1) if "/" in ours else ("", ours)
        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                cand = f"{base}/kernel" if base else "kernel"
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:  # linear [out,in] -> [in,out]
                cand = f"{base}/kernel" if base else "kernel"
                arr = arr.T
            else:  # bn gamma
                cand = f"{base}/scale" if base else "scale"
        elif leaf == "bias":
            cand = ours
        elif leaf == "running_mean":
            cand = f"{base}/mean"
        elif leaf == "running_var":
            cand = f"{base}/var"
        else:
            continue
        if cand in new_params:
            assert new_params[cand].shape == arr.shape, (tkey, cand, arr.shape)
            new_params[cand] = arr
            loaded += 1
        elif cand in new_stats:
            assert new_stats[cand].shape == arr.shape, (tkey, cand, arr.shape)
            new_stats[cand] = arr
            loaded += 1
    if loaded == 0:
        raise ValueError(f"no weights matched while loading {path}")
    variables = {"params": _unflatten_into(gm.variables["params"], new_params)}
    if "batch_stats" in gm.variables:
        variables["batch_stats"] = _unflatten_into(
            gm.variables["batch_stats"], new_stats
        )
    return variables
