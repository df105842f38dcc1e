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
    # converted OpenCLIP text tower (set when an OpenCLIP checkpoint was
    # loaded) — used to build a REAL zero-shot head from class names
    text_variables: Optional[Any] = None
    logit_scale: Optional[float] = None
    # MLP activation of the loaded text tower: laion2b towers (the
    # reference's default checkpoint) use plain gelu; original OpenAI CLIP
    # releases use quick_gelu. Detected at load time (_load_openclip_into).
    text_activation: str = "gelu"

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
    bpe_path: Optional[str] = None,
    tokenizer_checkpoint_dir: Optional[str] = None,
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
    if (arch == "open_clip_vit_b32" and gm.class_text_features is None
            and class_names is not None and gm.text_variables is not None):
        # real zero-shot head from the converted OpenCLIP text tower
        # (reference model_utils.py:74-85). Real text weights demand real
        # token ids: load_tokenizer runs strict (hash fallback raises).
        gm.class_text_features = jnp.asarray(build_zero_shot_text_features(
            class_names, variables=gm.text_variables, bpe_path=bpe_path,
            checkpoint_dir=tokenizer_checkpoint_dir,
            activation=gm.text_activation,
        ))
    return gm


def build_zero_shot_text_features(
    classnames: Sequence[str],
    template: str = "a photo of a {}.",
    bpe_path: Optional[str] = None,
    config=None,
    variables=None,
    activation: str = "gelu",
    checkpoint_dir: Optional[str] = None,
    strict: Optional[bool] = None,
) -> np.ndarray:
    """Encode class-template prompts into the CLIP contrastive space — the
    zero-shot head construction of the reference's ``wrap_clip_forward``
    (``model_utils.py:14-27``). Pass converted OpenCLIP ``variables``
    (``GuideModel.text_variables``) for a real head; with no pretrained text
    tower this produces a mechanically-correct random-feature head
    (tests/smoke only). ``activation``: the reference's default checkpoint
    is laion2b (plain gelu); OpenAI-CLIP towers use quick_gelu — pass
    ``GuideModel.text_activation`` (detected at load time).

    ``strict`` defaults to ``variables is not None``: a REAL text tower with
    hash-fallback token ids would yield garbage features silently, so the
    tokenizer lookup raises unless a merges file is found (``bpe_path``,
    ``$DISTDIFF_CLIP_BPE`` or ``checkpoint_dir/tokenizer/merges.txt``)."""
    import logging

    import jax
    import jax.numpy as jnp

    from distdiff_tpu.config import TextEncoderConfig
    from distdiff_tpu.models.text_encoder import CLIPTextEncoder
    from distdiff_tpu.models.tokenizer import load_tokenizer

    if strict is None:
        strict = variables is not None
    if variables is not None:
        logging.getLogger("distdiff.guide").info(
            "zero-shot head: encoding %d class prompts with a real text "
            "tower (activation=%s)", len(classnames), activation)
    if config is None:
        # CLIP ViT-B/32 text tower geometry
        config = TextEncoderConfig(
            hidden_size=512, num_layers=12, num_heads=8, embed_dim=512,
            activation=activation, dtype=jnp.float32,
        )
    te = CLIPTextEncoder(config)
    tok = load_tokenizer(bpe_path, max_length=config.max_length,
                         vocab_size=config.vocab_size,
                         checkpoint_dir=checkpoint_dir, strict=strict)
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
    or a torch ``checkpoint.pth.tar`` (reference format). OpenCLIP
    checkpoints (keys under ``visual.*`` — the reference's
    ``save/open_clip_vit_b32_*_pretrained.pth``) are detected and converted
    to BOTH towers."""
    if os.path.isdir(path):
        from distdiff_tpu.utils import checkpoints as ckpt

        gm.variables = ckpt.restore_variables(path, gm.variables)
    elif path.endswith(".npz"):
        flat = dict(np.load(path))
        gm.variables = _unflatten_into(gm.variables, flat)
    else:
        state = _read_torch_state(path)
        if any(k.startswith("visual.") for k in state):
            _load_openclip_into(gm, state)
        else:
            gm.variables = _load_torch_state_dict(gm, state, path)


def _read_torch_state(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return state


def _load_openclip_into(gm: GuideModel, state) -> None:
    import logging

    from distdiff_tpu.weights.openclip import convert_openclip

    # OpenAI CLIP releases (TorchScript .pt state dicts) carry scalar
    # buffers like input_resolution/context_length/vocab_size that open_clip
    # laion checkpoints lack — the same heuristic open_clip itself uses to
    # pick quick_gelu. Wrong activation = subtly wrong text features.
    openai_markers = {"input_resolution", "context_length", "vocab_size"}
    is_openai = bool(openai_markers & set(state))
    state = {
        (k[len("module."):] if k.startswith("module.") else k):
        (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state.items()
        if k.split("module.")[-1] not in openai_markers
    }
    visual, text, logit_scale = convert_openclip(state)
    gm.variables = _retree_like(gm.variables, {"params": visual})
    gm.text_variables = {"params": text}
    gm.logit_scale = logit_scale
    gm.text_activation = "quick_gelu" if is_openai else "gelu"
    logging.getLogger("distdiff.guide").info(
        "OpenCLIP checkpoint loaded (%s flavor -> text activation %s)",
        "OpenAI" if is_openai else "open_clip/laion", gm.text_activation)


def _retree_like(template, new):
    """Shape-check ``new`` against ``template`` and cast leaves to jnp."""
    t_flat = _flatten(template)
    n_flat = _flatten(new)
    missing = sorted(set(t_flat) - set(n_flat))
    extra = sorted(set(n_flat) - set(t_flat))
    mismatched = [k for k in t_flat if k in n_flat
                  and tuple(np.shape(n_flat[k])) != tuple(np.shape(t_flat[k]))]
    if missing or extra or mismatched:
        raise ValueError(
            f"OpenCLIP conversion mismatch: missing {missing[:5]}, "
            f"extra {extra[:5]}, mismatched {mismatched[:5]}"
        )
    return _unflatten_into(template, n_flat)


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
    """Map torchvision/timm resnet-family AND mobilenetv2 state-dict names
    to our tree (OpenCLIP goes through ``weights.openclip`` instead).

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
    if parts[0] == "features":  # torchvision mobilenet_v2
        return _mobilenet_torch_key(parts)
    if parts[0] == "classifier" and len(parts) == 3:
        # classifier.1.{weight,bias} (index 0 is Dropout)
        return f"classifier/{parts[2]}"
    return "/".join(parts)


def _mobilenet_torch_key(parts) -> Optional[str]:
    """torchvision ``features.*`` -> our MobileNetV2 names. Block layout:
    features.0 stem, features.1..17 inverted residuals (features.1 has no
    expand conv), features.18 head."""
    fi = int(parts[1])
    leaf = parts[-1]
    if fi == 0:
        return f"{'stem_conv' if parts[2] == '0' else 'stem_bn'}/{leaf}"
    if fi == 18:
        return f"{'head_conv' if parts[2] == '0' else 'head_bn'}/{leaf}"
    block = f"block_{fi - 1}"
    sub = parts[3:-1]  # between 'conv' and the leaf
    if fi == 1:  # expand==1: conv.0.0 dw, conv.0.1 dw_bn, conv.1, conv.2
        table = {("0", "0"): "dw_conv", ("0", "1"): "dw_bn",
                 ("1",): "project_conv", ("2",): "project_bn"}
    else:
        table = {("0", "0"): "expand_conv", ("0", "1"): "expand_bn",
                 ("1", "0"): "dw_conv", ("1", "1"): "dw_bn",
                 ("2",): "project_conv", ("3",): "project_bn"}
    name = table.get(tuple(sub))
    if name is None:
        return None
    return f"{block}/{name}/{leaf}"


def _load_torch_state_dict(gm: GuideModel, state, path: str):
    params = _flatten(gm.variables.get("params", {}))
    stats = _flatten(gm.variables.get("batch_stats", {}))
    new_params = dict(params)
    new_stats = dict(stats)
    loaded = 0
    for tkey, tval in state.items():
        ours = _torch_key_to_ours(tkey)
        if ours is None:
            continue
        arr = (tval.detach().cpu().numpy() if hasattr(tval, "detach")
               else np.asarray(tval))
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
