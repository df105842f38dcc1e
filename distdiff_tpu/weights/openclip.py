"""OpenCLIP ViT-B/32 checkpoint -> our CLIPViT (image) + CLIPTextEncoder
(text) parameter trees.

The reference's DEFAULT guide arch is ``open_clip_vit_b32`` with pretrained
towers (``model_utils.py:74-85``, ``generate_data.py:195-201``). This
converter takes the standard OpenCLIP/OpenAI-CLIP state dict (``visual.*``
image tower, ``transformer.*``/``token_embedding``/``text_projection`` text
tower, joint ``logit_scale``) and emits both trees, so ``-a
open_clip_vit_b32`` gets a REAL zero-shot head built from converted text
features instead of a random one.

Key structural move: torch's fused ``attn.in_proj_weight`` [3d, d] splits
into our separate q/k/v Dense kernels ([d, d] transposed each).

The enumerated key/shape set is anchored to the published CLIP ViT-B/32
parameter total (151,277,313 incl. logit_scale) in tests.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from distdiff_tpu.weights.convert import unflatten

Shape = Tuple[int, ...]


# ----------------------------------------------------------- enumeration

def _tower_shapes(prefix: str, width: int, layers: int,
                  out: Dict[str, Shape]) -> None:
    for i in range(layers):
        p = f"{prefix}.resblocks.{i}"
        out[f"{p}.ln_1.weight"] = (width,)
        out[f"{p}.ln_1.bias"] = (width,)
        out[f"{p}.attn.in_proj_weight"] = (3 * width, width)
        out[f"{p}.attn.in_proj_bias"] = (3 * width,)
        out[f"{p}.attn.out_proj.weight"] = (width, width)
        out[f"{p}.attn.out_proj.bias"] = (width,)
        out[f"{p}.ln_2.weight"] = (width,)
        out[f"{p}.ln_2.bias"] = (width,)
        out[f"{p}.mlp.c_fc.weight"] = (4 * width, width)
        out[f"{p}.mlp.c_fc.bias"] = (4 * width,)
        out[f"{p}.mlp.c_proj.weight"] = (width, 4 * width)
        out[f"{p}.mlp.c_proj.bias"] = (width,)


def openclip_vit_b32_state_shapes(
    image_size: int = 224, patch: int = 32, vw: int = 768, vlayers: int = 12,
    tw: int = 512, tlayers: int = 12, embed: int = 512,
    vocab: int = 49408, ctx_len: int = 77,
) -> Dict[str, Shape]:
    grid = image_size // patch
    out: Dict[str, Shape] = {
        "logit_scale": (),
        "visual.conv1.weight": (vw, 3, patch, patch),
        "visual.class_embedding": (vw,),
        "visual.positional_embedding": (grid * grid + 1, vw),
        "visual.ln_pre.weight": (vw,),
        "visual.ln_pre.bias": (vw,),
        "visual.ln_post.weight": (vw,),
        "visual.ln_post.bias": (vw,),
        "visual.proj": (vw, embed),
        "token_embedding.weight": (vocab, tw),
        "positional_embedding": (ctx_len, tw),
        "ln_final.weight": (tw,),
        "ln_final.bias": (tw,),
        "text_projection": (tw, embed),
    }
    _tower_shapes("visual.transformer", vw, vlayers, out)
    _tower_shapes("transformer", tw, tlayers, out)
    return out


CLIP_VIT_B32_TOTAL = 151_277_313


# ------------------------------------------------------------ conversion

def _convert_block(flat: Dict[str, np.ndarray], src: str, dst: str,
                   names: Dict[str, str], arr_key: str,
                   arr: np.ndarray) -> bool:
    """Map one ``{src}.resblocks.N.*`` tensor into ``flat``; True if taken."""
    import re

    m = re.match(rf"^{re.escape(src)}\.resblocks\.(\d+)\.(.+)$", arr_key)
    if not m:
        return False
    i, rest = m.group(1), m.group(2)
    base = f"{dst}_{i}"
    if rest == "attn.in_proj_weight":
        d = arr.shape[1]
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            flat[f"{base}/{proj}/kernel"] = arr[j * d:(j + 1) * d].T
    elif rest == "attn.in_proj_bias":
        d = arr.shape[0] // 3
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            flat[f"{base}/{proj}/bias"] = arr[j * d:(j + 1) * d]
    elif rest == "attn.out_proj.weight":
        flat[f"{base}/{names['out_proj']}/kernel"] = arr.T
    elif rest == "attn.out_proj.bias":
        flat[f"{base}/{names['out_proj']}/bias"] = arr
    elif rest == "mlp.c_fc.weight":
        flat[f"{base}/{names['c_fc']}/kernel"] = arr.T
    elif rest == "mlp.c_fc.bias":
        flat[f"{base}/{names['c_fc']}/bias"] = arr
    elif rest == "mlp.c_proj.weight":
        flat[f"{base}/{names['c_proj']}/kernel"] = arr.T
    elif rest == "mlp.c_proj.bias":
        flat[f"{base}/{names['c_proj']}/bias"] = arr
    elif rest in ("ln_1.weight", "ln_1.bias", "ln_2.weight", "ln_2.bias"):
        ln, leaf = rest.split(".")
        leaf = "scale" if leaf == "weight" else "bias"
        flat[f"{base}/{names[ln]}/{leaf}"] = arr
    else:
        return False
    return True


_VISUAL_NAMES = {"out_proj": "out_proj", "c_fc": "c_fc", "c_proj": "c_proj",
                 "ln_1": "ln_1", "ln_2": "ln_2"}
_TEXT_NAMES = {"out_proj": "out_proj", "c_fc": "fc1", "c_proj": "fc2",
               "ln_1": "layer_norm1", "ln_2": "layer_norm2"}


def convert_openclip(
    state: Dict[str, np.ndarray],
) -> Tuple[Dict[str, Any], Dict[str, Any], Optional[float]]:
    """(visual_params, text_params, logit_scale) from an OpenCLIP state dict.

    visual_params fits ``models.guide.clip_vit.CLIPViT``; text_params fits
    ``models.text_encoder.CLIPTextEncoder`` with the B/32 text geometry
    (width 512, 12 layers, 8 heads, embed_dim 512, quick_gelu).
    """
    visual: Dict[str, np.ndarray] = {}
    text: Dict[str, np.ndarray] = {}
    logit_scale: Optional[float] = None
    unused = []
    for key, t in state.items():
        arr = np.asarray(t)
        if key == "logit_scale":
            logit_scale = float(np.exp(arr))
        elif key == "visual.conv1.weight":
            visual["patch_embed/kernel"] = arr.transpose(2, 3, 1, 0)
        elif key == "visual.class_embedding":
            visual["class_embedding"] = arr
        elif key == "visual.positional_embedding":
            visual["positional_embedding"] = arr
        elif key in ("visual.ln_pre.weight", "visual.ln_pre.bias",
                     "visual.ln_post.weight", "visual.ln_post.bias"):
            _, ln, leaf = key.split(".")
            visual[f"{ln}/{'scale' if leaf == 'weight' else 'bias'}"] = arr
        elif key == "visual.proj":
            visual["proj"] = arr  # already [width, embed]: h @ proj
        elif key.startswith("visual.transformer."):
            if not _convert_block(visual, "visual.transformer", "resblocks",
                                  _VISUAL_NAMES, key, arr):
                unused.append(key)
        elif key == "token_embedding.weight":
            text["token_embedding/embedding"] = arr
        elif key == "positional_embedding":
            text["position_embedding"] = arr
        elif key in ("ln_final.weight", "ln_final.bias"):
            leaf = key.split(".")[1]
            text[f"final_layer_norm/{'scale' if leaf == 'weight' else 'bias'}"] = arr
        elif key == "text_projection":
            text["text_projection"] = arr  # [width, embed]: pooled @ proj
        elif key.startswith("transformer."):
            if not _convert_block(text, "transformer", "layers",
                                  _TEXT_NAMES, key, arr):
                unused.append(key)
        elif "attn_mask" in key or key.endswith("position_ids"):
            continue  # constant buffers
        else:
            unused.append(key)
    if unused:
        import logging

        logging.getLogger("distdiff.convert").warning(
            "openclip: %d unconverted keys (first: %s)", len(unused),
            unused[:3],
        )
    return unflatten(visual), unflatten(text), logit_scale


def load_openclip_checkpoint(path: str):
    """Load a .pt/.bin/.safetensors OpenCLIP checkpoint from disk and
    convert. Returns (visual_params, text_params, logit_scale)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path)
    else:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        state = {
            k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state.items()
        }
        state = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
                 for k, v in state.items()}
    return convert_openclip(state)
