"""Weight-converter mapping tests against jax.eval_shape param templates.

No real SD weights exist in this environment, so correctness is checked
structurally: a synthetic diffusers-style state dict (torch layouts) built
by inverse-mapping our SD-1.5 template must convert back onto the template
with exact path and shape coverage; plus literal spot checks of known
diffusers key names.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distdiff_tpu.config import PipelineConfig
from distdiff_tpu.models import AutoencoderKL, CLIPTextEncoder, UNet2DCondition
from distdiff_tpu.weights.convert import (
    convert_state_dict,
    map_text_key,
    map_unet_key,
    map_vae_key,
    unflatten,
    validate_against_template,
)


@pytest.fixture(scope="module")
def templates():
    cfg = PipelineConfig.sd15()
    unet = UNet2DCondition(cfg.unet)
    vae = AutoencoderKL(cfg.vae)
    text = CLIPTextEncoder(cfg.text_encoder)
    ls = cfg.latent_size
    k = jax.random.PRNGKey(0)
    unet_t = jax.eval_shape(
        unet.init, k, jnp.zeros((1, ls, ls, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]
    vae_t = jax.eval_shape(vae.init, k, jnp.zeros((1, 64, 64, 3)))["params"]
    text_t = jax.eval_shape(text.init, k, jnp.zeros((1, 77), jnp.int32))["params"]
    return unet_t, vae_t, text_t


def _flat_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat_paths(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = tuple(v.shape)
    return out


def _inverse_unet(path):
    """our path -> diffusers key (torch layout)."""
    import re

    k = path
    k = re.sub(r"^down_(\d+)_res_(\d+)/", r"down_blocks.\1.resnets.\2.", k)
    k = re.sub(r"^down_(\d+)_attn_(\d+)/", r"down_blocks.\1.attentions.\2.", k)
    k = re.sub(r"^down_(\d+)_downsample/conv/", r"down_blocks.\1.downsamplers.0.conv.", k)
    k = re.sub(r"^up_(\d+)_res_(\d+)/", r"up_blocks.\1.resnets.\2.", k)
    k = re.sub(r"^up_(\d+)_attn_(\d+)/", r"up_blocks.\1.attentions.\2.", k)
    k = re.sub(r"^up_(\d+)_upsample/conv/", r"up_blocks.\1.upsamplers.0.conv.", k)
    k = re.sub(r"^mid_res_(\d+)/", r"mid_block.resnets.\1.", k)
    k = re.sub(r"^mid_attn/", "mid_block.attentions.0.", k)
    k = re.sub(r"transformer_blocks_(\d+)/", r"transformer_blocks.\1.", k)
    k = k.replace("ff/net_0/proj/", "ff.net.0.proj.")
    k = k.replace("ff/net_2/", "ff.net.2.")
    k = k.replace("to_out/", "to_out.0.")
    k = k.replace("/", ".")
    return k


def _inverse_vae(path):
    import re

    k = path
    k = re.sub(r"^(encoder|decoder)/down_(\d+)_res_(\d+)/", r"\1.down_blocks.\2.resnets.\3.", k)
    k = re.sub(r"^(encoder|decoder)/down_(\d+)_downsample/conv/", r"\1.down_blocks.\2.downsamplers.0.conv.", k)
    k = re.sub(r"^(encoder|decoder)/up_(\d+)_res_(\d+)/", r"\1.up_blocks.\2.resnets.\3.", k)
    k = re.sub(r"^(encoder|decoder)/up_(\d+)_upsample/conv/", r"\1.up_blocks.\2.upsamplers.0.conv.", k)
    k = re.sub(r"^(encoder|decoder)/mid_res_(\d+)/", r"\1.mid_block.resnets.\2.", k)
    k = re.sub(r"^(encoder|decoder)/mid_attn/", r"\1.mid_block.attentions.0.", k)
    k = k.replace("to_out/", "to_out.0.")
    k = k.replace("/", ".")
    return k


def _inverse_text(path):
    import re

    if path == "token_embedding/embedding":
        return "text_model.embeddings.token_embedding.weight"
    if path == "position_embedding":
        return "text_model.embeddings.position_embedding.weight"
    k = re.sub(r"^layers_(\d+)/", r"text_model.encoder.layers.\1.", path)
    k = re.sub(r"(q_proj|k_proj|v_proj|out_proj)", r"self_attn.\1", k)
    k = re.sub(r"(fc1|fc2)", r"mlp.\1", k)
    if k.startswith("final_layer_norm"):
        k = "text_model." + k
    k = k.replace("/", ".")
    return k


def _torch_layout(our_shape, leaf):
    if leaf == "kernel":
        if len(our_shape) == 4:  # HWIO -> OIHW
            h, w, i, o = our_shape
            return (o, i, h, w), "weight"
        i, o = our_shape
        return (o, i), "weight"
    if leaf == "scale":
        return our_shape, "weight"
    if leaf == "embedding":
        return our_shape, None  # name already handled
    return our_shape, leaf  # bias / raw params


def _roundtrip(template, inverse, mapper):
    flat = _flat_paths(template)
    state = {}
    rng = np.random.RandomState(0)
    for path, shape in flat.items():
        parts = path.split("/")
        leaf = parts[-1]
        tshape, tleaf = _torch_layout(shape, leaf)
        base = "/".join(parts[:-1])
        if leaf in ("kernel", "scale"):
            tkey = inverse(f"{base}/weight" if base else "weight")
        elif leaf == "embedding" or path == "position_embedding":
            tkey = inverse(path)
        else:
            tkey = inverse(path)
        state[tkey] = rng.randn(*tshape).astype(np.float32)
    converted = unflatten(convert_state_dict(state, mapper))
    missing, extra, mismatched = validate_against_template(converted, template)
    assert not missing, f"missing {len(missing)}: {missing[:5]}"
    assert not extra, f"extra {len(extra)}: {extra[:5]}"
    assert not mismatched, f"mismatched {len(mismatched)}: {mismatched[:5]}"


def test_unet_converter_roundtrip(templates):
    unet_t, _, _ = templates
    _roundtrip(unet_t, _inverse_unet, map_unet_key)


def test_vae_converter_roundtrip(templates):
    _, vae_t, _ = templates
    _roundtrip(vae_t, _inverse_vae, map_vae_key)


def test_text_converter_roundtrip(templates):
    _, _, text_t = templates
    _roundtrip(text_t, _inverse_text, map_text_key)


def test_known_diffusers_keys_map_into_template(templates):
    """Literal SD-1.5 key names from the published checkpoints."""
    unet_t, vae_t, text_t = templates
    unet_paths = _flat_paths(unet_t)
    vae_paths = _flat_paths(vae_t)
    text_paths = _flat_paths(text_t)

    unet_keys = [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "time_embedding.linear_2.bias",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.norm3.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "down_blocks.3.resnets.1.conv2.weight",
        "mid_block.attentions.0.norm.weight",
        "mid_block.resnets.1.conv_shortcut.weight"
        if "mid_res_1/conv_shortcut/kernel" in unet_paths
        else "mid_block.resnets.1.conv1.weight",
        "up_blocks.1.resnets.2.conv_shortcut.weight",
        "up_blocks.0.resnets.0.norm2.bias",
        "up_blocks.2.upsamplers.0.conv.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]
    for k in unet_keys:
        mapped = map_unet_key(k)
        assert mapped is not None, k
        leaf_is_weight = k.endswith(".weight")
        candidates = (
            [mapped.replace("/weight", s) for s in ("/kernel", "/scale")]
            if leaf_is_weight else [mapped]
        )
        assert any(c in unet_paths for c in candidates), (k, mapped)

    vae_keys = [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.1.downsamplers.0.conv.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.attentions.0.to_out.0.weight",
        "decoder.up_blocks.0.resnets.0.conv1.weight",
        "decoder.up_blocks.3.resnets.2.norm2.bias",
        "quant_conv.weight",
        "post_quant_conv.bias",
    ]
    for k in vae_keys:
        mapped = map_vae_key(k)
        assert mapped is not None, k
        cands = (
            [mapped.replace("/weight", s) for s in ("/kernel", "/scale")]
            if k.endswith(".weight") else [mapped]
        )
        assert any(c in vae_paths for c in cands), (k, mapped)

    text_keys = [
        "text_model.embeddings.token_embedding.weight",
        "text_model.embeddings.position_embedding.weight",
        "text_model.encoder.layers.0.self_attn.q_proj.weight",
        "text_model.encoder.layers.11.mlp.fc2.bias",
        "text_model.encoder.layers.5.layer_norm1.weight",
        "text_model.final_layer_norm.weight",
    ]
    for k in text_keys:
        mapped = map_text_key(k)
        assert mapped is not None, k
        cands = (
            [mapped, mapped.replace("/weight", "/kernel"),
             mapped.replace("/weight", "/scale")]
        )
        assert any(c in text_paths for c in cands), (k, mapped)
