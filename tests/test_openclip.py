"""OpenCLIP ViT-B/32 weight conversion (VERDICT r1 #5).

Anchors:
  * the enumerated state-dict geometry sums to the published CLIP ViT-B/32
    parameter total (151,277,313 incl. logit_scale);
  * a full-geometry synthetic OpenCLIP state dict converts onto our
    CLIPViT + CLIPTextEncoder templates 0/0/0;
  * NUMERIC oracle: the converted text tower matches HF ``transformers``
    CLIPTextModel loaded with the same values (independent implementation
    of the same published architecture);
  * create_model('open_clip_vit_b32', weight_path=...) produces a real
    zero-shot head from class names (reference model_utils.py:74-85).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from distdiff_tpu.weights.openclip import (  # noqa: E402
    CLIP_VIT_B32_TOTAL,
    convert_openclip,
    openclip_vit_b32_state_shapes,
)


def test_enumeration_matches_published_total():
    shapes = openclip_vit_b32_state_shapes()
    total = sum(int(np.prod(s)) for s in shapes.values())
    assert total == CLIP_VIT_B32_TOTAL, total


def _synth_state(shapes, seed=0, scale=0.02):
    rng = np.random.default_rng(seed)
    return {k: np.asarray(rng.standard_normal(s) * scale, np.float32)
            for k, s in shapes.items()}


def test_full_b32_conversion_covers_both_towers():
    from distdiff_tpu.config import TextEncoderConfig
    from distdiff_tpu.models.guide.clip_vit import CLIPViT, CLIPViTConfig
    from distdiff_tpu.models.text_encoder import CLIPTextEncoder
    from distdiff_tpu.weights.convert import validate_against_template

    state = _synth_state(openclip_vit_b32_state_shapes())
    visual, text, logit_scale = convert_openclip(state)
    assert logit_scale is not None

    vit = CLIPViT(CLIPViTConfig())
    vt = jax.eval_shape(
        vit.init, jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )["params"]
    m, e, x = validate_against_template(visual, vt)
    assert not (m or e or x), (m[:5], e[:5], x[:5])

    te = CLIPTextEncoder(TextEncoderConfig(
        hidden_size=512, num_layers=12, num_heads=8, embed_dim=512,
    ))
    tt = jax.eval_shape(
        te.init, jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    m, e, x = validate_against_template(text, tt)
    assert not (m or e or x), (m[:5], e[:5], x[:5])


def test_text_tower_matches_transformers_numerically():
    """Same synthetic weights through our converted CLIPTextEncoder and HF's
    CLIPTextModel must agree — an independent implementation oracle."""
    transformers = pytest.importorskip("transformers")
    import torch

    d, layers, heads, vocab, ctx = 64, 2, 4, 100, 16
    shapes = openclip_vit_b32_state_shapes(
        vw=32, vlayers=1, tw=d, tlayers=layers, embed=32,
        vocab=vocab, ctx_len=ctx,
    )
    state = _synth_state(shapes, seed=7, scale=0.05)
    _, text, _ = convert_openclip(state)

    from distdiff_tpu.config import TextEncoderConfig
    from distdiff_tpu.models.text_encoder import CLIPTextEncoder

    cfg = TextEncoderConfig(
        vocab_size=vocab, hidden_size=d, num_layers=layers, num_heads=heads,
        max_length=ctx, embed_dim=32, activation="quick_gelu",
        dtype=jnp.float32,
    )
    te = CLIPTextEncoder(cfg)
    ids = np.array([[1, 5, 9, 42, 99, 3, 0, 7, 2, 11, 13, 17, 19, 23, 29, 31]],
                   np.int32)
    ours = np.asarray(te.apply({"params": text}, jnp.asarray(ids)))

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=vocab, hidden_size=d, intermediate_size=4 * d,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=ctx, hidden_act="quick_gelu",
    )
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    sd = {}
    sd["text_model.embeddings.token_embedding.weight"] = state["token_embedding.weight"]
    sd["text_model.embeddings.position_embedding.weight"] = state["positional_embedding"]
    sd["text_model.final_layer_norm.weight"] = state["ln_final.weight"]
    sd["text_model.final_layer_norm.bias"] = state["ln_final.bias"]
    for i in range(layers):
        src = f"transformer.resblocks.{i}"
        dst = f"text_model.encoder.layers.{i}"
        w = state[f"{src}.attn.in_proj_weight"]
        b = state[f"{src}.attn.in_proj_bias"]
        for j, n in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[f"{dst}.self_attn.{n}.weight"] = w[j * d:(j + 1) * d]
            sd[f"{dst}.self_attn.{n}.bias"] = b[j * d:(j + 1) * d]
        sd[f"{dst}.self_attn.out_proj.weight"] = state[f"{src}.attn.out_proj.weight"]
        sd[f"{dst}.self_attn.out_proj.bias"] = state[f"{src}.attn.out_proj.bias"]
        sd[f"{dst}.layer_norm1.weight"] = state[f"{src}.ln_1.weight"]
        sd[f"{dst}.layer_norm1.bias"] = state[f"{src}.ln_1.bias"]
        sd[f"{dst}.mlp.fc1.weight"] = state[f"{src}.mlp.c_fc.weight"]
        sd[f"{dst}.mlp.fc1.bias"] = state[f"{src}.mlp.c_fc.bias"]
        sd[f"{dst}.mlp.fc2.weight"] = state[f"{src}.mlp.c_proj.weight"]
        sd[f"{dst}.mlp.fc2.bias"] = state[f"{src}.mlp.c_proj.bias"]
        sd[f"{dst}.layer_norm2.weight"] = state[f"{src}.ln_2.weight"]
        sd[f"{dst}.layer_norm2.bias"] = state[f"{src}.ln_2.bias"]
    hf.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
                       strict=False)
    with torch.no_grad():
        theirs = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-4, rtol=1e-3)


def test_create_model_builds_real_zero_shot_head(tmp_path):
    from safetensors.numpy import save_file

    from distdiff_tpu.models.guide import create_model

    # small-but-real-structure checkpoint (B/32 names, shrunken dims match
    # the tiny CLIPViT config used for the guide? No — the factory builds the
    # full B/32 geometry, so ship full-geometry weights)
    state = _synth_state(openclip_vit_b32_state_shapes(), seed=1)
    path = str(tmp_path / "openclip_b32.safetensors")
    save_file(state, path)

    # a real (minimal) merges file: the factory is STRICT about real text
    # towers — the hash-tokenizer fallback would raise (round-3 fix)
    bpe = tmp_path / "merges.txt"
    bpe.write_text("#version: 0.2\nc a</w>\nd o\ndo g</w>\n")

    gm = create_model(
        "open_clip_vit_b32", num_classes=3, weight_path=path,
        class_names=["cat", "dog", "bird"], bpe_path=str(bpe),
    )
    assert gm.text_variables is not None
    assert gm.logit_scale is not None
    assert gm.class_text_features is not None
    assert gm.class_text_features.shape == (3, 512)
    # the head is data-dependent, not random-identical rows
    f = np.asarray(gm.class_text_features)
    assert np.isfinite(f).all()
    assert not np.allclose(f[0], f[1])
