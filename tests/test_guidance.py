"""Energy functions + guided pipeline end-to-end on the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distdiff_tpu.config import GuidanceConfig, PipelineConfig
from distdiff_tpu.guidance import hierarchical_energy
from distdiff_tpu.models.guide import create_model
from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig


def test_hierarchical_energy_matches_numpy():
    rng = np.random.RandomState(0)
    B, D, C, K = 4, 8, 3, 2
    feats = rng.randn(B, D).astype(np.float32)
    targets = np.array([0, 1, 2, 1])
    gp = rng.randn(C, D).astype(np.float32)
    lp = rng.randn(C, K, D).astype(np.float32)

    # numpy oracle mirroring generate_data.py:707-717
    g_ref = np.mean([np.linalg.norm(feats[b] - gp[targets[b]]) for b in range(B)])
    l_ref = []
    for b in range(B):
        protos = lp[targets[b]]
        k = int(np.argmax(protos @ feats[b]))
        l_ref.append(np.linalg.norm(feats[b] - protos[k]))
    l_ref = np.mean(l_ref)

    for gs, ls in [(1.0, 1.0), (2.5, 0.5), (0.0, 1.0)]:
        e = hierarchical_energy(
            jnp.asarray(feats), jnp.asarray(targets), jnp.asarray(gp),
            jnp.asarray(lp), gs=gs, ls=ls,
        )
        np.testing.assert_allclose(float(e), gs * g_ref + ls * l_ref, rtol=1e-5)

    # disabled components
    e = hierarchical_energy(jnp.asarray(feats), jnp.asarray(targets), None, None)
    assert float(e) == 0.0


def _tiny_pipeline(guidance_type):
    cfg = PipelineConfig.tiny(sample_size=32)
    guide = create_model("tiny_resnet", num_classes=3, input_size=32)
    rng = np.random.RandomState(0)
    gp = rng.randn(3, guide.feature_dim).astype(np.float32)
    lp = rng.randn(3, 2, guide.feature_dim).astype(np.float32)
    gcfg = GuidanceConfig(
        guidance_type=guidance_type,
        guidance_step=4,
        guidance_period=2,
        K=2,
        guide_input_size=32,
        rho=0.5,
    )
    return ExpansionPipeline.create(
        cfg,
        sampler_cfg=SamplerConfig(guidance_scale=3.0),
        guidance_cfg=gcfg,
        guide=guide,
        global_protos=gp,
        local_protos=lp,
        strength=0.5,
    )


@pytest.mark.parametrize("gtype", ["none", "transform_guidance", "direct_guidance"])
def test_expand_runs_and_is_deterministic(gtype):
    pipe = _tiny_pipeline(gtype)
    expand = jax.jit(pipe.make_expand_fn())
    params = pipe.full_params()
    ls = pipe.config.latent_size
    rng = np.random.RandomState(1)
    lat = jnp.asarray(rng.randn(1, ls, ls, 4), jnp.float32) * 0.2
    cond = jnp.asarray(rng.randn(1, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(1, 8, 32), jnp.float32)
    targets = jnp.asarray([1])
    key = jax.random.PRNGKey(7)

    img = expand(params, lat, cond, uncond, targets, key)
    assert img.shape == (1, 32, 32, 3)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
    img2 = expand(params, lat, cond, uncond, targets, key)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-6)


def test_guidance_changes_output():
    pipe_g = _tiny_pipeline("transform_guidance")
    pipe_n = _tiny_pipeline("none")
    # same params for both (create() is seeded identically)
    params = pipe_g.full_params()
    ls = pipe_g.config.latent_size
    rng = np.random.RandomState(1)
    lat = jnp.asarray(rng.randn(1, ls, ls, 4), jnp.float32) * 0.2
    cond = jnp.asarray(rng.randn(1, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(1, 8, 32), jnp.float32)
    targets = jnp.asarray([0])
    key = jax.random.PRNGKey(7)

    out_g = jax.jit(pipe_g.make_expand_fn())(params, lat, cond, uncond, targets, key)
    out_n = jax.jit(pipe_n.make_expand_fn())(params, lat, cond, uncond, targets, key)
    assert float(jnp.abs(out_g - out_n).max()) > 1e-6


def test_transform_guidance_linf_constraint():
    from distdiff_tpu.guidance import transform_guidance

    pipe = _tiny_pipeline("transform_guidance")
    ctx = pipe.guidance_context()
    params = pipe.full_params()
    ls = pipe.config.latent_size
    rng = np.random.RandomState(2)
    lat = jnp.asarray(rng.randn(1, ls, ls, 4), jnp.float32)
    cond = jnp.asarray(rng.randn(1, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(1, 8, 32), jnp.float32)
    g0 = 6  # window for guidance_step=4, period=2 in a 10-step plan
    new_lat, score = jax.jit(
        lambda *a: transform_guidance(ctx, *a, window_start=g0)
    )(params, lat, cond, uncond, jnp.asarray([2]), jax.random.PRNGKey(0))
    assert new_lat.shape == lat.shape
    assert score.shape == (1,)  # per-sample scores
    assert bool(np.isfinite(np.asarray(score)).all())
    # l-inf ball around the original latents (constraint_value=0.2 default)
    max_dev = float(jnp.abs(new_lat - lat).max())
    assert max_dev <= 0.2 + 1e-5, max_dev
    # and the update actually moved the latents
    assert max_dev > 1e-7


def test_rollout_remat_modes_equivalent():
    """"step_nru"/"step_nr" swap in no-inner-remat module instances for the
    guidance rollout (pipeline.guidance_context) — same math, different
    rematerialisation schedule, so outputs must match "step" closely."""
    import dataclasses

    from distdiff_tpu.guidance import transform_guidance

    pipe = _tiny_pipeline("transform_guidance")
    params = pipe.full_params()
    ls = pipe.config.latent_size
    rng = np.random.RandomState(3)
    lat = jnp.asarray(rng.randn(2, ls, ls, 4), jnp.float32)
    cond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    targets = jnp.asarray([0, 1])
    # per-sample keys: an old-style PRNGKey has shape (2,) which would
    # collide with the batch-2 per-sample-key detection in transform_guidance
    key = jax.random.split(jax.random.PRNGKey(4), 2)
    outs = {}
    for mode in ("step", "step_nru", "step_nr", "tail", "decode_nr",
                 "tail_decode_nr"):
        pipe.guidance_cfg = dataclasses.replace(
            pipe.guidance_cfg, rollout_remat=mode
        )
        ctx = pipe.guidance_context()
        out, score = jax.jit(
            lambda *a: transform_guidance(ctx, *a, window_start=6)
        )(params, lat, cond, uncond, targets, key)
        outs[mode] = (np.asarray(out), np.asarray(score))
    for mode in ("step_nru", "step_nr", "tail", "decode_nr",
                 "tail_decode_nr"):
        np.testing.assert_allclose(
            outs[mode][0], outs["step"][0], rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            outs[mode][1], outs["step"][1], rtol=2e-3, atol=2e-4
        )
