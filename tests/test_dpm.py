"""DPM-Solver++(2M) scheduler: numpy-oracle goldens + pipeline integration.

The oracle below is an INDEPENDENT re-derivation in diffusers style (an
explicit x0-history list, per-step lambda recomputation from the training
tables) of Lu et al. 2022's data-prediction multistep solver — structurally
unlike the jax implementation (gather tables + fori_loop carry), so the two
agreeing is evidence of correctness, not self-confirmation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distdiff_tpu.schedulers import (
    DPMSchedule,
    build_schedule,
    ddim_step,
    denoise_range_dpm,
    dpm_step,
    make_dpm_schedule,
    make_schedule,
)


def _train_tables():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    return np.cumprod(1.0 - betas)


def test_tables():
    sched = make_dpm_schedule(50)
    base = make_schedule(50)
    # identical discretization to the DDIM plan (strength indexing and the
    # guidance window are scheduler-independent)
    np.testing.assert_array_equal(np.asarray(sched.timesteps),
                                  np.asarray(base.timesteps))
    np.testing.assert_allclose(np.asarray(sched.step_alphas),
                               np.asarray(base.step_alphas), rtol=1e-7)
    a = np.asarray(sched.step_alphas, np.float64)
    np.testing.assert_allclose(np.asarray(sched.step_alpha_sqrt),
                               np.sqrt(a), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.step_sigma),
                               np.sqrt(1 - a), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.step_lambda),
                               0.5 * np.log(a / (1 - a)), rtol=1e-5)
    ap = np.asarray(sched.step_alphas_prev, np.float64)
    np.testing.assert_allclose(np.asarray(sched.prev_lambda),
                               0.5 * np.log(ap / (1 - ap)), rtol=1e-5)


def test_build_schedule_factory():
    assert isinstance(build_schedule("dpmpp", 10), DPMSchedule)
    assert not isinstance(build_schedule("ddim", 10), DPMSchedule)
    with pytest.raises(ValueError):
        build_schedule("euler", 10)


def _numpy_dpmpp_2m(n, eps_model, x, prediction_type="epsilon",
                    lower_order_final=True):
    """Independent oracle, diffusers-style (explicit model-output list)."""
    acp = _train_tables()
    ratio = 1000 // n
    timesteps = (np.arange(0, n) * ratio)[::-1] + 1
    final = acp[0]

    def at(t):
        ab = acp[t] if t >= 0 else final
        alpha, sigma = np.sqrt(ab), np.sqrt(1.0 - ab)
        return alpha, sigma, np.log(alpha) - np.log(sigma)

    x = x.astype(np.float64)
    history = []
    for i in range(n):
        t = int(timesteps[i])
        a_s, s_s, lam_s = at(t)
        out = eps_model(x, t).astype(np.float64)
        if prediction_type == "epsilon":
            x0 = (x - s_s * out) / a_s
        else:  # v_prediction
            x0 = a_s * x - s_s * out
        a_t, s_t, lam_t = at(t - ratio)
        h = lam_t - lam_s
        first_order = (not history) or (
            lower_order_final and n < 15 and i == n - 1)
        if first_order:
            d = x0
        else:
            _, _, lam_p = at(int(timesteps[i - 1]))
            h_0 = lam_s - lam_p
            r0 = h_0 / h
            d0, d1 = x0, (x0 - history[-1]) / r0
            d = None  # combined below, diffusers groups terms differently
            x = (s_t / s_s) * x - a_t * np.expm1(-h) * d0 \
                - 0.5 * a_t * np.expm1(-h) * d1
            history.append(x0)
            continue
        x = (s_t / s_s) * x - a_t * np.expm1(-h) * d
        history.append(x0)
    return x


@pytest.mark.parametrize("n", [10, 20])
@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
def test_matches_numpy_oracle(n, prediction_type):
    rng = np.random.RandomState(0)
    c1 = rng.randn(2, 4, 4, 4).astype(np.float32)
    c2 = rng.randn(2, 4, 4, 4).astype(np.float32)

    def eps_np(x, t):
        return 0.3 * x + c1 + (t / 1000.0) * c2

    def eps_fn(params, x, t, cond, uncond):
        del params, cond, uncond
        return 0.3 * x + jnp.asarray(c1) + \
            (t.astype(jnp.float32) / 1000.0) * jnp.asarray(c2)

    sched = make_dpm_schedule(n, prediction_type=prediction_type)
    x0 = rng.randn(2, 4, 4, 4).astype(np.float32)

    got = jax.jit(
        lambda x: denoise_range_dpm(sched, eps_fn, None, x, None, None, 0, n)
    )(jnp.asarray(x0))
    want = _numpy_dpmpp_2m(n, eps_np, x0, prediction_type=prediction_type)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
def test_exact_for_delta_data(prediction_type):
    """For a delta data distribution at c, the exact model output keeps the
    probability-flow trajectory at x_t = alpha_t c + sigma_t e0; DPM-Solver++
    is EXACT there (the x0 prediction is constant), so the solved endpoint
    must land on alpha_end c + sigma_end e0 — a full-tables integration test
    with an analytically known answer."""
    n = 12
    sched = make_dpm_schedule(n, prediction_type=prediction_type)
    rng = np.random.RandomState(1)
    c = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    e0 = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    acp = jnp.asarray(sched.alphas_cumprod)

    def fn(params, x, t, cond, uncond):
        a = jnp.sqrt(acp[t])
        s = jnp.sqrt(1.0 - acp[t])
        eps = (x - a * c) / s
        if prediction_type == "epsilon":
            return eps
        return a * eps - s * c  # v = alpha*eps - sigma*x0

    t0 = sched.timesteps[0]
    x_init = jnp.sqrt(acp[t0]) * c + jnp.sqrt(1.0 - acp[t0]) * e0
    got = jax.jit(
        lambda x: denoise_range_dpm(sched, fn, None, x, None, None, 0, n)
    )(x_init)
    a_end = jnp.sqrt(sched.final_alpha_cumprod)
    s_end = jnp.sqrt(1.0 - sched.final_alpha_cumprod)
    want = a_end * c + s_end * e0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ddim_step_duck_types_on_dpm_schedule():
    """The guidance rollout calls ddim_step(ctx.sched, ...) — a DPMSchedule
    must serve it identically to the DDIM tables (field superset)."""
    dd = make_schedule(10)
    dp = make_dpm_schedule(10)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    e = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    a, b = ddim_step(dd, e, 3, x)
    c, d = ddim_step(dp, e, 3, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(d), rtol=1e-6)


@pytest.mark.parametrize("gtype", ["none", "transform_guidance"])
def test_pipeline_dpmpp(gtype):
    """Tiny-config expansion with scheduler='dpmpp': the fused and split
    programs agree, the output is finite and in range, and it differs from
    the DDIM trajectory (the solver is actually in the loop)."""
    import dataclasses

    from distdiff_tpu.config import GuidanceConfig, PipelineConfig
    from distdiff_tpu.models.guide import create_model
    from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

    rng = np.random.RandomState(0)
    guide = create_model("tiny_resnet", num_classes=3, input_size=32)
    gp = rng.randn(3, guide.feature_dim).astype(np.float32)
    lp = rng.randn(3, 2, guide.feature_dim).astype(np.float32)

    def build(scheduler):
        cfg = dataclasses.replace(PipelineConfig.tiny(sample_size=32),
                                  scheduler=scheduler)
        return ExpansionPipeline.create(
            cfg,
            sampler_cfg=SamplerConfig(guidance_scale=3.0),
            guidance_cfg=GuidanceConfig(
                guidance_type=gtype, guidance_step=4, guidance_period=2,
                K=2, guide_input_size=32, rho=0.5,
            ),
            guide=guide, global_protos=gp, local_protos=lp, seed=0,
        )

    pipe = build("dpmpp")
    assert isinstance(pipe.sched, DPMSchedule)
    params = pipe.full_params()
    ls = pipe.config.latent_size
    r2 = np.random.RandomState(1)
    lat = jnp.asarray(r2.randn(2, ls, ls, 4), jnp.float32) * 0.2
    cond = jnp.asarray(r2.randn(2, 8, 32), jnp.float32)
    uncond = jnp.asarray(r2.randn(2, 8, 32), jnp.float32)
    targets = jnp.asarray([0, 2])
    keys = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(9)])

    fused = jax.jit(pipe.make_expand_fn())
    a = fused(params, lat, cond, uncond, targets, keys)
    assert np.all(np.isfinite(np.asarray(a)))
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0

    split = pipe.make_split_expand()
    b = split(params, lat, cond, uncond, targets, keys)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    ddim_pipe = build("ddim")
    c = jax.jit(ddim_pipe.make_expand_fn())(
        params, lat, cond, uncond, targets, keys)
    assert float(jnp.abs(a - c).max()) > 1e-4


def test_sdxl_tiny_dpmpp():
    """The SDXL sampling loop rides the same denoise_range dispatch."""
    import dataclasses

    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.sampling.sdxl import SDXLPipeline, default_time_ids

    cfg = dataclasses.replace(PipelineConfig.sdxl_tiny(sample_size=32),
                              scheduler="dpmpp")
    pipe = SDXLPipeline.create(cfg, seed=0)
    assert isinstance(pipe.sched, DPMSchedule)
    rng = np.random.RandomState(0)
    ls = cfg.latent_size
    lat = jnp.asarray(rng.randn(1, ls, ls, 4), jnp.float32)
    d = cfg.unet.cross_attention_dim
    ctx = jnp.asarray(rng.randn(1, 8, d), jnp.float32)
    uctx = jnp.asarray(rng.randn(1, 8, d), jnp.float32)
    pooled = jnp.asarray(rng.randn(1, cfg.text_encoder_2.embed_dim),
                         jnp.float32)
    add = pipe.added_cond(pooled, default_time_ids(1, 32))
    uadd = pipe.added_cond(jnp.zeros_like(pooled), default_time_ids(1, 32))
    sample = jax.jit(pipe.make_sample_fn(text_to_img=True))
    img = sample(pipe.params, lat, ctx, add, uctx, uadd,
                 jax.random.PRNGKey(0))
    assert img.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_traced_bounds():
    """SplitExpand's span program passes traced (lo, hi) scalars."""
    sched = make_dpm_schedule(10)

    def eps_fn(params, x, t, cond, uncond):
        return 0.1 * x

    x = jnp.ones((1, 2, 2, 4), jnp.float32)

    @jax.jit
    def run(lo, hi):
        return denoise_range_dpm(sched, eps_fn, None, x, None, None, lo, hi)

    full = run(jnp.int32(0), jnp.int32(10))
    assert np.all(np.isfinite(np.asarray(full)))
    # zero-length traced range is a no-op
    np.testing.assert_allclose(np.asarray(run(jnp.int32(4), jnp.int32(4))),
                               np.asarray(x))
