"""Golden tests for the DDIM schedule against an independent numpy oracle."""

import numpy as np
import jax.numpy as jnp

from distdiff_tpu.schedulers import (
    add_noise,
    ddim_step,
    guidance_window,
    img2img_start_index,
    make_schedule,
)


def _oracle_tables():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    return np.cumprod(1.0 - betas)


def test_timestep_plan_matches_sd_leading_spacing():
    sched = make_schedule(50)
    ts = np.asarray(sched.timesteps)
    expected = np.arange(0, 50)[::-1] * 20 + 1  # 981, 961, ..., 21, 1
    np.testing.assert_array_equal(ts, expected)
    assert ts[0] == 981 and ts[-1] == 1


def test_alpha_tables():
    sched = make_schedule(50)
    acp = _oracle_tables()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-6)
    # set_alpha_to_one=False -> final alpha-bar is alphas_cumprod[0]
    np.testing.assert_allclose(float(sched.final_alpha_cumprod), acp[0], rtol=1e-6)
    # previous-step alphas: step i at t has prev t-20
    ts = np.asarray(sched.timesteps)
    prev = ts - 20
    exp_prev = np.where(prev >= 0, acp[np.clip(prev, 0, None)], acp[0])
    np.testing.assert_allclose(np.asarray(sched.step_alphas_prev), exp_prev, rtol=1e-6)


def test_ddim_step_matches_closed_form():
    rng = np.random.RandomState(0)
    sched = make_schedule(50)
    acp = _oracle_tables()
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    eps = rng.randn(2, 8, 8, 4).astype(np.float32)

    for i in [0, 17, 30, 49]:
        t = int(np.asarray(sched.timesteps)[i])
        a_t = acp[t]
        a_prev = acp[t - 20] if t - 20 >= 0 else acp[0]
        x0_ref = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        prev_ref = np.sqrt(a_prev) * x0_ref + np.sqrt(1 - a_prev) * eps

        prev, x0 = ddim_step(sched, jnp.asarray(eps), i, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(x0), x0_ref, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(prev), prev_ref, rtol=2e-5, atol=2e-5)


def test_v_prediction_roundtrip():
    # For v-prediction, reconstructing x0/eps from v must invert cleanly.
    rng = np.random.RandomState(1)
    sched = make_schedule(50, prediction_type="v_prediction")
    acp = _oracle_tables()
    x0 = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    i = 10
    t = int(np.asarray(sched.timesteps)[i])
    a = acp[t]
    x_t = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
    v = np.sqrt(a) * eps - np.sqrt(1 - a) * x0
    _, x0_hat = ddim_step(sched, jnp.asarray(v), i, jnp.asarray(x_t))
    np.testing.assert_allclose(np.asarray(x0_hat), x0, rtol=1e-4, atol=1e-4)


def test_add_noise():
    rng = np.random.RandomState(2)
    sched = make_schedule(50)
    acp = _oracle_tables()
    x0 = rng.randn(2, 4, 4, 4).astype(np.float32)
    eps = rng.randn(2, 4, 4, 4).astype(np.float32)
    t = 501
    out = add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))
    ref = np.sqrt(acp[t]) * x0 + np.sqrt(1 - acp[t]) * eps
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-6, atol=2e-6)
    # per-sample timesteps broadcast
    tvec = jnp.asarray([3, 997])
    out = add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), tvec)
    for b, tb in enumerate([3, 997]):
        ref_b = np.sqrt(acp[tb]) * x0[b] + np.sqrt(1 - acp[tb]) * eps[b]
        np.testing.assert_allclose(np.asarray(out)[b], ref_b, rtol=2e-6, atol=2e-6)


def test_img2img_start_and_guidance_window():
    sched = make_schedule(50)
    # strength 0.5 -> 25 executed steps (reference recipe, BASELINE.md)
    assert img2img_start_index(sched, 0.5) == 25
    assert img2img_start_index(sched, 1.0) == 0
    # guidance_step counts from the END: START=20, PERIOD=2 -> plan idx 30..31
    assert guidance_window(sched, 20, 2) == (30, 32)
    t = np.asarray(sched.timesteps)
    assert t[30] == 381 and t[31] == 361
