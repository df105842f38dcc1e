"""Tensor-parallel UNet sharding (parallel/tp.py) on the 8-device CPU mesh:
a 2x4 data x model mesh must (a) actually shard the transformer Dense
kernels, (b) produce the same outputs as the replicated single-mesh run
(GSPMD inserts the all-reduces), (c) compose with batch sharding."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from distdiff_tpu.config import UNetConfig
from distdiff_tpu.models import UNet2DCondition
from distdiff_tpu.parallel.tp import (
    batch_sharding,
    make_tp_mesh,
    replicated,
    unet_param_shardings,
)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(4, 6, cfg.cross_attention_dim), jnp.float32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, jnp.array([1]), ctx)
    return unet, params, x, ctx


def test_tp_shards_transformer_kernels(tiny_unet):
    unet, params, x, ctx = tiny_unet
    mesh = make_tp_mesh(2, 4)
    shardings = unet_param_shardings(mesh, params)
    sharded = jax.device_put(params, shardings)

    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    n_sharded = 0
    for path, leaf in flat:
        names = [p.key for p in path if hasattr(p, "key")]
        spec = leaf.sharding.spec
        if any(s is not None for s in spec):
            n_sharded += 1
            # a genuinely split leaf: per-device shard smaller than global
            shard_shape = leaf.addressable_shards[0].data.shape
            assert np.prod(shard_shape) < np.prod(leaf.shape), names
    assert n_sharded >= 8, n_sharded  # qkv/out/ff kernels + qkv biases


def test_tp_forward_matches_replicated(tiny_unet):
    unet, params, x, ctx = tiny_unet
    ref = jax.jit(
        lambda p, xx, cc: unet.apply(p, xx, jnp.array([3]), cc)
    )(params, x, ctx)

    mesh = make_tp_mesh(2, 4)
    shardings = unet_param_shardings(mesh, params)
    fwd = jax.jit(
        lambda p, xx, cc: unet.apply(p, xx, jnp.array([3]), cc),
        in_shardings=(shardings, batch_sharding(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
    out = fwd(jax.device_put(params, shardings),
              jax.device_put(x, batch_sharding(mesh)),
              jax.device_put(ctx, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_tp_mesh_shapes():
    mesh = make_tp_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert replicated(mesh).spec == jax.sharding.PartitionSpec()


def test_tp_forward_with_pallas_attention(tiny_unet, monkeypatch):
    """VERDICT r2 #4: tp>1 keeps the Pallas flash kernel — attention is
    shard_map'd over the (data, model) mesh (heads on the model axis when
    they divide, replicated otherwise) instead of forcing XLA attention.
    Interpreter mode stands in for the TPU backend on the CPU test mesh."""
    import distdiff_tpu.ops.flash as fl
    from distdiff_tpu.ops.attention import tp_sharded_attention

    import distdiff_tpu.ops.attention as att

    monkeypatch.setenv("DISTDIFF_FORCE_PALLAS_ATTENTION", "1")
    monkeypatch.setattr(fl, "INTERPRET", True)
    # tiny shapes fall under the small-kv XLA dispatch; pin it off so the
    # test really exercises the shard_map'd Pallas kernel
    monkeypatch.setattr(att, "_XLA_SMALL_KV", 0)

    unet, params, x, ctx = tiny_unet
    ref = jax.jit(
        lambda p, xx, cc: unet.apply(p, xx, jnp.array([3]), cc)
    )(params, x, ctx)

    mesh = make_tp_mesh(2, 4)
    shardings = unet_param_shardings(mesh, params)
    with tp_sharded_attention(mesh):
        fwd = jax.jit(
            lambda p, xx, cc: unet.apply(p, xx, jnp.array([3]), cc),
            in_shardings=(shardings, batch_sharding(mesh),
                          batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh),
        )
        out = fwd(jax.device_put(params, shardings),
                  jax.device_put(x, batch_sharding(mesh)),
                  jax.device_put(ctx, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def _tiny_guided_pipe():
    from distdiff_tpu.config import GuidanceConfig, PipelineConfig
    from distdiff_tpu.models.guide import create_model
    from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

    rng = np.random.RandomState(0)
    config = PipelineConfig.tiny(sample_size=32)
    guide = create_model("tiny_resnet", num_classes=4, input_size=32)
    pipe = ExpansionPipeline.create(
        config,
        sampler_cfg=SamplerConfig(guidance_scale=3.0),
        guidance_cfg=GuidanceConfig(
            guidance_type="transform_guidance", guidance_step=4,
            guidance_period=2, K=2, guide_input_size=32,
        ),
        guide=guide,
        global_protos=rng.randn(4, guide.feature_dim).astype(np.float32),
        local_protos=rng.randn(4, 2, guide.feature_dim).astype(np.float32),
    )
    b = 4
    ls = config.latent_size
    lat = np.asarray(rng.randn(b, ls, ls, 4), np.float32) * 0.2
    cond = np.asarray(rng.randn(b, 8, 32), np.float32)
    uncond = np.asarray(rng.randn(b, 8, 32), np.float32)
    targets = np.arange(b, dtype=np.int32) % 4
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(b)])
    return pipe, (lat, cond, uncond, targets, keys)


def test_tp_split_expand_matches_data_parallel():
    """The reachable TP feature (cli --mesh_model): the full guided
    SplitExpand path over a 2-D data x model mesh with sharded UNet params
    must reproduce the 1-D data-mesh (replicated-params) images."""
    from distdiff_tpu.parallel.mesh import make_expand_mesh

    pipe, (lat, cond, uncond, targets, keys) = _tiny_guided_pipe()
    params = pipe.full_params()

    mesh_dp = make_expand_mesh(1, devices=jax.devices()[:4])
    se_dp = pipe.make_split_expand(mesh=mesh_dp)
    ref = np.asarray(se_dp(params, lat, cond, uncond, targets, keys))

    mesh_tp = make_expand_mesh(2, devices=jax.devices()[:8])
    assert dict(mesh_tp.shape) == {"data": 4, "model": 2}
    shardings = unet_param_shardings(mesh_tp, params)
    se_tp = pipe.make_split_expand(mesh=mesh_tp, param_shardings=shardings)
    out = np.asarray(se_tp(params, lat, cond, uncond, targets, keys))

    # a transformer kernel is genuinely split across the model axis
    sharded_leaves = [
        leaf for path, leaf in
        jax.tree_util.tree_flatten_with_path(shardings)[0]
        if any(s is not None for s in leaf.spec)
    ]
    assert len(sharded_leaves) >= 4
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_tp_pallas_grads(tiny_unet, monkeypatch):
    """The guidance path differentiates through attention: the shard_map'd
    kernel's custom VJP must compose with TP sharding."""
    import distdiff_tpu.ops.flash as fl
    from distdiff_tpu.ops.attention import tp_sharded_attention

    import distdiff_tpu.ops.attention as att

    monkeypatch.setenv("DISTDIFF_FORCE_PALLAS_ATTENTION", "1")
    monkeypatch.setattr(fl, "INTERPRET", True)
    # tiny shapes fall under the small-kv XLA dispatch; pin it off so the
    # test really exercises the shard_map'd Pallas kernel
    monkeypatch.setattr(att, "_XLA_SMALL_KV", 0)

    unet, params, x, ctx = tiny_unet

    def loss(p, xx, cc):
        return jnp.sum(unet.apply(p, xx, jnp.array([3]), cc) ** 2)

    g_ref = jax.jit(jax.grad(loss, argnums=1))(params, x, ctx)

    mesh = make_tp_mesh(2, 4)
    shardings = unet_param_shardings(mesh, params)
    with tp_sharded_attention(mesh):
        gfn = jax.jit(
            jax.grad(loss, argnums=1),
            in_shardings=(shardings, batch_sharding(mesh),
                          batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh),
        )
        g = gfn(jax.device_put(params, shardings),
                jax.device_put(x, batch_sharding(mesh)),
                jax.device_put(ctx, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=5e-4, rtol=5e-3)
