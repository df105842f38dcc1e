"""FSDP train step (parallel/fsdp.py) on the 8-device CPU mesh: parameters
and optimizer state must actually be sharded across the data axis, and N
steps of the FSDP step must be numerically equivalent (to 2e-5) to N steps
of the replicated DP step — reduce-scatter+all-gather reduction ordering
may legitimately differ from all-reduce, so exact bit equality is not
asserted."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from distdiff_tpu.models.guide.resnet import ResNet, tiny_resnet_config
from distdiff_tpu.parallel.fsdp import (
    fsdp_sharding,
    make_fsdp_train_step,
)
from distdiff_tpu.parallel.mesh import make_mesh
from distdiff_tpu.train import (
    TrainConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _setup(num_classes=2, size=16, batch=16):
    rng = np.random.RandomState(0)
    module = ResNet(tiny_resnet_config(num_classes=num_classes))
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
    )
    cfg = TrainConfig(lr=0.05, epochs=2, weight_decay=1e-4)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    state = create_train_state(module, variables, tx)
    labels = rng.randint(0, num_classes, batch)
    images = np.where(
        labels[:, None, None, None] == 1,
        rng.rand(batch, size, size, 3) * 0.5 + 0.5,
        rng.rand(batch, size, size, 3) * 0.5,
    ).astype(np.float32)
    mask = np.ones(batch, np.float32)
    return module, tx, state, (jnp.asarray(images), jnp.asarray(labels),
                               jnp.asarray(mask))


def test_fsdp_sharding_shards_large_leaves():
    mesh = make_mesh()
    module, tx, state, _ = _setup()
    # the toy model's leaves are tiny — drop the production threshold so
    # the sharding path is actually exercised
    shardings = fsdp_sharding(state, mesh, min_shard_elems=512)
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec, shardings),
        is_leaf=lambda x: isinstance(x, P),
    )
    sharded = [s for s in specs if any(a is not None for a in s)]
    assert sharded, "no leaf was sharded"
    # every sharded leaf's sharded dim divides the mesh
    params_and_specs = zip(
        jax.tree_util.tree_leaves(state),
        specs,
    )
    n = mesh.shape["data"]
    for leaf, spec in params_and_specs:
        for dim, axis in enumerate(spec):
            if axis is not None:
                assert leaf.shape[dim] % n == 0
    # scalars / small leaves replicated
    step_spec = shardings.step.spec
    assert all(a is None for a in step_spec)


def test_fsdp_matches_replicated_dp():
    mesh = make_mesh()
    module, tx, state, batch = _setup()
    images, labels, mask = batch

    dp_step = make_train_step(module, tx, mesh=mesh)
    # deep-copy the DP side: its device_put to an identical layout aliases
    # buffers, and the donating step would delete leaves shared with
    # `state`. The FSDP side needs no copy — make_fsdp_train_step deep-
    # copies internally (the aliasing hazard found in round 3).
    dp_state = jax.device_put(
        jax.tree_util.tree_map(lambda x: jnp.array(x), state),
        jax.sharding.NamedSharding(mesh, P()),
    )

    fs_step, fs_state = make_fsdp_train_step(module, tx, state, mesh=mesh,
                                             min_shard_elems=512)
    # the input state must survive make_fsdp_train_step + a donating step
    # call untouched (no buffer aliasing with the returned sharded state)
    orig_leaves = jax.tree_util.tree_leaves(state.params)
    # the FSDP state is genuinely distributed
    kernels = [
        v for v in jax.tree_util.tree_leaves(fs_state.params)
        if v.ndim >= 2 and v.size >= 512
    ]
    assert kernels and any(
        not k.sharding.is_fully_replicated for k in kernels
    )

    for i in range(3):
        im = jnp.roll(images, i, axis=0)
        dp_state, dp_m = dp_step(dp_state, im, jnp.roll(labels, i), mask)
        fs_state, fs_m = fs_step(fs_state, im, jnp.roll(labels, i), mask)

    np.testing.assert_allclose(
        float(dp_m["loss"]), float(fs_m["loss"]), rtol=1e-5
    )
    # params AND the full optimizer state (momentum etc.) and batch_stats:
    # a divergence in the sharded momentum update must not hide behind a
    # params-only check that hasn't propagated yet after 3 steps
    for name, fs_tree, dp_tree in (
        ("params", fs_state.params, dp_state.params),
        ("opt_state", fs_state.opt_state, dp_state.opt_state),
        ("batch_stats", fs_state.batch_stats, dp_state.batch_stats),
    ):
        flat_g = jax.tree_util.tree_leaves(jax.device_get(fs_tree))
        flat_e = jax.tree_util.tree_leaves(jax.device_get(dp_tree))
        assert len(flat_g) == len(flat_e), name
        for g, e in zip(flat_g, flat_e):
            np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                       rtol=2e-5, atol=2e-6, err_msg=name)

    # the original (pre-sharding) state is still fully readable: every leaf
    # fetches without a deleted-buffer error and matches its initial value
    for orig in orig_leaves:
        np.asarray(orig)  # raises if the donating step deleted the buffer
