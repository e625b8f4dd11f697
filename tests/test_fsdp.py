"""ZeRO-3 FSDP tests (8 virtual CPU devices).

The bar is the same as test_parallel.py: FSDP-sharded training must be
*numerically equivalent* to the replicated shard_map DP step — same init,
same keys, same global batch give the same loss trajectory and the same
updated parameters, while params and both Adam moments actually live
sharded over the ``data`` axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from ddm_tpu.models.mlp import DDDMMLP
from ddm_tpu.parallel import (
    REPLICATED_RULES,
    clip_by_global_norm_fsdp,
    fsdp_spec,
    fsdp_tree_shardings,
    make_mesh,
    make_sharded_train_step,
    place_train_state,
    replicate_tree,
    shard_batch,
)
from ddm_tpu.parallel.fsdp import combine_fsdp_grads, gather_tree
from ddm_tpu.training import TrainState

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_fsdp_spec_shape_rules():
    # first axis divisible by dp shards; earlier indivisible axes skipped
    assert fsdp_spec((4096, 16), dp=8) == P("data")
    assert fsdp_spec((2, 4096), dp=8) == P(None, "data")
    assert fsdp_spec((6, 9, 4096), dp=8) == P(None, None, "data")
    # too small -> replicated, regardless of divisibility
    assert fsdp_spec((8, 8), dp=8) == P()
    # no divisible axis -> replicated
    assert fsdp_spec((9, 4097), dp=8) == P()
    # dp=1 -> replicated
    assert fsdp_spec((4096, 4096), dp=1) == P()
    # min_size override
    assert fsdp_spec((8, 2), dp=8, min_size=4) == P("data")


def _mlp_state(hidden=64, clip=None):
    model = DDDMMLP(hidden=hidden)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2)), jnp.zeros((1,)),
        jnp.zeros((1, 2))
    )
    tx_parts = []
    if clip is not None:
        tx_parts.append(clip)
    tx_parts.append(optax.adam(1e-2))
    return model, TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.chain(*tx_parts)
    )


def _run_equivalence(clip_norm=None, steps_per_scan=1):
    """FSDP step == replicated shard_map DP step (same fold_in key path)."""
    hp = dict(m=4, beta=0.1, lam=1.0, w_bias=0.0)
    mesh = make_mesh()  # 8-way data parallel

    model, state_dp = _mlp_state(
        clip=optax.clip_by_global_norm(clip_norm) if clip_norm else None)
    state_dp, sh_dp = place_train_state(state_dp, mesh, REPLICATED_RULES)
    dp_step = make_sharded_train_step(model.apply, mesh, sh_dp,
                                      dp_shard_map=True,
                                      steps_per_scan=steps_per_scan, **hp)

    # low min_size so the toy MLP's (2,64)/(64,64)/(64,...) kernels shard
    min_size = 64
    _, state_f = _mlp_state(clip=None)
    fsdp_sh = fsdp_tree_shardings(state_f, mesh, min_size=min_size)
    if clip_norm:
        param_sh = fsdp_tree_shardings(state_f.params, mesh,
                                       min_size=min_size)
        _, state_f = _mlp_state(
            clip=clip_by_global_norm_fsdp(clip_norm, param_sh))
        fsdp_sh = fsdp_tree_shardings(state_f, mesh, min_size=min_size)
    state_f, sh_f = place_train_state(state_f, mesh, shardings=fsdp_sh)

    # the placement actually sharded something
    specs = [s.spec for s in jax.tree.leaves(sh_f.params)]
    assert any("data" in (ax for ax in spec if ax) for spec in specs)
    sharded_leaves = [
        (p, s) for p, s in zip(jax.tree.leaves(state_f.params), specs)
        if s != P()
    ]
    assert sharded_leaves
    for leaf, _ in sharded_leaves:
        local = leaf.addressable_shards[0].data
        assert local.size * 8 == leaf.size  # 1/8th per device

    f_step = make_sharded_train_step(model.apply, mesh, sh_f,
                                     dp_shard_map=True, fsdp=True,
                                     steps_per_scan=steps_per_scan, **hp)

    key = jax.random.PRNGKey(42)
    if steps_per_scan > 1:
        from jax.sharding import NamedSharding

        x0 = jax.random.normal(
            jax.random.PRNGKey(43), (steps_per_scan, 64, 2)) + 3.0
        stacked = jax.device_put(
            x0, NamedSharding(mesh, P(None, "data", None)))
        state_dp, m_dp = dp_step(state_dp, key, stacked)
        state_f, m_f = f_step(state_f, key, stacked)
        np.testing.assert_allclose(np.asarray(m_dp["loss"]),
                                   np.asarray(m_f["loss"]), rtol=2e-5)
    else:
        x0 = jax.random.normal(jax.random.PRNGKey(43), (64, 2)) + 3.0
        for i in range(3):
            k = jax.random.fold_in(key, i)
            state_dp, m_dp = dp_step(state_dp, k, shard_batch(x0, mesh))
            state_f, m_f = f_step(state_f, k, shard_batch(x0, mesh))
            np.testing.assert_allclose(float(m_dp["loss"]),
                                       float(m_f["loss"]), rtol=2e-5)

    # params (after all-gathering the FSDP shards) match the DP result
    full = replicate_tree(state_f.params)
    for a, b in zip(jax.tree.leaves(state_dp.params), jax.tree.leaves(full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    # Adam moments are sharded too (ZeRO-3, not just ZeRO-1)
    mu_specs = [s.spec for s in jax.tree.leaves(sh_f.opt_state)
                if hasattr(s, "spec")]
    assert any(spec != P() for spec in mu_specs)


def test_fsdp_matches_dp():
    _run_equivalence()


def test_fsdp_with_global_norm_clip_matches_dp():
    # clip small enough to actually engage (scale != 1) on early steps
    _run_equivalence(clip_norm=1e-2)


def test_fsdp_scan_steps():
    _run_equivalence(steps_per_scan=2)


def test_fsdp_requires_shard_map():
    hp = dict(m=4, beta=0.1, lam=1.0, w_bias=0.0)
    mesh = make_mesh()
    model, state = _mlp_state()
    state, sh = place_train_state(state, mesh, REPLICATED_RULES)
    with pytest.raises(ValueError, match="fsdp"):
        make_sharded_train_step(model.apply, mesh, sh,
                                dp_shard_map=False, fsdp=True, **hp)


def test_gather_tree_roundtrip_and_grad():
    """all_gather restores full leaves; its VJP psum_scatters (sums the
    cross-shard cotangents into this shard's slice)."""
    mesh = make_mesh()
    full = jnp.arange(16.0 * 4).reshape(16, 4)
    sh = fsdp_tree_shardings({"w": full}, mesh, min_size=1)
    placed = jax.device_put({"w": full}, sh)
    assert sh["w"].spec == P("data")

    def body(tree):
        return gather_tree(tree, sh)["w"]

    out = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("data"),),
                      out_specs=P(), check_vma=False)
    )({"w": placed["w"]})
    np.testing.assert_allclose(np.asarray(out), np.asarray(full))

    # VJP: every shard takes grad of ITS OWN loss sum(gather(w) * c); the
    # gather's transpose psum_scatters, summing the c cotangent over all 8
    # shards -> each local element sees 8 * 2.0. (combine_fsdp_grads'
    # divide-by-dp turns exactly this SUM into the global mean.)
    c = jnp.ones((16, 4)) * 2.0
    grad = jax.jit(
        jax.shard_map(
            lambda tree: jax.grad(
                lambda t: jnp.sum(gather_tree(t, sh)["w"] * c))(tree),
            mesh=mesh, in_specs=({"w": P("data")},),
            out_specs={"w": P("data")}, check_vma=False)
    )({"w": placed["w"]})
    np.testing.assert_allclose(np.asarray(grad["w"]), np.full((16, 4), 16.0))


def test_clip_fsdp_matches_optax_oracle():
    """clip_by_global_norm_fsdp over sharded+replicated leaves == plain
    optax.clip_by_global_norm on the full tree."""
    mesh = make_mesh()
    key = jax.random.PRNGKey(5)
    g_big = jax.random.normal(key, (32, 8)) * 3.0       # sharded
    g_small = jax.random.normal(jax.random.fold_in(key, 1), (5,))  # repl

    grads = {"w": g_big, "b": g_small}
    sh = fsdp_tree_shardings(grads, mesh, min_size=64)
    assert sh["w"].spec == P("data") and sh["b"].spec == P()

    max_norm = 1.0
    oracle, _ = optax.clip_by_global_norm(max_norm).update(
        grads, optax.EmptyState())

    clipper = clip_by_global_norm_fsdp(max_norm, sh)

    def body(g):
        out, _ = clipper.update(g, clipper.init(None))
        return out

    placed = jax.device_put(grads, sh)
    out = jax.jit(
        jax.shard_map(body, mesh=mesh,
                      in_specs=({"w": P("data"), "b": P()},),
                      out_specs={"w": P("data"), "b": P()},
                      check_vma=False),
        out_shardings=sh,
    )(placed)
    for k in grads:
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(oracle[k]), rtol=1e-6)


def test_combine_fsdp_grads_semantics():
    """Sharded leaves divide the psum_scattered SUM by dp; replicated
    leaves pmean — both equal the global-mean gradient."""
    mesh = make_mesh()
    sh = fsdp_tree_shardings(
        {"w": jnp.zeros((16, 8)), "b": jnp.zeros((3,))}, mesh, min_size=64)

    def body(_):
        i = jax.lax.axis_index("data").astype(jnp.float32)
        # pretend per-shard contributions: replicated leaf differs/shard
        rep = jnp.full((3,), i)
        # sharded leaf: already the cross-shard SUM slice (post-scatter)
        shd = jnp.full((2, 8), 8.0)
        return combine_fsdp_grads({"w": shd, "b": rep},
                                  {"w": sh["w"], "b": sh["b"]}, 8)

    out = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("data"),),
                      out_specs={"w": P("data"), "b": P()},
                      check_vma=False)
    )(jnp.zeros((8,)))
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)   # 8/8
    np.testing.assert_allclose(np.asarray(out["b"]), 3.5)   # mean(0..7)


def test_fsdp_moe_matches_dp():
    """MoE + ZeRO-3: (E, D, F) expert weights shard by shape over the data
    axis, the Switch aux flows through the gathered-weights loss, and two
    FSDP steps == two replicated DP steps leaf-for-leaf."""
    from ddm_tpu.models.dit import DDDMDiT
    from ddm_tpu.models.moe import make_moe_aux_apply

    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    mesh = make_mesh()
    kw = dict(img_size=8, patch_size=2, embed_dim=32, depth=2, num_heads=2,
              time_embed_dim=16, data_format="NHWC", dtype=jnp.float32,
              moe_experts=4, moe_capacity=2.0)
    model = DDDMDiT(**kw)
    xt = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), xt, jnp.zeros((1,)), xt)
    apply_fn = make_moe_aux_apply(model, 0.5)

    state_dp = TrainState.create(
        apply_fn=model.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.adam(1e-2))
    state_dp, sh_dp = place_train_state(state_dp, mesh, REPLICATED_RULES)
    dp_step = make_sharded_train_step(apply_fn, mesh, sh_dp,
                                      dp_shard_map=True, **hp)

    state_f = TrainState.create(
        apply_fn=model.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.adam(1e-2))
    fsdp_sh = fsdp_tree_shardings(state_f, mesh, min_size=64)
    state_f, sh_f = place_train_state(state_f, mesh, shardings=fsdp_sh)
    # the expert tensors actually sharded (leading E or D axis)
    moe_specs = jax.tree.leaves(
        sh_f.params["params"]["block_0"]["moe"],
        is_leaf=lambda x: hasattr(x, "spec"))
    assert any("data" in (ax for ax in s.spec if ax) for s in moe_specs)
    f_step = make_sharded_train_step(apply_fn, mesh, sh_f,
                                     dp_shard_map=True, fsdp=True, **hp)

    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(jax.random.PRNGKey(43), (16, 8, 8, 3))
    for i in range(2):
        k = jax.random.fold_in(key, i)
        state_dp, m_dp = dp_step(state_dp, k, shard_batch(x0, mesh))
        state_f, m_f = f_step(state_f, k, shard_batch(x0, mesh))
        np.testing.assert_allclose(float(m_dp["loss"]), float(m_f["loss"]),
                                   rtol=2e-5)
        np.testing.assert_allclose(float(m_dp["moe_aux"]),
                                   float(m_f["moe_aux"]), rtol=2e-5)
    full = replicate_tree(state_f.params)
    for a, b in zip(jax.tree.leaves(state_dp.params), jax.tree.leaves(full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
