"""Pipeline-parallelism tests (8 virtual CPU devices; SURVEY §4 harness).

Asserts the GPipe-style staged runner (``ddm_tpu.parallel.pipeline``) is
numerically equivalent to the plain single-device DiT: same params, same
keys, same global batch -> same tokens, same loss, same updated params,
whether the block stack runs in one sweep or staged over a ``pipe`` mesh
axis with microbatched ppermute rotation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from ddm_tpu.models.dit import DDDMDiT, patchify_images
from ddm_tpu.parallel import (
    make_pipe_mesh,
    make_pipelined_apply,
    make_sharded_train_step,
    pipeline_tree_shardings,
    place_train_state,
    shard_batch,
    from_pipeline_params,
    to_pipeline_params,
)
from ddm_tpu.training import TrainState, make_loss_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _tiny_dit(depth=4):
    model = DDDMDiT(
        img_size=8, patch_size=2, embed_dim=32, depth=depth, num_heads=2,
        time_embed_dim=16, data_format="NHWC",
    )
    xt = jnp.zeros((2, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), xt, jnp.zeros((2,)), xt)
    return model, params


def test_pipeline_param_roundtrip():
    model, params = _tiny_dit(depth=4)
    pipe = to_pipeline_params(params, n_stages=2)
    stages_leaf = jax.tree.leaves(pipe["stages"])[0]
    assert stages_leaf.shape[:2] == (2, 2)  # (S, L)
    back = from_pipeline_params(pipe)
    assert jax.tree.structure(back) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_depth_not_divisible_raises():
    model, params = _tiny_dit(depth=4)
    with pytest.raises(ValueError, match="not divisible"):
        to_pipeline_params(params, n_stages=3)


@pytest.mark.parametrize("pp,microbatches", [(4, 2), (2, 4)])
def test_pipelined_forward_matches_plain(pp, microbatches):
    model, params = _tiny_dit(depth=4)
    B = 16
    xt = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 8, 3))
    xi = jax.random.normal(jax.random.PRNGKey(2), (B, 8, 8, 3))
    t = jnp.linspace(0.1, 0.9, B)
    want = model.apply(params, xt, t, xi, method="tokens")

    mesh = make_pipe_mesh(pp=pp)
    dp = mesh.shape["data"]
    assert B % dp == 0
    pipe_params = to_pipeline_params(params, n_stages=pp)
    shardings = pipeline_tree_shardings(pipe_params, mesh)
    pipe_params = jax.tree.map(jax.device_put, pipe_params, shardings)
    specs = jax.tree.map(lambda s: s.spec, shardings)

    apply = make_pipelined_apply(model, n_stages=pp,
                                 n_microbatches=microbatches)
    papply = jax.jit(
        jax.shard_map(
            apply, mesh=mesh,
            in_specs=(specs, P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    )
    got = papply(
        pipe_params,
        jax.device_put(xt, jax.sharding.NamedSharding(mesh, P("data"))),
        jax.device_put(t, jax.sharding.NamedSharding(mesh, P("data"))),
        jax.device_put(xi, jax.sharding.NamedSharding(mesh, P("data"))),
    )
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=2e-4, atol=1e-5
    )


def test_pipelined_train_step_matches_manual_oracle():
    """DP x PP training == manual per-data-shard emulation, multi-step,
    with an ENGAGED global-norm clip through the pipe-axis sharded clipper.

    The oracle replays exactly what the shard_map step does: fold the data-
    axis index into the key per shard, average gradients over data shards,
    apply the same optimizer. The pipe axis must be numerically transparent
    — including the clip norm: inside the pipe shard_map each shard sees
    only its (1, L, ...) stage grad slice, so a plain optax clipper would
    compute a different norm per stage and scale the replicated embed
    updates inconsistently; clip=1e-3 (always engaged) makes that
    divergence fail the leaf-for-leaf compare below.
    """
    from ddm_tpu.parallel import PIPE_AXIS, clip_by_global_norm_sharded

    model, params = _tiny_dit(depth=4)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    clip = 1e-3  # far below the init grad norm: ALWAYS engages
    tx = optax.chain(optax.clip_by_global_norm(clip), optax.adamw(1e-3))
    tok_transform = lambda x0: patchify_images(x0, 2)  # noqa: E731

    mesh = make_pipe_mesh(pp=4)  # data=2 x pipe=4
    dp = mesh.shape["data"]

    pipe_params = to_pipeline_params(
        jax.tree.map(jnp.copy, params), n_stages=4
    )
    tx_pipe = optax.chain(
        clip_by_global_norm_sharded(
            clip, pipeline_tree_shardings(pipe_params, mesh), PIPE_AXIS),
        optax.adamw(1e-3),
    )
    state = TrainState.create(apply_fn=None, params=pipe_params, tx=tx_pipe)
    state, shardings = place_train_state(
        state, mesh, shardings=pipeline_tree_shardings(state, mesh)
    )
    apply = make_pipelined_apply(model, n_stages=4, n_microbatches=2)
    step = make_sharded_train_step(
        apply, mesh, shardings, dp_shard_map=True,
        target_transform=tok_transform, **hp,
    )

    ref_params = jax.tree.map(jnp.copy, params)
    ref_state = TrainState.create(
        apply_fn=None, params=ref_params, tx=tx
    )
    tok_apply = lambda p, a, b, c: model.apply(p, a, b, c, method="tokens")  # noqa: E731
    loss_fn = make_loss_fn(tok_apply, target_transform=tok_transform, **hp)

    key = jax.random.PRNGKey(11)
    batch = jax.random.normal(jax.random.PRNGKey(12), (8, 8, 8, 3))

    for i in range(3):
        k = jax.random.fold_in(key, i)
        state, metrics = step(state, k, shard_batch(batch, mesh))

        shards = np.asarray(batch).reshape(dp, -1, 8, 8, 3)
        grads_acc, losses = None, []
        for d in range(dp):
            kd = jax.random.fold_in(k, d)
            (_, md), gd = jax.value_and_grad(loss_fn, has_aux=True)(
                ref_state.params, kd, jnp.asarray(shards[d])
            )
            losses.append(float(md["loss"]))
            grads_acc = gd if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, gd
            )
        grads_mean = jax.tree.map(lambda g: g / dp, grads_acc)
        ref_state = ref_state.apply_gradients(grads=grads_mean)

        np.testing.assert_allclose(
            float(metrics["loss"]), np.mean(losses), rtol=5e-5,
            err_msg=f"loss mismatch at step {i}",
        )

    got = from_pipeline_params(jax.device_get(state.params))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.params),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5,
            err_msg=f"param mismatch at {pa}",
        )


def _tiny_tp_dit(depth=4, sp=False):
    """(full, pipelined-local) tp=2 DDDMDiT pair sharing one param tree."""
    kw = dict(
        img_size=8, patch_size=2, embed_dim=32, depth=depth, num_heads=2,
        time_embed_dim=16, data_format="NHWC", tp=2,
    )
    full = DDDMDiT(tp_axis=None, **kw)
    local = DDDMDiT(tp_axis="model", sequence_parallel=sp, **kw)
    xt = jnp.zeros((2, 8, 8, 3))
    params = full.init(jax.random.PRNGKey(0), xt, jnp.zeros((2,)), xt)
    return full, local, params


def test_pp_tp_forward_matches_plain():
    """Staged forward over a 3-D (data=2, pipe=2, model=2) mesh == plain
    tokens: the per-stage blocks run the Megatron layout on local weight
    shards while microbatches rotate over 'pipe'."""
    full, local, params = _tiny_tp_dit(depth=4)
    mesh = make_pipe_mesh(pp=2, tp=2)
    assert dict(mesh.shape) == {"data": 2, "pipe": 2, "model": 2}

    pipe_params = to_pipeline_params(params, n_stages=2)
    shardings = pipeline_tree_shardings(pipe_params, mesh)
    # stage weights carry BOTH axes; norms/biases pipe only
    qkv_spec = shardings["stages"]["attn"]["q"]["kernel"].spec
    assert qkv_spec == P("pipe", None, None, "model")
    assert shardings["stages"]["norm1"]["scale"].spec in (
        P("pipe"), P("pipe", None)
    )

    apply = make_pipelined_apply(local, n_stages=2, n_microbatches=2)
    specs = jax.tree.map(lambda s: s.spec, shardings)
    fwd = jax.shard_map(
        apply, mesh=mesh,
        in_specs=(specs, P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    )

    xt = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    xi = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 3))
    t = jnp.full((4,), 0.3)
    placed = jax.tree.map(lambda x, s: jax.device_put(x, s),
                          pipe_params, shardings)
    got = fwd(placed, xt, t, xi)
    want = full.apply(params, xt, t, xi, method="tokens")
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=2e-4, atol=1e-5
    )


def test_pp_tp_sp_train_step_matches_oracle():
    """Full 3-D composition + sequence parallelism: DP x PP x TP(+SP)
    training with an ENGAGED clip through the ('pipe','model') sharded
    clipper == manual full-model oracle, leaf for leaf, over 2 steps.

    Crosses every boundary operator at once: pipeline f/g over 'pipe',
    Megatron f/g + all_gather/psum_scatter over 'model', the SP enter
    slice and sp_region_exit, and the multi-axis clip divisors
    (stage weights sharded over both axes, stage norms over pipe only,
    embed/head over neither).
    """
    from ddm_tpu.parallel import PIPE_AXIS, clip_by_global_norm_sharded
    from ddm_tpu.parallel.mesh import MODEL_AXIS

    full, local, params = _tiny_tp_dit(depth=4, sp=True)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    clip = 1e-3  # always engages at init grad norms
    tok_transform = lambda x0: patchify_images(x0, 2)  # noqa: E731

    mesh = make_pipe_mesh(pp=2, tp=2)
    dp = mesh.shape["data"]

    pipe_params = to_pipeline_params(jax.tree.map(jnp.copy, params), 2)
    tx_pipe = optax.chain(
        clip_by_global_norm_sharded(
            clip, pipeline_tree_shardings(pipe_params, mesh),
            (PIPE_AXIS, MODEL_AXIS)),
        optax.adamw(1e-3),
    )
    state = TrainState.create(apply_fn=None, params=pipe_params, tx=tx_pipe)
    state, shardings = place_train_state(
        state, mesh, shardings=pipeline_tree_shardings(state, mesh)
    )
    apply = make_pipelined_apply(local, n_stages=2, n_microbatches=2)
    step = make_sharded_train_step(
        apply, mesh, shardings, dp_shard_map=True,
        target_transform=tok_transform, **hp,
    )

    ref_state = TrainState.create(
        apply_fn=None, params=jax.tree.map(jnp.copy, params),
        tx=optax.chain(optax.clip_by_global_norm(clip), optax.adamw(1e-3)),
    )
    tok_apply = lambda p, a, b, c: full.apply(p, a, b, c, method="tokens")  # noqa: E731
    loss_fn = make_loss_fn(tok_apply, target_transform=tok_transform, **hp)

    key = jax.random.PRNGKey(21)
    batch = jax.random.normal(jax.random.PRNGKey(22), (8, 8, 8, 3))

    for i in range(2):
        k = jax.random.fold_in(key, i)
        state, metrics = step(state, k, shard_batch(batch, mesh))

        shards = np.asarray(batch).reshape(dp, -1, 8, 8, 3)
        grads_acc, losses = None, []
        for d in range(dp):
            kd = jax.random.fold_in(k, d)
            (_, md), gd = jax.value_and_grad(loss_fn, has_aux=True)(
                ref_state.params, kd, jnp.asarray(shards[d])
            )
            losses.append(float(md["loss"]))
            grads_acc = gd if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, gd
            )
        ref_state = ref_state.apply_gradients(
            grads=jax.tree.map(lambda g: g / dp, grads_acc)
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), np.mean(losses), rtol=5e-5,
            err_msg=f"loss mismatch at step {i}",
        )

    got = from_pipeline_params(jax.device_get(state.params))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.params),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(pa)}",
        )


def _tiny_moe_dit(depth=2):
    model = DDDMDiT(
        img_size=8, patch_size=2, embed_dim=32, depth=depth, num_heads=2,
        time_embed_dim=16, data_format="NHWC",
        moe_experts=4, moe_capacity=2.0,
    )
    xt = jnp.zeros((2, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), xt, jnp.zeros((2,)), xt)
    return model, params


def _run_pp_aux(model, params, pp, microbatches, weight, xt, t, xi):
    """Run make_pipelined_apply with aux on a dp=1 x pipe=pp sub-mesh."""
    mesh = make_pipe_mesh(pp=pp, devices=jax.devices()[:pp])
    pipe_params = to_pipeline_params(params, n_stages=pp)
    shardings = pipeline_tree_shardings(pipe_params, mesh)
    pipe_params = jax.tree.map(jax.device_put, pipe_params, shardings)
    specs = jax.tree.map(lambda s: s.spec, shardings)
    apply = make_pipelined_apply(
        model, n_stages=pp, n_microbatches=microbatches,
        moe_aux_weight=weight,
    )
    papply = jax.jit(
        jax.shard_map(
            apply, mesh=mesh,
            in_specs=(specs, P("data"), P("data"), P("data")),
            out_specs=(P("data"), P()),
            check_vma=False,
        )
    )
    put = lambda a: jax.device_put(  # noqa: E731
        a, jax.sharding.NamedSharding(mesh, P("data")))
    return papply(pipe_params, put(xt), put(t), put(xi))


def test_pipelined_moe_aux_matches_plain_single_microbatch():
    """PP + MoE aux: with one microbatch the staged scan sees exactly the
    rows the plain path sees, so tokens AND the weighted aux must match
    make_moe_aux_apply bit-for-bit (up to fp reassociation)."""
    from ddm_tpu.models.moe import make_moe_aux_apply

    model, params = _tiny_moe_dit(depth=2)
    B, w = 4, 0.37
    xt = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 8, 3))
    xi = jax.random.normal(jax.random.PRNGKey(2), (B, 8, 8, 3))
    t = jnp.linspace(0.1, 0.9, B)

    want_tok, want_aux = make_moe_aux_apply(model, w, method="tokens")(
        params, xt, t, xi)
    got_tok, got_aux = _run_pp_aux(model, params, pp=2, microbatches=1,
                                   weight=w, xt=xt, t=t, xi=xi)
    np.testing.assert_allclose(np.asarray(want_tok), np.asarray(got_tok),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(want_aux), float(got_aux),
                               rtol=1e-5, atol=1e-7)


def test_pipelined_moe_aux_microbatched_close_and_differentiable():
    """M>1: the per-microbatch aux mean is a finer-grained statistic than
    the whole-batch one (mean of products vs product of means) — assert
    it stays close, is positive, and carries gradient into the ROUTER
    params of EVERY stage (the exact failure mode of the dropped-sow bug:
    aux silently zero => no router gradient beyond gate scaling)."""
    from ddm_tpu.models.moe import make_moe_aux_apply

    model, params = _tiny_moe_dit(depth=2)
    B, w = 8, 1.0
    xt = jax.random.normal(jax.random.PRNGKey(3), (B, 8, 8, 3))
    xi = jax.random.normal(jax.random.PRNGKey(4), (B, 8, 8, 3))
    t = jnp.linspace(0.05, 0.95, B)

    _, want_aux = make_moe_aux_apply(model, w, method="tokens")(
        params, xt, t, xi)

    pp = 2
    mesh = make_pipe_mesh(pp=pp, devices=jax.devices()[:pp])
    pipe_params = to_pipeline_params(params, n_stages=pp)
    shardings = pipeline_tree_shardings(pipe_params, mesh)
    pipe_params = jax.tree.map(jax.device_put, pipe_params, shardings)
    specs = jax.tree.map(lambda s: s.spec, shardings)
    apply = make_pipelined_apply(model, n_stages=pp, n_microbatches=2,
                                 moe_aux_weight=w)

    def aux_only(pp_params, a, b, c):
        _, aux = apply(pp_params, a, b, c)
        return aux

    grad_fn = jax.jit(
        jax.shard_map(
            jax.value_and_grad(aux_only), mesh=mesh,
            in_specs=(specs, P("data"), P("data"), P("data")),
            out_specs=(P(), specs),
            check_vma=False,
        )
    )
    put = lambda a: jax.device_put(  # noqa: E731
        a, jax.sharding.NamedSharding(mesh, P("data")))
    aux, grads = grad_fn(pipe_params, put(xt), put(t), put(xi))
    aux = float(aux)
    assert aux > 0.0
    # Switch aux is ~1 at uniform routing; both conventions must agree
    # to well under the router-collapse signal scale
    np.testing.assert_allclose(aux, float(want_aux), rtol=0.05)
    rk = np.asarray(
        jax.device_get(grads["stages"]["moe"]["router_kernel"]))
    assert rk.shape[0] == pp  # (S, L, D, E) stacked router grads
    for s in range(pp):
        assert np.abs(rk[s]).max() > 0.0, f"stage {s} router grad is zero"


def test_pp_sp_ep_train_step_matches_oracle():
    """3-D composition with MoE: DP x PP x TP(+SP) where every block's
    MLP is the SP+EP expert path — token-sharded routing and the
    capacity-sliced all_to_all dispatch running INSIDE the pipeline
    stage scan (expert weights stacked per stage and sharded over both
    'pipe' and 'model'). Engaged two-axis clip; == manual full-model
    oracle leaf-for-leaf over 2 steps. Routing groups (gs=8 = one
    image's token shard) align across the microbatch split, the shard
    split, and the oracle's global flatten, so the match is exact."""
    from ddm_tpu.parallel import PIPE_AXIS, clip_by_global_norm_sharded
    from ddm_tpu.parallel.mesh import MODEL_AXIS

    kw = dict(
        img_size=8, patch_size=2, embed_dim=32, depth=4, num_heads=2,
        time_embed_dim=16, data_format="NHWC", tp=2,
        moe_experts=4, moe_capacity=2.0, moe_group_size=8,
    )
    full = DDDMDiT(tp_axis=None, sequence_parallel=True, **kw)
    local = DDDMDiT(tp_axis="model", sequence_parallel=True, **kw)
    xt = jnp.zeros((2, 8, 8, 3))
    params = full.init(jax.random.PRNGKey(0), xt, jnp.zeros((2,)), xt)

    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    clip = 1e-3  # always engages at init grad norms
    tok_transform = lambda x0: patchify_images(x0, 2)  # noqa: E731

    mesh = make_pipe_mesh(pp=2, tp=2)
    dp = mesh.shape["data"]

    pipe_params = to_pipeline_params(jax.tree.map(jnp.copy, params), 2)
    tx_pipe = optax.chain(
        clip_by_global_norm_sharded(
            clip, pipeline_tree_shardings(pipe_params, mesh),
            (PIPE_AXIS, MODEL_AXIS)),
        optax.adamw(1e-3),
    )
    state = TrainState.create(apply_fn=None, params=pipe_params, tx=tx_pipe)
    state, shardings = place_train_state(
        state, mesh, shardings=pipeline_tree_shardings(state, mesh)
    )
    apply = make_pipelined_apply(local, n_stages=2, n_microbatches=2)
    step = make_sharded_train_step(
        apply, mesh, shardings, dp_shard_map=True,
        target_transform=tok_transform, **hp,
    )

    ref_state = TrainState.create(
        apply_fn=None, params=jax.tree.map(jnp.copy, params),
        tx=optax.chain(optax.clip_by_global_norm(clip), optax.adamw(1e-3)),
    )
    tok_apply = lambda p, a, b, c: full.apply(p, a, b, c, method="tokens")  # noqa: E731
    loss_fn = make_loss_fn(tok_apply, target_transform=tok_transform, **hp)

    key = jax.random.PRNGKey(31)
    batch = jax.random.normal(jax.random.PRNGKey(32), (8, 8, 8, 3))

    for i in range(2):
        k = jax.random.fold_in(key, i)
        state, metrics = step(state, k, shard_batch(batch, mesh))

        shards = np.asarray(batch).reshape(dp, -1, 8, 8, 3)
        grads_acc, losses = None, []
        for d in range(dp):
            kd = jax.random.fold_in(k, d)
            (_, md), gd = jax.value_and_grad(loss_fn, has_aux=True)(
                ref_state.params, kd, jnp.asarray(shards[d])
            )
            losses.append(float(md["loss"]))
            grads_acc = gd if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, gd
            )
        ref_state = ref_state.apply_gradients(
            grads=jax.tree.map(lambda g: g / dp, grads_acc)
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), np.mean(losses), rtol=5e-5,
            err_msg=f"loss mismatch at step {i}",
        )

    got = from_pipeline_params(jax.device_get(state.params))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.params),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(pa)}",
        )
