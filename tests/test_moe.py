"""Mixture-of-Experts MLP + expert parallelism (8 virtual CPU devices).

The static capacity-bounded dispatch must equal a per-token Python oracle
(same top-1 routing, same first-come capacity rule, same gate scaling),
and the expert-parallel shard_map step must match the full-model oracle
leaf for leaf — the `ep` analogue of the TP/SP/PP equivalence suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ddm_tpu.models.dit import DDDMDiT
from ddm_tpu.models.moe import MoEMLP
from ddm_tpu.parallel import (
    DIT_TP_RULES,
    make_mesh,
    make_sharded_train_step,
    place_train_state,
    shard_batch,
    tree_shardings,
)
from ddm_tpu.training import TrainState, make_loss_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _moe_oracle(params, rows, num_experts, capacity_factor, group_size=0):
    """Per-token reference: top-1 routing, first-come PER-GROUP capacity,
    gate scale. Row counts that don't fill the last group behave as if it
    were zero-padded with never-routing rows (= just fewer rows compete
    for the same per-group capacity)."""
    p = params["params"]
    T, D = rows.shape
    gs = min(group_size, T) if group_size > 0 else T
    cap = int(-(-gs * capacity_factor // num_experts))
    logits = rows @ p["router_kernel"] + p["router_bias"]
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    out = np.zeros((T, D), np.float32)
    for g0 in range(0, T, gs):
        counts = [0] * num_experts
        for t in range(g0, min(g0 + gs, T)):
            e = int(np.argmax(probs[t]))
            if counts[e] >= cap:
                continue  # dropped: residual only
            counts[e] += 1
            h = rows[t] @ p["experts_in"][e] + p["experts_in_bias"][e]
            h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=False))
            y = h @ p["experts_out"][e] + p["experts_out_bias"][e]
            out[t] = probs[t, e] * y
    return out


@pytest.mark.parametrize("capacity_factor,group_size,T",
                         [(2.0, 0, 32), (0.3, 0, 32), (2.0, 8, 32),
                          (0.5, 8, 32),
                          # ragged row counts: eval remainder chunks /
                          # odd sampling batches pad to the group boundary
                          (2.0, 8, 20), (0.5, 8, 20)])
def test_moe_matches_per_token_oracle(capacity_factor, group_size, T):
    """Dense einsum dispatch == per-token loop, incl. capacity drops,
    GShard-style per-group routing, and ragged (padded) last groups."""
    E, D, H = 4, 8, 16
    moe = MoEMLP(D, H, E, capacity_factor=capacity_factor,
                 group_size=group_size)
    rows = jax.random.normal(jax.random.PRNGKey(1), (T, D))
    params = moe.init(jax.random.PRNGKey(0), rows)
    got = moe.apply(params, rows)
    want = _moe_oracle(
        jax.tree.map(np.asarray, params), np.asarray(rows), E,
        capacity_factor, group_size,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    if capacity_factor < 1.0 and T % max(group_size, 1) == 0:
        dropped = np.sum(np.all(want == 0.0, axis=-1))
        assert dropped > 0  # the drop path must actually engage


def _moe_top2_oracle(params, rows, num_experts, capacity_factor,
                     group_size=0):
    """Per-token top-2 reference: renormalised gates over the two largest
    probs; first choices fill per-group queues in token order, second
    choices queue AFTER all first choices of their expert."""
    p = params["params"]
    T, D = rows.shape
    gs = min(group_size, T) if group_size > 0 else T
    cap = int(-(-gs * capacity_factor * 2 // num_experts))
    logits = rows @ p["router_kernel"] + p["router_bias"]
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    out = np.zeros((T, D), np.float32)

    def ffn(t, e):
        h = rows[t] @ p["experts_in"][e] + p["experts_in_bias"][e]
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=False))
        return h @ p["experts_out"][e] + p["experts_out_bias"][e]

    for g0 in range(0, T, gs):
        hi = min(g0 + gs, T)
        order = np.argsort(-probs[g0:hi], axis=-1)
        counts = [0] * num_experts
        kept = {}
        for choice in (0, 1):  # ALL first choices before any second
            for t in range(g0, hi):
                e = int(order[t - g0, choice])
                if counts[e] >= cap:
                    continue
                counts[e] += 1
                kept[(t, choice)] = e
        for t in range(g0, hi):
            e1, e2 = int(order[t - g0, 0]), int(order[t - g0, 1])
            denom = probs[t, e1] + probs[t, e2] + 1e-9
            if (t, 0) in kept:
                out[t] += probs[t, e1] / denom * ffn(t, e1)
            if (t, 1) in kept:
                out[t] += probs[t, e2] / denom * ffn(t, e2)
    return out


@pytest.mark.parametrize("capacity_factor,group_size,T",
                         [(2.0, 0, 32), (0.3, 0, 32), (0.5, 8, 32),
                          # ragged last group: padded rows must not enter
                          # the first-choice counts that offset the
                          # second-choice queues
                          (2.0, 8, 20), (0.5, 8, 20)])
def test_moe_top2_matches_per_token_oracle(capacity_factor, group_size, T):
    """GShard top-2: renormalised gates, first-choice queue priority,
    capacity drops hit second choices first."""
    E, D, H = 4, 8, 16
    moe = MoEMLP(D, H, E, capacity_factor=capacity_factor,
                 group_size=group_size, topk=2)
    rows = jax.random.normal(jax.random.PRNGKey(1), (T, D))
    params = moe.init(jax.random.PRNGKey(0), rows)
    got = moe.apply(params, rows)
    want = _moe_top2_oracle(
        jax.tree.map(np.asarray, params), np.asarray(rows), E,
        capacity_factor, group_size,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    if capacity_factor < 1.0:
        # some token must have exactly ONE surviving route (partial drop)
        top1 = _moe_oracle(jax.tree.map(np.asarray, params),
                           np.asarray(rows), E, capacity_factor * 2,
                           group_size)
        assert not np.allclose(want, top1)


def _moe_dit_pair(tp: int, topk: int = 1):
    kw = dict(
        img_size=8, patch_size=2, embed_dim=32, depth=2, num_heads=2,
        time_embed_dim=16, data_format="NHWC", dtype=jnp.float32,
        tp=tp, moe_experts=4, moe_capacity=2.0, moe_topk=topk,
    )
    full = DDDMDiT(tp_axis=None, **kw)
    local = DDDMDiT(tp_axis="model", **kw)
    xt = jnp.zeros((2, 8, 8, 3))
    params = full.init(jax.random.PRNGKey(0), xt, jnp.zeros((2,)), xt)
    return full, local, params


def test_moe_dit_forward_and_expert_rules():
    """MoE-DiT forward is finite and the rule table shards the expert dim."""
    from jax.sharding import PartitionSpec as P

    full, _, params = _moe_dit_pair(tp=2)
    mesh = make_mesh(tp=2)
    sh = tree_shardings(params, mesh, DIT_TP_RULES)
    p0 = sh["params"]["block_0"]["moe"]
    assert p0["experts_in"].spec == P("model")
    assert p0["router_kernel"].spec == P()

    xt = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    out = full.apply(params, xt, jnp.full((4,), 0.5), xt)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("topk", [1, 2])
def test_ep_train_step_matches_oracle(topk):
    """DP x EP training step with an ENGAGED global-norm clip == manual
    full-model oracle: each model shard computes only its E/tp experts
    (local expert weight slices), the g psum assembles the combines, and
    the f operators reassemble router/rows cotangents. Parametrised over
    Switch top-1 and GShard top-2 routing."""
    from ddm_tpu.parallel import MODEL_AXIS, clip_by_global_norm_sharded

    full, local, params = _moe_dit_pair(tp=2, topk=topk)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3))
    clip = 1e-3  # always engages

    mesh = make_mesh(tp=2)
    tx_ep = optax.chain(
        clip_by_global_norm_sharded(
            clip, tree_shardings(params, mesh, DIT_TP_RULES), MODEL_AXIS),
        optax.adam(1e-3),
    )
    state = TrainState.create(
        apply_fn=local.apply, params=jax.tree.map(jnp.copy, params), tx=tx_ep
    )
    state, shardings = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(local.apply, mesh, shardings,
                                   dp_shard_map=True, **hp)
    state, m_ep = step(state, key, shard_batch(batch, mesh))

    loss_fn = make_loss_fn(full.apply, **hp)
    ref = TrainState.create(
        apply_fn=full.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3)),
    )
    shards = batch.reshape(4, 2, 8, 8, 3)
    acc = None
    for i in range(4):
        ki = jax.random.fold_in(key, i)
        (_, mi), gi = jax.value_and_grad(loss_fn, has_aux=True)(
            ref.params, ki, shards[i]
        )
        if i == 0:
            loss0 = float(mi["loss"])
        acc = gi if acc is None else jax.tree.map(jnp.add, acc, gi)
    ref = ref.apply_gradients(grads=jax.tree.map(lambda g: g / 4, acc))

    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref.params)[0],
        jax.tree_util.tree_flatten_with_path(state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_moe_aux_matches_numpy_and_reaches_the_loss():
    """The sown Switch load-balance term equals independent numpy math on
    the block's router inputs, and make_moe_aux_apply actually delivers it
    into the training loss (a bare apply drops the sown collection)."""
    from ddm_tpu.models.moe import make_moe_aux_apply
    from ddm_tpu.training import distributional_training_step

    E, D, H, T = 4, 8, 16, 32
    moe = MoEMLP(D, H, E, capacity_factor=2.0)
    rows = jax.random.normal(jax.random.PRNGKey(1), (T, D))
    params = moe.init(jax.random.PRNGKey(0), rows)
    _, mut = moe.apply(params, rows, mutable=["losses"])
    (sown,) = jax.tree.leaves(mut["losses"])

    p = jax.tree.map(np.asarray, params)["params"]
    logits = np.asarray(rows) @ p["router_kernel"] + p["router_bias"]
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    onehot = np.eye(E, dtype=np.float32)[np.argmax(probs, axis=-1)]
    want = E * float(np.sum(onehot.mean(0) * probs.mean(0)))
    np.testing.assert_allclose(float(sown), want, rtol=1e-5)

    # aux gradient flows into the router (through mean softmax probs)
    def aux_of(prms):
        _, m2 = moe.apply(prms, rows, mutable=["losses"])
        return jax.tree.leaves(m2["losses"])[0]

    g = jax.grad(aux_of)(params)["params"]["router_kernel"]
    assert float(jnp.max(jnp.abs(g))) > 0.0

    # end-to-end through the training step: loss(aux) == loss(no aux) + aux
    full, _, dit_params = _moe_dit_pair(tp=1)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    key = jax.random.PRNGKey(7)
    x0 = jax.random.normal(jax.random.PRNGKey(8), (4, 8, 8, 3))
    base_loss, base_metrics = distributional_training_step(
        full.apply, dit_params, key, x0, **hp)
    assert "moe_aux" not in base_metrics  # bare apply: contract unchanged

    w = 0.01
    aux_apply = make_moe_aux_apply(full, w)
    loss, metrics = distributional_training_step(
        aux_apply, dit_params, key, x0, **hp)
    assert float(metrics["moe_aux"]) > 0.0
    np.testing.assert_allclose(
        float(loss), float(base_loss) + float(metrics["moe_aux"]), rtol=1e-6)
    # mean over the 2 MoE blocks, scaled by the weight
    assert float(metrics["moe_aux"]) < w * 2.0  # aux/block is O(1)


def test_ep_train_step_with_aux_matches_oracle():
    """The Switch aux under expert parallelism: aux is computed identically
    on every model shard from tp_region_enter'd values, so its cotangents
    must be scaled 1/tp before the enter psum — otherwise the router (and
    block input) gradients are over-counted tp-fold. One engaged-clip
    DP x EP step with the aux apply must equal the full-model oracle
    leaf-for-leaf."""
    from ddm_tpu.models.moe import make_moe_aux_apply
    from ddm_tpu.parallel import MODEL_AXIS, clip_by_global_norm_sharded

    full, local, params = _moe_dit_pair(tp=2)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3))
    clip = 1e-3  # always engages

    mesh = make_mesh(tp=2)
    tx_ep = optax.chain(
        clip_by_global_norm_sharded(
            clip, tree_shardings(params, mesh, DIT_TP_RULES), MODEL_AXIS),
        optax.adam(1e-3),
    )
    state = TrainState.create(
        apply_fn=local.apply, params=jax.tree.map(jnp.copy, params), tx=tx_ep
    )
    state, shardings = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(
        make_moe_aux_apply(local, 0.5), mesh, shardings,
        dp_shard_map=True, **hp)
    state, m_ep = step(state, key, shard_batch(batch, mesh))
    assert float(m_ep["moe_aux"]) > 0.0

    loss_fn = make_loss_fn(make_moe_aux_apply(full, 0.5), **hp)
    ref = TrainState.create(
        apply_fn=full.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3)),
    )
    shards = batch.reshape(4, 2, 8, 8, 3)
    acc = None
    aux_vals = []
    for i in range(4):
        ki = jax.random.fold_in(key, i)
        (_, mi), gi = jax.value_and_grad(loss_fn, has_aux=True)(
            ref.params, ki, shards[i]
        )
        aux_vals.append(float(mi["moe_aux"]))
        acc = gi if acc is None else jax.tree.map(jnp.add, acc, gi)
    ref = ref.apply_gradients(grads=jax.tree.map(lambda g: g / 4, acc))

    # the per-shard aux VALUE must be the full aux (not aux/tp)
    np.testing.assert_allclose(
        float(m_ep["moe_aux"]), np.mean(aux_vals), rtol=1e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref.params)[0],
        jax.tree_util.tree_flatten_with_path(state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_moe_aux_apply_rejects_dense_model():
    from ddm_tpu.models.moe import make_moe_aux_apply

    dense = DDDMDiT(img_size=8, patch_size=2, embed_dim=32, depth=1,
                    num_heads=2, time_embed_dim=16, data_format="NHWC")
    xt = jnp.zeros((1, 8, 8, 3))
    params = dense.init(jax.random.PRNGKey(0), xt, jnp.zeros((1,)), xt)
    with pytest.raises(ValueError, match="sows no"):
        make_moe_aux_apply(dense, 0.01)(params, xt, jnp.zeros((1,)), xt)


def test_moe_validation():
    with pytest.raises(ValueError, match="divisible"):
        DDDMDiT(img_size=8, patch_size=2, embed_dim=32, depth=1,
                num_heads=2, time_embed_dim=16, tp=2, moe_experts=3,
                ).init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 8, 8)),
                       jnp.zeros((1,)), jnp.zeros((1, 3, 8, 8)))


def _moe_sp_dit_pair(topk: int = 1):
    """SP+EP pair with routing groups ALIGNED to the token shards.

    group_size=8 with N=16, tp=2: every group is one image's 8-token
    shard half in BOTH layouts (the a2a path groups each shard's local
    flatten; the replicated oracle groups the global flatten — with
    group_size dividing the local token count the partitions and the
    within-group queueing order coincide), so the full model is an EXACT
    oracle for the capacity-sliced all_to_all dispatch.
    """
    kw = dict(
        img_size=8, patch_size=2, embed_dim=32, depth=2, num_heads=2,
        time_embed_dim=16, data_format="NHWC", dtype=jnp.float32,
        tp=2, moe_experts=4, moe_capacity=2.0, moe_topk=topk,
        moe_group_size=8, sequence_parallel=True,
    )
    full = DDDMDiT(tp_axis=None, **kw)
    local = DDDMDiT(tp_axis="model", **kw)
    xt = jnp.zeros((2, 8, 8, 3))
    params = full.init(jax.random.PRNGKey(0), xt, jnp.zeros((2,)), xt)
    return full, local, params


@pytest.mark.parametrize("topk", [1, 2])
def test_sp_ep_a2a_train_step_matches_oracle(topk):
    """DP x SP x EP training step (capacity-sliced all_to_all dispatch)
    == manual full-model oracle: tokens stay sharded through the MoE
    block, each shard routes only its own rows, the expert-FFN inputs
    cross the model axis as (E, slots, D) all_to_alls (forward AND
    transpose), and no full-(T, D) psum pair exists on the MoE path.
    Engaged global-norm clip; Switch top-1 and GShard top-2."""
    from ddm_tpu.parallel import MODEL_AXIS, clip_by_global_norm_sharded

    full, local, params = _moe_sp_dit_pair(topk=topk)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3))
    clip = 1e-3  # always engages

    mesh = make_mesh(tp=2)
    tx = optax.chain(
        clip_by_global_norm_sharded(
            clip, tree_shardings(params, mesh, DIT_TP_RULES), MODEL_AXIS),
        optax.adam(1e-3),
    )
    state = TrainState.create(
        apply_fn=local.apply, params=jax.tree.map(jnp.copy, params), tx=tx
    )
    state, shardings = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(local.apply, mesh, shardings,
                                   dp_shard_map=True, **hp)
    state, m_sp = step(state, key, shard_batch(batch, mesh))
    assert np.isfinite(float(m_sp["loss"]))

    loss_fn = make_loss_fn(full.apply, **hp)
    ref = TrainState.create(
        apply_fn=full.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3)),
    )
    shards = batch.reshape(4, 2, 8, 8, 3)
    acc = None
    for i in range(4):
        ki = jax.random.fold_in(key, i)
        (_, mi), gi = jax.value_and_grad(loss_fn, has_aux=True)(
            ref.params, ki, shards[i]
        )
        acc = gi if acc is None else jax.tree.map(jnp.add, acc, gi)
    ref = ref.apply_gradients(grads=jax.tree.map(lambda g: g / 4, acc))

    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref.params)[0],
        jax.tree_util.tree_flatten_with_path(state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_sp_ep_a2a_train_step_with_aux_matches_oracle():
    """The Switch aux under SP+EP: only T/tp tokens live per shard, so
    the (E,) count/prob sums cross the axis via psum and the cotangents
    carry the same 1/tp scale as the replicated-EP aux (the psum
    transpose is itself a psum under check_vma=False). Per-shard aux
    VALUE must equal the full-model aux, and one engaged-clip step must
    match the oracle leaf-for-leaf."""
    from ddm_tpu.models.moe import make_moe_aux_apply
    from ddm_tpu.parallel import MODEL_AXIS, clip_by_global_norm_sharded

    full, local, params = _moe_sp_dit_pair(topk=1)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3))
    clip = 1e-3

    mesh = make_mesh(tp=2)
    tx = optax.chain(
        clip_by_global_norm_sharded(
            clip, tree_shardings(params, mesh, DIT_TP_RULES), MODEL_AXIS),
        optax.adam(1e-3),
    )
    state = TrainState.create(
        apply_fn=local.apply, params=jax.tree.map(jnp.copy, params), tx=tx
    )
    state, shardings = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(
        make_moe_aux_apply(local, 0.5), mesh, shardings,
        dp_shard_map=True, **hp)
    state, m_sp = step(state, key, shard_batch(batch, mesh))
    assert float(m_sp["moe_aux"]) > 0.0

    loss_fn = make_loss_fn(make_moe_aux_apply(full, 0.5), **hp)
    ref = TrainState.create(
        apply_fn=full.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3)),
    )
    shards = batch.reshape(4, 2, 8, 8, 3)
    acc = None
    aux_vals = []
    for i in range(4):
        ki = jax.random.fold_in(key, i)
        (_, mi), gi = jax.value_and_grad(loss_fn, has_aux=True)(
            ref.params, ki, shards[i]
        )
        aux_vals.append(float(mi["moe_aux"]))
        acc = gi if acc is None else jax.tree.map(jnp.add, acc, gi)
    ref = ref.apply_gradients(grads=jax.tree.map(lambda g: g / 4, acc))

    np.testing.assert_allclose(
        float(m_sp["moe_aux"]), np.mean(aux_vals), rtol=1e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref.params)[0],
        jax.tree_util.tree_flatten_with_path(state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(pa),
        )
