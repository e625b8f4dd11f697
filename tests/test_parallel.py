"""Distributed-without-a-cluster tests (SURVEY §4): 8 virtual CPU devices.

Asserts that sharded training is *numerically equivalent* to single-device
training: the same params + same keys + the same global batch give the same
loss and the same updated parameters whether the batch lives on 1 device or
is sharded over 8, and whether DiT params are replicated or tensor-sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ddm_tpu.models.dit import DDDMDiT
from ddm_tpu.models.mlp import DDDMMLP
from ddm_tpu.parallel import (
    DIT_TP_RULES,
    REPLICATED_RULES,
    make_mesh,
    make_sharded_train_step,
    place_train_state,
    shard_batch,
    spec_for_path,
    tree_shardings,
)
from ddm_tpu.training import TrainState, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh(tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(tp=3)


def test_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert spec_for_path("block_0/attn/qkv/kernel", DIT_TP_RULES) == P(None, "model")
    assert spec_for_path("block_3/ff_out/kernel", DIT_TP_RULES) == P("model", None)
    assert spec_for_path("patch_proj/kernel", DIT_TP_RULES) == P()
    assert spec_for_path("anything", REPLICATED_RULES) == P()
    # separate column-parallel q/k/v projections (tp > 1 model tree)
    for proj in ("q", "k", "v"):
        assert spec_for_path(f"block_0/attn/{proj}/kernel", DIT_TP_RULES) == \
            P(None, "model")
        assert spec_for_path(f"block_0/attn/{proj}/bias", DIT_TP_RULES) == \
            P("model")
    assert spec_for_path("block_0/attn/proj/kernel", DIT_TP_RULES) == \
        P("model", None)


def _mlp_state(lr=1e-2):
    model = DDDMMLP(hidden=32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2)), jnp.zeros((1,)), jnp.zeros((1, 2))
    )
    return model, TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(lr)
    )


def test_dp_matches_single_device():
    """Jit-sharded DP step == single-device step, bit-for-bit-ish."""
    model, state_single = _mlp_state()
    _, state_dp = _mlp_state()
    hp = dict(m=4, beta=0.1, lam=1.0, w_bias=0.0)

    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(jax.random.PRNGKey(43), (64, 2)) + 3.0

    single_step = make_train_step(model.apply, **hp)

    mesh = make_mesh()  # 8-way data parallel
    state_dp, shardings = place_train_state(state_dp, mesh, REPLICATED_RULES)
    dp_step = make_sharded_train_step(model.apply, mesh, shardings,
                                      dp_shard_map=False, **hp)

    for i in range(3):
        k = jax.random.fold_in(key, i)
        state_single, m_single = single_step(state_single, k, x0)
        state_dp, m_dp = dp_step(state_dp, k, shard_batch(x0, mesh))
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_dp["loss"]), rtol=2e-5
        )

    flat_s = jax.tree.leaves(state_single.params)
    flat_d = jax.tree.leaves(state_dp.params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_dp_shard_map_matches_manual_shard_oracle():
    """shard_map DP step == manual per-shard emulation on one device.

    The shard_map path folds the data-axis index into the PRNG key and
    pmean-reduces grads/metrics; emulating exactly that on a single device
    (loop over shards with fold_in(key, i)) must reproduce loss and the
    updated params to fp tolerance.
    """
    import optax

    from ddm_tpu.training import make_loss_fn

    model, state_sm = _mlp_state()
    _, state_ref = _mlp_state()
    hp = dict(m=4, beta=0.1, lam=1.0, w_bias=0.0)
    n_dev = 8

    key = jax.random.PRNGKey(7)
    x0 = jax.random.normal(jax.random.PRNGKey(8), (64, 2)) + 3.0

    mesh = make_mesh()
    state_sm, shardings = place_train_state(state_sm, mesh, REPLICATED_RULES)
    sm_step = make_sharded_train_step(model.apply, mesh, shardings,
                                      dp_shard_map=True, **hp)
    state_sm, m_sm = sm_step(state_sm, key, shard_batch(x0, mesh))

    # manual oracle
    loss_fn = make_loss_fn(model.apply, **hp)
    shards = x0.reshape(n_dev, -1, 2)
    grads_acc = None
    losses = []
    for i in range(n_dev):
        ki = jax.random.fold_in(key, i)
        (_, mi), gi = jax.value_and_grad(loss_fn, has_aux=True)(
            state_ref.params, ki, shards[i]
        )
        losses.append(float(mi["loss"]))
        grads_acc = gi if grads_acc is None else jax.tree.map(
            jnp.add, grads_acc, gi
        )
    grads_mean = jax.tree.map(lambda g: g / n_dev, grads_acc)
    state_ref = state_ref.apply_gradients(grads=grads_mean)

    np.testing.assert_allclose(float(m_sm["loss"]), np.mean(losses), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(state_ref.params),
                    jax.tree.leaves(state_sm.params)):
        # Adam's 1/(sqrt(v)+eps) at step 1 amplifies fp noise on near-zero
        # grads; the exact loss assert above is the strict equivalence check
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def _tiny_dit():
    model = DDDMDiT(
        img_size=8, patch_size=2, embed_dim=32, depth=2, num_heads=2,
        time_embed_dim=16, data_format="NHWC",
    )
    xt = jnp.zeros((2, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), xt, jnp.zeros((2,)), xt)
    return model, params


def test_tp_forward_matches_replicated():
    """Tensor-sharded DiT forward == replicated forward on the same params."""
    model, params = _tiny_dit()
    xt = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    xi = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 3))
    t = jnp.full((4,), 0.4)
    want = model.apply(params, xt, t, xi)

    mesh = make_mesh(tp=2)
    shardings = tree_shardings(params, mesh, DIT_TP_RULES)
    params_tp = jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)

    fwd = jax.jit(model.apply)
    got = fwd(params_tp, xt, t, xi)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-4, atol=1e-5)


def test_dp_tp_train_step_runs_and_matches():
    """Full DP+TP DiT training step == single-device step."""
    model, params = _tiny_dit()
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)

    def fresh_state():
        # copy: the jitted steps donate their state, so the two states must
        # not alias the same buffers
        return TrainState.create(
            apply_fn=model.apply, params=jax.tree.map(jnp.copy, params), tx=tx
        )

    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3))

    single_step = make_train_step(model.apply, **hp)
    s1, m1 = single_step(fresh_state(), key, batch)

    mesh = make_mesh(tp=2)  # 4-way DP x 2-way TP
    s2, shardings = place_train_state(fresh_state(), mesh, DIT_TP_RULES)
    tp_step = make_sharded_train_step(model.apply, mesh, shardings, **hp)
    s2, m2 = tp_step(s2, key, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=5e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        # TP psum reduction order differs from the single-device sum; the
        # residual is pure fp32 noise (~1e-5 absolute after one adamw step)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-5)


def _tp_dit_pair(tp: int, sp: bool = False):
    """(full, local) DDDMDiT instances sharing one param tree.

    embed_dim=256 / heads=4 so the LOCAL shard shapes (D/tp = 128,
    Dh = 64, hidden/tp = 512) satisfy the Pallas kernel lane gating — the
    configuration the kernel-activity assertion depends on. ``sp`` puts the
    LOCAL instance in sequence-parallel mode (token-sharded residual
    stream); the param tree is unchanged.
    """
    kw = dict(
        img_size=8, patch_size=2, embed_dim=256, depth=2, num_heads=4,
        time_embed_dim=16, data_format="NHWC", dtype=jnp.float32,
    )
    full = DDDMDiT(tp=tp, tp_axis=None, **kw)
    local = DDDMDiT(tp=tp, tp_axis="model", sequence_parallel=sp, **kw)
    xt = jnp.zeros((1, 8, 8, 3))
    params = full.init(jax.random.PRNGKey(0), xt, jnp.zeros((1,)), xt)
    return full, local, params


def test_tp_shard_map_fused_kernels_match_oracle(monkeypatch):
    """DP+TP shard_map step with the PALLAS KERNELS ACTIVE (interpret mode)
    == manual full-model per-data-shard oracle: loss exact, every updated
    param leaf equal, and the fused attention + MLP kernels actually ran
    inside the shard_map body (VERDICT r1 item 3 acceptance)."""
    from ddm_tpu.training import make_loss_fn

    monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
    import ddm_tpu.ops.attention as attn_mod
    import ddm_tpu.ops.mlp_block as mlp_mod

    counts = {"attn": 0, "mlp": 0}
    orig_a, orig_m = attn_mod._pallas_call, mlp_mod._pallas_call

    def spy(name, orig):
        def wrapped(*a, **k):
            counts[name] += 1
            return orig(*a, **k)
        return wrapped

    monkeypatch.setattr(attn_mod, "_pallas_call", spy("attn", orig_a))
    monkeypatch.setattr(mlp_mod, "_pallas_call", spy("mlp", orig_m))

    full, local, params = _tp_dit_pair(tp=2)
    tx = optax.adam(1e-3)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3))

    mesh = make_mesh(tp=2)  # 4-way DP x 2-way TP
    state = TrainState.create(
        apply_fn=local.apply, params=jax.tree.map(jnp.copy, params), tx=tx
    )
    state, shardings = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(local.apply, mesh, shardings,
                                   dp_shard_map=True, **hp)
    state, m_tp = step(state, key, shard_batch(batch, mesh))
    kernel_calls = dict(counts)
    assert kernel_calls["attn"] > 0, "fused attention kernel not active under TP"
    assert kernel_calls["mlp"] > 0, "fused MLP kernel not active under TP"

    # manual oracle: full (unsharded) model, 4 data shards, fold_in(key, i)
    loss_fn = make_loss_fn(full.apply, **hp)
    ref = TrainState.create(
        apply_fn=full.apply, params=jax.tree.map(jnp.copy, params), tx=tx
    )
    shards = batch.reshape(4, 2, 8, 8, 3)
    acc, losses = None, []
    for i in range(4):
        ki = jax.random.fold_in(key, i)
        (_, mi), gi = jax.value_and_grad(loss_fn, has_aux=True)(
            ref.params, ki, shards[i]
        )
        losses.append(float(mi["loss"]))
        acc = gi if acc is None else jax.tree.map(jnp.add, acc, gi)
    ref = ref.apply_gradients(grads=jax.tree.map(lambda g: g / 4, acc))

    np.testing.assert_allclose(float(m_tp["loss"]), np.mean(losses), rtol=2e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref.params)[0],
        jax.tree_util.tree_flatten_with_path(state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_tp_full_instance_matches_tp1_semantics():
    """The tp>1 model with tp_axis=None (separate q/k/v projections) is a
    well-formed denoiser: correct output shape/dtype and finite grads."""
    full, _, params = _tp_dit_pair(tp=2)
    xt = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    xi = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 3))
    t = jnp.full((4,), 0.3)
    out = full.apply(params, xt, t, xi)
    assert out.shape == (4, 8, 8, 3)
    g = jax.grad(
        lambda p: jnp.sum(full.apply(p, xt, t, xi) ** 2)
    )(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_replicate_tree_gathers_tp_shards():
    """replicate_tree all-gathers TP-sharded leaves to replicated arrays
    with unchanged values and leaves replicated/non-array leaves untouched
    (the TP-multihost eval prerequisite in train_cifar10_dit.evaluate)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddm_tpu.parallel import replicate_tree

    mesh = make_mesh(tp=2)
    w = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    b = np.arange(6, dtype=np.float32)
    tree = {
        "kernel": jax.device_put(w, NamedSharding(mesh, P(None, "model"))),
        "bias": jax.device_put(b, NamedSharding(mesh, P())),
        "step": 3,
    }
    out = replicate_tree(tree)
    assert out["step"] == 3
    assert out["bias"] is tree["bias"]  # already replicated: untouched
    assert out["kernel"].sharding.is_fully_replicated
    assert out["kernel"].is_fully_addressable
    np.testing.assert_array_equal(np.asarray(out["kernel"]), w)
    np.testing.assert_array_equal(
        np.asarray(out["kernel"].addressable_data(0)), w
    )


def test_tp_shard_map_engaged_grad_clip_matches_oracle():
    """TP shard_map step with an ENGAGED global-norm clip == full-model
    oracle — requires the axis-aware clipper.

    Regression test: inside the shard_map body, Megatron-sharded weight
    grads are LOCAL column/row slices, so a plain optax.clip_by_global_norm
    computes a different (wrong) norm on every model shard and scales
    updates inconsistently (measured 4.3e-5 max param error after one step
    at lr 1e-3 — a ~4% error on each update).
    clip_by_global_norm_sharded(axis='model') psums the disjoint local
    squared sums and de-duplicates the replicated leaves.
    """
    from ddm_tpu.parallel import MODEL_AXIS, clip_by_global_norm_sharded
    from ddm_tpu.training import make_loss_fn

    full, local, params = _tp_dit_pair(tp=2)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3))
    clip = 1e-3  # far below the init grad norm so the clip ALWAYS engages

    mesh = make_mesh(tp=2)
    tx_tp = optax.chain(
        clip_by_global_norm_sharded(
            clip, tree_shardings(params, mesh, DIT_TP_RULES), MODEL_AXIS),
        optax.adam(1e-3),
    )
    state = TrainState.create(
        apply_fn=local.apply, params=jax.tree.map(jnp.copy, params), tx=tx_tp
    )
    state, shardings = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(local.apply, mesh, shardings,
                                   dp_shard_map=True, **hp)
    state, m_tp = step(state, key, shard_batch(batch, mesh))

    loss_fn = make_loss_fn(full.apply, **hp)
    ref = TrainState.create(
        apply_fn=full.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3)),
    )
    shards = batch.reshape(4, 2, 8, 8, 3)
    acc = None
    for i in range(4):
        ki = jax.random.fold_in(key, i)
        (_, _), gi = jax.value_and_grad(loss_fn, has_aux=True)(
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


def test_sp_forward_matches_full_model():
    """Sequence-parallel shard_map forward == full-model oracle.

    Exercises the whole SP data path: f-wrapped token slice after the
    embed, per-block LN-on-local-tokens -> all_gather -> column-parallel
    attention -> token psum_scatter, the gathered MLP partial, and
    sp_region_exit before the head.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    full, sp_local, params = _tp_dit_pair(tp=2, sp=True)
    xt = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    xi = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 3))
    t = jnp.full((8,), 0.4)
    want = full.apply(params, xt, t, xi)

    mesh = make_mesh(tp=2)
    specs = jax.tree.map(
        lambda s: s.spec, tree_shardings(params, mesh, DIT_TP_RULES)
    )
    fwd = shard_map(
        sp_local.apply, mesh=mesh,
        in_specs=(specs, P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    )
    got = fwd(params, xt, t, xi)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=2e-4, atol=1e-5
    )


def test_sp_train_step_matches_oracle():
    """DP x TP sequence-parallel training step with an ENGAGED global-norm
    clip == manual full-model oracle: every updated param leaf equal.

    The gradient path crosses every SP boundary operator — the f-wrapped
    embed slice (replicated embed/time/pos grads must be full, not
    1/tp-partial), the raw all_gather/psum_scatter pairs inside the blocks
    (transpose-correct per se), the f-wrapped LN/bias params consumed on
    token shards, and sp_region_exit's slice-own-shard backward (a raw
    gather here would over-count every cotangent tp-fold).
    """
    from ddm_tpu.parallel import MODEL_AXIS, clip_by_global_norm_sharded
    from ddm_tpu.training import make_loss_fn

    full, sp_local, params = _tp_dit_pair(tp=2, sp=True)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    key = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 3))
    clip = 1e-3  # far below the init grad norm so the clip ALWAYS engages

    mesh = make_mesh(tp=2)
    tx_tp = optax.chain(
        clip_by_global_norm_sharded(
            clip, tree_shardings(params, mesh, DIT_TP_RULES), MODEL_AXIS),
        optax.adam(1e-3),
    )
    state = TrainState.create(
        apply_fn=sp_local.apply, params=jax.tree.map(jnp.copy, params),
        tx=tx_tp,
    )
    state, shardings = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(sp_local.apply, mesh, shardings,
                                   dp_shard_map=True, **hp)
    state, m_sp = step(state, key, shard_batch(batch, mesh))

    loss_fn = make_loss_fn(full.apply, **hp)
    ref = TrainState.create(
        apply_fn=full.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3)),
    )
    shards = batch.reshape(4, 2, 8, 8, 3)
    acc = None
    for i in range(4):
        ki = jax.random.fold_in(key, i)
        (_, _), gi = jax.value_and_grad(loss_fn, has_aux=True)(
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
