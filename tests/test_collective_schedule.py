"""Multi-chip readiness: the collective schedule XLA actually emits.

No pod is reachable from this environment, so ROOFLINE §6's scaling
predictions rest on two legs: the analytic ring-collective model in
``ddm_tpu.parallel.ici`` and THESE assertions that the compiled HLO of
the sharded train steps moves exactly the bytes that model charges —
e.g. that DP emits one gradient allreduce pass totalling the fp32
parameter bytes, and FSDP replaces it with all-gather + reduce-scatter
of the same volume. If a refactor silently degrades the schedule
(per-parameter chatter, allreduce+slice instead of reduce-scatter), the
byte accounting fails here before any pod time is wasted.

Reference anchor: BASELINE config 5 ("multi-chip data-parallel ...
ICI allreduce"); SURVEY §5.8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ddm_tpu.models.dit import DDDMDiT, patchify_images
from ddm_tpu.models.mlp import DDDMMLP
from ddm_tpu.parallel import (
    DIT_TP_RULES, PIPE_AXIS, REPLICATED_RULES, clip_by_global_norm_sharded,
    fsdp_tree_shardings, make_mesh, make_pipe_mesh, make_pipelined_apply,
    make_sharded_train_step, pipeline_tree_shardings, place_train_state,
    shard_batch, to_pipeline_params,
)
from ddm_tpu.parallel.ici import (
    all_reduce_seconds, collective_footprint, collective_lines,
    dp_efficiency,
)
from ddm_tpu.training import TrainState

pytestmark = pytest.mark.slow

HP = dict(m=4, beta=0.1, lam=1.0, w_bias=0.0)


def _mlp_state():
    model = DDDMMLP(hidden=64)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)),
                        jnp.zeros((1,)), jnp.zeros((1, 2)))
    return model, TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-2))


def _compiled_hlo(step, state, batch):
    key = jax.random.PRNGKey(1)
    return jax.jit(step).lower(state, key, batch).compile().as_text()


def _param_bytes(params, dtype_bytes=4):
    return sum(x.size for x in jax.tree.leaves(params)) * dtype_bytes


def test_dp_grad_allreduce_bytes_match_analytic():
    """Replicated DP: all-reduced fp32 bytes == parameter bytes (+ the
    handful of scalar loss/metric means), in O(1) fused ops — the volume
    the ROOFLINE §6 model charges as 2*V*(n-1)/n over the ring."""
    model, state = _mlp_state()
    mesh = make_mesh()
    state, shardings = place_train_state(state, mesh, REPLICATED_RULES)
    step = make_sharded_train_step(model.apply, mesh, shardings,
                                   dp_shard_map=True, **HP)
    batch = shard_batch(np.zeros((64, 2), np.float32), mesh)
    hlo = _compiled_hlo(step, state, batch)
    fp = collective_footprint(hlo)
    assert "all-reduce" in fp, f"no allreduce in DP step: {fp}"
    count, byt = fp["all-reduce"]
    pbytes = _param_bytes(state.params)
    # grads fp32 == param bytes; scalars (loss/conf/inter/weight means,
    # grad-norm for the clipper) add < 1 KB
    assert pbytes <= byt <= pbytes + 1024, (byt, pbytes)
    # the allreduce combiner keeps it to a few fused ops, not per-param
    assert count <= 8, f"{count} allreduce ops — schedule degraded"
    # nothing else should appear in plain DP
    for kind in ("all-gather", "reduce-scatter", "all-to-all"):
        assert kind not in fp, f"unexpected {kind} in DP step: {fp}"


def test_fsdp_schedule_is_gather_plus_scatter():
    """ZeRO-3: the DP grad allreduce is replaced by param all-gathers
    (fwd + bwd recompute of the gather) and a grad reduce-scatter; the
    wire volume per phase is the analytic V*(n-1)/n, not 2x."""
    model, state = _mlp_state()
    mesh = make_mesh()
    fsdp_sh = fsdp_tree_shardings(state, mesh, min_size=64)
    state, sh = place_train_state(state, mesh, shardings=fsdp_sh)
    step = make_sharded_train_step(model.apply, mesh, sh,
                                   dp_shard_map=True, fsdp=True, **HP)
    batch = shard_batch(np.zeros((64, 2), np.float32), mesh)
    hlo = _compiled_hlo(step, state, batch)
    fp = collective_footprint(hlo)
    assert "all-gather" in fp, f"no all-gather in FSDP step: {fp}"
    assert "reduce-scatter" in fp or "all-reduce" in fp, fp
    # sharded params (min_size=64 leaves tiny biases replicated)
    sharded = sum(
        x.size for x, s in zip(jax.tree.leaves(state.params),
                               [s.spec for s in jax.tree.leaves(sh.params)])
        if any(ax for ax in s))
    _, ag_bytes = fp["all-gather"]
    # >= : the backward re-gathers; == would over-specify XLA's remat
    assert ag_bytes >= sharded * 4, (ag_bytes, sharded * 4)
    if "reduce-scatter" in fp:
        _, rs_bytes = fp["reduce-scatter"]
        # reduce-scatter output is the 1/n shard of the fp32 grads
        assert rs_bytes >= sharded * 4 // mesh.devices.size


def test_tp_emits_activation_allreduces():
    """Megatron TP (GSPMD path: replicated module + DIT_TP_RULES param
    shardings): per-block activation reductions ride the model axis on
    top of the data-axis grad allreduce."""
    from ddm_tpu.models.dit import DDDMDiT
    from ddm_tpu.parallel import DIT_TP_RULES

    mesh = make_mesh(tp=2)
    model = DDDMDiT(img_size=8, patch_size=2, embed_dim=32, depth=2,
                    num_heads=2, time_embed_dim=16, data_format="NHWC")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)),
                        jnp.zeros((2,)), jnp.zeros((2, 8, 8, 3)))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=optax.adam(1e-3))
    state, sh = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(model.apply, mesh, sh, **HP)
    batch = shard_batch(np.zeros((16, 8, 8, 3), np.float32), mesh)
    hlo = _compiled_hlo(step, state, batch)
    fp = collective_footprint(hlo)
    count = sum(fp.get(kind, (0, 0))[0]
                for kind in ("all-reduce", "reduce-scatter", "all-gather"))
    # at least per-block activation reductions beyond the fused grad
    # allreduce (GSPMD may lower psums as reduce-scatter+all-gather)
    assert count >= 3, f"TP step emitted only {count} collectives: {fp}"


def _tiny_dit(depth=2, **kw):
    model = DDDMDiT(img_size=8, patch_size=2, embed_dim=32, depth=depth,
                    num_heads=2, time_embed_dim=16, data_format="NHWC", **kw)
    xt = jnp.zeros((2, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), xt, jnp.zeros((2,)), xt)
    return model, params


def test_pp_schedule_permutes_microbatch_activations():
    """GPipe transport: the staged scan rotates activations with exactly
    ONE ppermute in the forward scan body and one (its transpose) in the
    backward, each moving one microbatch's token activations — the
    per-tick wire unit ROOFLINE §6 charges as
    ticks * (B_local*m/microbatches) * N * D bytes per step."""
    depth, pp, mb, B, m = 4, 4, 2, 8, 2
    model, params = _tiny_dit(depth=depth)
    mesh = make_pipe_mesh(pp=pp)
    pipe_params = to_pipeline_params(params, n_stages=pp)
    tx = optax.chain(
        clip_by_global_norm_sharded(
            1.0, pipeline_tree_shardings(pipe_params, mesh), PIPE_AXIS),
        optax.adamw(1e-3))
    state = TrainState.create(apply_fn=None, params=pipe_params, tx=tx)
    state, sh = place_train_state(
        state, mesh, shardings=pipeline_tree_shardings(state, mesh))
    step = make_sharded_train_step(
        make_pipelined_apply(model, n_stages=pp, n_microbatches=mb),
        mesh, sh, dp_shard_map=True,
        target_transform=lambda x: patchify_images(x, 2),
        m=m, beta=0.1, lam=1.0, w_bias=0.0)
    batch = shard_batch(np.zeros((B, 8, 8, 3), np.float32), mesh)
    fp = collective_footprint(_compiled_hlo(step, state, batch))

    assert "collective-permute" in fp, f"no ppermute in PP step: {fp}"
    count, byt = fp["collective-permute"]
    # one rotation op inside the fwd scan + its transpose in the bwd scan;
    # more would mean the rotation stopped being a single fused transfer
    assert count == 2, f"{count} ppermute ops — GPipe rotation degraded"
    B_local = B // mesh.shape["data"]
    tick = (B_local * m // mb) * 16 * 32 * 4  # microbatch fp32 (N=16, D=32)
    assert byt == 2 * tick, (byt, tick)
    # loss/head/embed psums over pipe + the data-axis grad reduce remain
    assert "all-reduce" in fp
    assert "all-to-all" not in fp


def test_ep_schedule_is_block_psums_not_all_to_all():
    """Expert parallelism as shipped (MoEMLP with tp>1): the transport is
    the Megatron f/g psum pair per block half — NOT a token all-to-all.
    Per block the fwd g-psum and bwd f-psum each move the block's token
    activations over the model axis; attention contributes its own pair.
    ROOFLINE §6's EP paragraph charges exactly this volume."""
    depth, tp, B, m = 2, 2, 8, 2
    kw = dict(tp=tp, moe_experts=4, moe_capacity=2.0, dtype=jnp.float32)
    _, params = _tiny_dit(depth=depth, tp_axis=None, **kw)
    local = DDDMDiT(img_size=8, patch_size=2, embed_dim=32, depth=depth,
                    num_heads=2, time_embed_dim=16, data_format="NHWC",
                    tp_axis="model", **kw)
    mesh = make_mesh(tp=tp)
    state = TrainState.create(apply_fn=local.apply, params=params,
                              tx=optax.adam(1e-3))
    state, sh = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(local.apply, mesh, sh,
                                   dp_shard_map=True, m=m, beta=0.1,
                                   lam=1.0, w_bias=0.0)
    batch = shard_batch(np.zeros((B, 8, 8, 3), np.float32), mesh)
    hlo = _compiled_hlo(step, state, batch)
    fp = collective_footprint(hlo)
    for kind in ("all-to-all", "all-gather", "reduce-scatter",
                 "collective-permute"):
        assert kind not in fp, f"unexpected {kind} in EP step: {fp}"

    lines = collective_lines(hlo)
    dp_n = mesh.devices.size // tp
    model_axis = [b for k, b, g in lines if k == "all-reduce" and g == tp]
    data_axis = [b for k, b, g in lines if k == "all-reduce" and g == dp_n]
    # 4 activation psums per block: attention {g fwd, f bwd} + MoE
    # {g fwd, f bwd}; each moves >= the block's token activations
    # (B_local*m, N, D) fp32, with <1 KB of fused router/aux scalars
    assert len(model_axis) == 4 * depth, (len(model_axis), lines)
    act = (B // dp_n) * m * 16 * 32 * 4
    for b in model_axis:
        assert act <= b <= act + 1024, (b, act)
    # gradients still reduce over data as ONE fused op
    assert len(data_axis) == 1, (data_axis, lines)
    pbytes = _param_bytes(state.params)
    assert data_axis[0] <= pbytes + 1024


def test_sp_ep_schedule_is_capacity_sliced_all_to_all():
    """SP+EP (sequence_parallel MoE): the expert transport is the
    capacity-sliced all_to_all pair — (E, slots, D) each way per block,
    forward and transpose — and NO full-(T, D) token psum rides the
    model axis (the remaining model-axis allreduces are the sub-KB
    router/LN-param f-psums and the (E,) aux stats). This pins the
    ROOFLINE §6 claim that SP+EP wire volume is the capacity slot
    fraction, not the token stream."""
    depth, tp, B, m = 2, 2, 8, 2
    kw = dict(tp=tp, moe_experts=4, moe_capacity=2.0, moe_group_size=8,
              sequence_parallel=True, dtype=jnp.float32)
    _, params = _tiny_dit(depth=depth, tp_axis=None, **kw)
    local = DDDMDiT(img_size=8, patch_size=2, embed_dim=32, depth=depth,
                    num_heads=2, time_embed_dim=16, data_format="NHWC",
                    tp_axis="model", **kw)
    mesh = make_mesh(tp=tp)
    state = TrainState.create(apply_fn=local.apply, params=params,
                              tx=optax.adam(1e-3))
    state, sh = place_train_state(state, mesh, DIT_TP_RULES)
    step = make_sharded_train_step(local.apply, mesh, sh,
                                   dp_shard_map=True, m=m, beta=0.1,
                                   lam=1.0, w_bias=0.0)
    batch = shard_batch(np.zeros((B, 8, 8, 3), np.float32), mesh)
    hlo = _compiled_hlo(step, state, batch)
    fp = collective_footprint(hlo)
    assert "all-to-all" in fp, f"no all_to_all in SP+EP step: {fp}"
    count, byt = fp["all-to-all"]
    # 2 per block forward (dispatch out + combine in) + their transposes
    assert count == 4 * depth, (count, fp)
    # each ships the (E, G*cap, D) slot tensor: E=4, G=T_local/gs=4,
    # cap=ceil(8*2.0/4)=4, D=32, fp32
    dp_n = mesh.devices.size // tp
    t_local = (B // dp_n) * m * (16 // tp)   # token rows per shard = 32
    slots = (t_local // 8) * 4               # G * cap = 16
    a2a_bytes = 4 * slots * 32 * 4           # E * slots * D * fp32
    assert byt == count * a2a_bytes, (byt, count * a2a_bytes)
    # No per-block token psum pair on the model axis (the replicated-EP
    # design would emit 4*depth of them = 4*depth*act bytes): the only
    # model-axis allreduce is ONE fused op carrying the sub-KB f-psums of
    # the entered params (LN scales/biases, router, pos-embed) + the (E,)
    # aux stats — ~10.5 KB total at this shape, vs 65 KB of token psums.
    act = (B // dp_n) * m * 16 * 32 * 4
    lines = collective_lines(hlo)
    ma_ar = [b for k, b, g in lines if k == "all-reduce" and g == tp]
    assert len(ma_ar) <= 4, (ma_ar, "model-axis allreduce unfused")
    assert sum(ma_ar) < 2 * act, (ma_ar, act,
                                  "token-sized psum leaked into SP+EP")


def test_moe_dp_schedule_single_fused_allreduce():
    """The shipped MoE config's DP schedule (replicated experts, fused
    Pallas dispatch path): still ONE fused fp32 gradient allreduce of the
    parameter bytes — the routing/dispatch machinery must not leak extra
    collectives or per-param chatter into the step."""
    model, params = _tiny_dit(depth=2, moe_experts=4, moe_capacity=2.0,
                              dtype=jnp.float32)
    mesh = make_mesh()
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=optax.adam(1e-3))
    state, sh = place_train_state(state, mesh, REPLICATED_RULES)
    step = make_sharded_train_step(model.apply, mesh, sh,
                                   dp_shard_map=True, m=2, beta=0.1,
                                   lam=1.0, w_bias=0.0)
    batch = shard_batch(np.zeros((8, 8, 8, 3), np.float32), mesh)
    fp = collective_footprint(_compiled_hlo(step, state, batch))
    assert set(fp) == {"all-reduce"}, fp
    count, byt = fp["all-reduce"]
    assert count <= 8, f"{count} allreduce ops — schedule degraded"
    pbytes = _param_bytes(state.params)
    # XLA DCEs a handful of provably-unused grad leaves in the fused
    # dispatch path, so allow a small deficit as well as the scalar means
    assert pbytes - 4096 <= byt <= pbytes + 1024, (byt, pbytes)


def test_analytic_model_sanity():
    """The §6 closed forms at the documented operating points."""
    # DiT-S: 58.1 MB fp32 grads, 120 ms step, 8 chips
    t = all_reduce_seconds(58.1e6, 8)
    assert 0.8e-3 < t < 1.3e-3  # ~1.0 ms on one v5e axis
    assert dp_efficiency(0.120, 58.1e6, 8) > 0.99
    # DiT-L: 1.215 GB grads, 967 ms step
    assert dp_efficiency(0.967, 1.2154e9, 8) > 0.97
    # unoverlapped lower bound still >95% for DiT-L
    assert dp_efficiency(0.967, 1.2154e9, 8, overlap=False) > 0.95
    # n=1 degenerates to no comms
    assert all_reduce_seconds(1e9, 1) == 0.0
    assert dp_efficiency(0.1, 1e9, 1) == 1.0


def test_collective_footprint_parser():
    hlo = """
  %all-reduce.1 = f32[14518788]{0} all-reduce(f32[14518788]{0} %p), to_apply=%add
  %ag = (f32[64,2]{1,0}, f32[64,64]{1,0}) all-gather-start(...), dimensions={0}
  %done = f32[64,64]{1,0} all-gather-done((f32[64,64]) %ag)
  %rs = bf16[8,16]{1,0} reduce-scatter(bf16[64,16]{1,0} %x), dimensions={0}
  %cp = f32[4]{0} collective-permute(f32[4]{0} %y), source_target_pairs={{0,1}}
"""
    fp = collective_footprint(hlo)
    assert fp["all-reduce"] == (1, 14518788 * 4)
    assert fp["all-gather"] == (1, (64 * 2 + 64 * 64) * 4)
    assert fp["reduce-scatter"] == (1, 8 * 16 * 2)
    assert fp["collective-permute"] == (1, 16)
