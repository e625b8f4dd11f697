"""Worker for the REAL 2-process smoke test (``test_two_process.py``).

Each instance is a separate OS process = a separate JAX process, exactly
like one host of a pod slice (SURVEY §5.8). The worker initialises
``jax.distributed``, then exercises every multi-process code path the
framework ships — loader process-slicing, global-batch assembly, a
DP train step with gradient allreduce, and the ``process_allgather``
eval reduction — and writes its observations to a JSON file the parent
test asserts on (including cross-process agreement and equality with a
single-process oracle).

Run directly:  python tests/two_process_worker.py <pid> <port> <out.json> [mode]

``mode`` is ``dp`` (default: loader slicing, global assembly, DP
allreduce, eval allgather) or ``tp`` — a Megatron column/row-parallel
matmul pair on a (data, model) mesh whose MODEL axis spans the two OS
processes (each process exposes 2 virtual devices; the mesh is built
transposed so the row-parallel psum rides the cross-process Gloo link —
the pod-TP communication pattern).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tp_mode(out_path: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # devices ordered [p0d0, p0d1, p1d0, p1d1]; TRANSPOSED reshape pairs
    # (p0d0, p1d0) and (p0d1, p1d1) on the model axis -> every model-axis
    # collective crosses the process boundary
    dev = np.array(jax.devices()).reshape(2, 2).T
    mesh = Mesh(dev, ("data", "model"))

    B, K, F = 8, 16, 32
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, K)),
                    jnp.float32)
    w1 = jnp.asarray(np.random.default_rng(1).normal(size=(K, F)),
                     jnp.float32)
    w2 = jnp.asarray(np.random.default_rng(2).normal(size=(F, K)),
                     jnp.float32)

    def body(x, w1s, w2s):
        h = jax.nn.gelu(x @ w1s)          # column-parallel: no comm
        return jax.lax.psum(h @ w2s, "model")  # row-parallel: psum

    y = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P(None, "model"), P("model", None)),
        out_specs=P("data", None),
    ))(jax.device_put(x, NamedSharding(mesh, P("data", None))),
       jax.device_put(w1, NamedSharding(mesh, P(None, "model"))),
       jax.device_put(w2, NamedSharding(mesh, P("model", None))))

    oracle = np.asarray(jax.nn.gelu(x @ w1) @ w2)
    got = np.asarray(
        jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(y))

    # ppermute over the process-spanning axis: the PIPELINE transport
    # (GPipe activation rotation) crossing the OS-process boundary
    stage_val = jnp.arange(4, dtype=jnp.float32).reshape(2, 2) + 1.0

    def rot(v):
        i = jax.lax.axis_index("model")
        mine = v[0] * (i + 1.0)  # stage-dependent payload
        return jax.lax.ppermute(
            mine, "model", [(0, 1), (1, 0)])[None]

    rotated = jax.jit(jax.shard_map(
        rot, mesh=mesh,
        in_specs=P("model", None), out_specs=P("model", None),
    ))(jax.device_put(stage_val, NamedSharding(mesh, P("model", None))))
    rotated = np.asarray(jax.jit(
        lambda a: a, out_shardings=NamedSharding(mesh, P()))(rotated))
    # stage 0 holds row0*1 -> lands on stage 1; stage 1 holds row1*2 -> stage 0
    ppermute_ok = bool(
        np.allclose(rotated[1], np.asarray(stage_val)[0] * 1.0)
        and np.allclose(rotated[0], np.asarray(stage_val)[1] * 2.0)
    )

    result = {
        "ppermute_ok": ppermute_ok,
        "pid": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "model_axis_spans_processes": (
            dev[0, 0].process_index != dev[0, 1].process_index
        ),
        "max_err": float(np.max(np.abs(got - oracle))),
        "y_sum": float(np.sum(got)),
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(result, f)


def main() -> None:
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"

    import jax

    # Force CPU BEFORE the first device query (the axon sitecustomize
    # re-pins the TPU platform; JAX_PLATFORMS env alone is ignored here).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )

    if mode == "tp":
        _tp_mode(out_path)
        return

    import jax.numpy as jnp
    import numpy as np

    import ddm_tpu.metrics as metrics
    from ddm_tpu.data.cifar10 import ArrayLoader, CIFAR10Arrays
    from ddm_tpu.parallel import make_mesh, shard_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    result = {
        "pid": pid,
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }

    # --- loader process slicing: each process sees its own half of every
    # global batch, in the deterministic (unshuffled) global order ---
    n, global_batch = 16, 8
    data = CIFAR10Arrays(
        images=np.arange(n * 4, dtype=np.float32).reshape(n, 2, 2, 1),
        labels=np.zeros((n,), np.int64),
    )
    loader = ArrayLoader(
        data, batch_size=global_batch, shuffle=False, drop_last=True,
        normalize=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    local_batches = [imgs for imgs, _ in loader]
    result["local_rows"] = [b.shape[0] for b in local_batches]
    result["first_batch_sum"] = float(np.sum(local_batches[0]))

    # --- global-batch assembly + DP allreduce: sum over the GLOBAL batch
    # must come out identical on every process ---
    mesh = make_mesh(tp=1)
    arr = shard_batch(local_batches[0], mesh)
    result["global_shape"] = list(arr.shape)
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    result["global_batch_sum"] = float(total)

    # --- one DP "train step": grad of a scalar loss over the sharded
    # global batch; XLA inserts the gradient allreduce. The updated
    # parameter must be bit-identical across processes and equal to the
    # single-process oracle the parent computes ---
    w = jax.device_put(jnp.float32(2.0), NamedSharding(mesh, P()))

    def loss(w, x):
        return jnp.mean((w * x - 1.0) ** 2)

    g = jax.jit(jax.grad(loss), out_shardings=NamedSharding(mesh, P()))(w, arr)
    result["grad"] = float(g)
    result["updated_w"] = float(w - 0.1 * g)

    # --- process_allgather eval reduction: multihost activation stats
    # must be identical on every process and equal to single-process
    # stats over the union of the per-process loaders ---
    feat_data = CIFAR10Arrays(
        images=np.arange(32, dtype=np.float32).reshape(8, 2, 2, 1) / 31.0,
        labels=np.zeros((8,), np.int64),
    )
    feat_loader = ArrayLoader(
        feat_data, batch_size=4, shuffle=False, drop_last=True,
        normalize=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )

    def embedder(images):
        flat = images.reshape(images.shape[0], -1)
        return jnp.concatenate([flat, flat**2], axis=-1)

    mu, sigma = metrics.compute_activation_statistics(
        feat_loader, embedder, max_items=8, multihost=True,
    )
    result["stats_mu"] = np.asarray(mu).tolist()
    result["stats_sigma_trace"] = float(jnp.trace(sigma))

    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
