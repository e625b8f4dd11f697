"""REAL 2-process execution smoke tests (VERDICT r2 missing-item 3).

Every multi-process path (``ArrayLoader`` process slicing, ``shard_batch``
global assembly, DP gradient allreduce, ``process_allgather`` eval
statistics, and the model/pipe-axis collectives) was previously
implemented and unit-tested single-process only; these tests actually
launch TWO OS processes, connect them with ``jax.distributed.initialize``
over localhost (the Gloo CPU collective backend — r2's ROADMAP claimed
this jaxlib lacked service support, which turned out to be wrong), run
the paths for real, and assert

  * both processes agree bit-for-bit on every global quantity, and
  * the global quantities match a single-process oracle computed here.

Pod runbook (real slices): the launch is the same two commands with the
coordinator address set to host 0's IP — see README's multi-host section.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_workers(tmp_path, mode: str, devices_per_process: int):
    """Run both workers to completion and return their result dicts.

    Workers are polled against one shared deadline and KILLED on exit
    (a worker that dies at startup leaves its peer blocked inside
    ``jax.distributed.initialize``; a naive sequential communicate() would
    hang for the full timeout and leak the survivor into the pytest run).
    """
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "two_process_worker.py")
    outs = [tmp_path / f"{mode}{i}.json" for i in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins CPU via jax.config itself
    # the pytest parent exports an 8-virtual-device XLA_FLAGS the workers
    # would otherwise inherit
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(outs[i]), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    try:
        logs = ["", ""]
        import time

        deadline = time.monotonic() + 300
        while any(p.poll() is None for p in procs):
            if time.monotonic() > deadline:
                raise AssertionError(
                    "workers exceeded the 300 s deadline: "
                    + " | ".join(
                        f"worker {i} rc={p.poll()}" for i, p in enumerate(procs)
                    )
                )
            time.sleep(0.2)
        for i, p in enumerate(procs):
            logs[i] = p.communicate()[0].decode()
            assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return [json.loads(o.read_text()) for o in outs]


def test_two_process_dp_and_eval_paths(tmp_path):
    r0, r1 = _launch_workers(tmp_path, "dp", devices_per_process=1)

    # distributed topology came up: 2 processes, 1 local / 2 global devices
    for r in (r0, r1):
        assert r["process_count"] == 2
        assert r["local_devices"] == 1
        assert r["global_devices"] == 2
    assert {r0["process_index"], r1["process_index"]} == {0, 1}

    # loader slicing: each process got 4-row halves of the 8-row global
    # batches, and the halves are disjoint (different sums)
    assert r0["local_rows"] == r1["local_rows"] == [4, 4]
    assert r0["first_batch_sum"] != r1["first_batch_sum"]

    # global assembly: the sharded array is the full global batch
    assert r0["global_shape"] == r1["global_shape"] == [8, 2, 2, 1]
    # sum over global batch 0 = sum(0..31) = 496, identical on both
    assert r0["global_batch_sum"] == r1["global_batch_sum"] == 496.0

    # DP step: gradients allreduced — identical updates on both processes,
    # equal to the single-process oracle d/dw mean((w*x - 1)^2) at w=2
    x = np.arange(32, dtype=np.float32).reshape(8, 2, 2, 1)
    oracle_grad = float(np.mean(2.0 * (2.0 * x - 1.0) * x))
    assert r0["grad"] == r1["grad"]
    np.testing.assert_allclose(r0["grad"], oracle_grad, rtol=1e-6)
    assert r0["updated_w"] == r1["updated_w"]

    # process_allgather eval reduction: stats identical across processes
    # and equal to single-process stats over the full 8-row set
    np.testing.assert_array_equal(r0["stats_mu"], r1["stats_mu"])
    assert r0["stats_sigma_trace"] == r1["stats_sigma_trace"]
    flat = (np.arange(32, dtype=np.float32).reshape(8, -1) / 31.0)
    feats = np.concatenate([flat, flat**2], axis=-1)
    np.testing.assert_allclose(r0["stats_mu"], feats.mean(0), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(
        r0["stats_sigma_trace"],
        np.trace(np.cov(feats, rowvar=False)), rtol=1e-5)


def test_two_process_tensor_parallel_psum(tmp_path):
    """Model axis spanning OS processes: a Megatron column/row-parallel
    matmul pair whose row-parallel psum rides the cross-process Gloo link
    — the pod-TP communication pattern — must match the full-matmul
    oracle (to fp32 reduction-reassociation tolerance: the split psum
    sums two 16-term partials where the oracle runs one 32-term dot) and
    agree bit-for-bit BETWEEN the processes; the GPipe ppermute transport
    must rotate payloads across the boundary exactly."""
    r0, r1 = _launch_workers(tmp_path, "tp", devices_per_process=2)
    for r in (r0, r1):
        assert r["process_count"] == 2
        assert r["local_devices"] == 2
        assert r["global_devices"] == 4
        assert r["model_axis_spans_processes"] is True
        assert r["max_err"] < 1e-5
        assert r["ppermute_ok"] is True  # PP transport crosses processes
    assert r0["y_sum"] == r1["y_sum"]
