"""Multi-host eval correctness without a pod (VERDICT r1 item 6).

A real 2-process run needs two coordinated JAX processes; per SURVEY §4 the
substitute is process-count-parameterised unit tests of the two pieces the
pod path is made of:

  1. loader slicing — each process's ArrayLoader yields a disjoint,
     position-stable slice of every global batch, and the slices
     reassemble to exactly the single-process batch;
  2. feature/pixel assembly — compute_activation_statistics /
     compute_image_mmd with ``multihost=True`` cap per-process collection
     at max_items/process_count and compute the statistic over the
     allgathered global set (allgather emulated here), reproducing the
     single-process result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddm_tpu.metrics as metrics_mod
from ddm_tpu.data.cifar10 import ArrayLoader, CIFAR10Arrays
from ddm_tpu.metrics import (
    _local_cap,
    compute_activation_statistics,
    compute_image_mmd,
)


def _dataset(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return CIFAR10Arrays(
        images=rng.integers(0, 256, size=(n, 32, 32, 3), dtype=np.uint8),
        labels=rng.integers(0, 10, size=n).astype(np.int64),
    )


@pytest.mark.parametrize("pc", [2, 4])
@pytest.mark.parametrize("shuffle", [False, True])
def test_loader_process_slices_partition_global_batches(pc, shuffle):
    data = _dataset()
    kw = dict(batch_size=16, shuffle=shuffle, drop_last=True,
              normalize=True, seed=3)
    single = ArrayLoader(data, **kw)
    per_proc = [
        ArrayLoader(data, **kw, process_index=p, process_count=pc)
        for p in range(pc)
    ]
    for batches in zip(single, *per_proc):
        global_imgs = batches[0][0]
        local = [b[0] for b in batches[1:]]
        assert all(x.shape[0] == 16 // pc for x in local)
        np.testing.assert_array_equal(np.concatenate(local, axis=0),
                                      global_imgs)


def test_loader_rejects_ragged_multihost():
    with pytest.raises(ValueError, match="drop_last"):
        ArrayLoader(_dataset(), batch_size=16, shuffle=False,
                    drop_last=False, normalize=True,
                    process_index=0, process_count=2)


class _FakePod:
    """Emulate a 2-process pod for the assembly logic: patches
    jax.process_count (as seen by ddm_tpu.metrics) and replaces
    _allgather_rows with a concatenation over the known per-process rows."""

    def __init__(self, monkeypatch, local_rows_by_process):
        monkeypatch.setattr(metrics_mod.jax, "process_count",
                            lambda: len(local_rows_by_process))
        order = list(local_rows_by_process.values())
        monkeypatch.setattr(
            metrics_mod, "_allgather_rows",
            lambda rows: np.concatenate(order, axis=0),
        )


def _fake_embedder(images):
    x = jnp.asarray(images, jnp.float32).reshape(images.shape[0], -1)
    return x[:, :32] - jnp.mean(x, axis=1, keepdims=True)


def test_local_cap():
    assert _local_cap(10, False) == 10
    assert _local_cap(None, True) is None


def test_multihost_activation_statistics_match_single_process(monkeypatch):
    rng = np.random.default_rng(1)
    images = rng.uniform(-1, 1, size=(16, 3, 8, 8)).astype(np.float32)
    mu_full, cov_full = compute_activation_statistics(
        [images], _fake_embedder, max_items=16
    )

    halves = {0: images[:8], 1: images[8:]}
    local_feats = {
        p: np.asarray(_fake_embedder(v))[:8] for p, v in halves.items()
    }
    _FakePod(monkeypatch, local_feats)
    for p in (0, 1):
        mu, cov = compute_activation_statistics(
            [halves[p]], _fake_embedder, max_items=16, multihost=True
        )
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_full),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_full),
                                   rtol=1e-5, atol=1e-6)


def test_multihost_image_mmd_matches_single_process(monkeypatch):
    rng = np.random.default_rng(2)
    fake = rng.uniform(-1, 1, size=(16, 3, 8, 8)).astype(np.float32)
    real = rng.uniform(-1, 1, size=(16, 3, 8, 8)).astype(np.float32)
    want = float(compute_image_mmd([fake], [real], max_items=16))

    # both loaders sliced per process; the fake pod gathers pixel rows
    flat = lambda a: a.reshape(a.shape[0], -1)
    monkeypatch.setattr(metrics_mod.jax, "process_count", lambda: 2)

    def gather_for(full):
        return lambda rows: np.concatenate(
            [flat(full[:8]), flat(full[8:])], axis=0)

    for p, (lo, hi) in enumerate([(0, 8), (8, 16)]):
        # _allgather_rows is called once for fake, once for real — emulate
        # with a stateful dispatcher keyed on the row contents
        calls = []

        def fake_allgather(rows):
            full = fake if len(calls) == 0 else real
            calls.append(1)
            return np.concatenate([flat(full[:8]), flat(full[8:])], axis=0)

        monkeypatch.setattr(metrics_mod, "_allgather_rows", fake_allgather)
        got = float(compute_image_mmd(
            [fake[lo:hi]], [real[lo:hi]], max_items=16, multihost=True
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5)
