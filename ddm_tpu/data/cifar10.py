"""CIFAR-10 input pipeline (host-side loading, device-side augmentation).

Re-implementation of the reference's torchvision pipeline
(``/root/reference/dddm/data.py:170-257``) without torch: the dataset is read
directly from the standard ``cifar-10-batches-py`` pickle files into pinned
host numpy arrays once, and batches stream to the device as raw uint8 NHWC.

TPU-first split of responsibilities (vs the reference, which runs reflect-pad
RandomCrop + flip + normalize in 4 torchvision worker processes per batch):

  * HOST: shuffle indices, slice uint8 arrays (zero-copy views), feed batches.
    With the whole dataset resident (~150 MB) there are no worker processes to
    starve the chip.
  * DEVICE: :func:`ddm_tpu.data.augment.augment_cifar10` performs the
    reflect-pad-4 random crop, horizontal flip, and [-1, 1] normalisation as
    vectorised jnp ops *inside the jitted training step*, so augmentation
    fuses with the forward pass and costs ~nothing.

``build_cifar10_dataloaders`` mirrors the reference factory (train loader
shuffled/drop_last, test loader ordered) and both loaders yield
``(images, labels)`` with images in NHWC. Train batches are uint8 (augment on
device); eval batches are float32 in [-1, 1] (already normalised), matching
the reference eval transform (``data.py:215``).

When the dataset files are absent and ``download=True`` a download is
attempted; in air-gapped environments set ``synthetic=True`` (an addition
over the reference) to run on deterministic fake data — used by tests and
throughput benches.
"""

from __future__ import annotations

import os
import pickle
import tarfile
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = [
    "CIFAR10DataConfig",
    "CIFAR10Arrays",
    "ArrayLoader",
    "load_cifar10_arrays",
    "resize_images_pil",
    "build_cifar10_dataloaders",
]

_CIFAR_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"
_CIFAR_DIRNAME = "cifar-10-batches-py"


@dataclass
class CIFAR10DataConfig:
    """Configuration for CIFAR-10 dataloaders (reference ``data.py:170-192``).

    ``num_workers`` and ``pin_memory`` are accepted for API parity but are
    no-ops here: the dataset is memory-resident and batches are numpy views,
    so there is nothing for workers to do. ``synthetic`` is a ddm_tpu
    addition for air-gapped smoke tests and benches.
    """

    data_dir: str = "./data"
    batch_size: int = 128
    num_workers: int = 4
    image_size: int = 32
    augment: bool = True
    download: bool = True
    drop_last: bool = True
    pin_memory: bool = True
    synthetic: bool = False
    synthetic_size: int = 2048
    seed: int = 0


@dataclass
class CIFAR10Arrays:
    """Memory-resident dataset: uint8 NHWC images + int labels."""

    images: np.ndarray  # (N, 32, 32, 3) uint8
    labels: np.ndarray  # (N,) int64


def _synthetic_cifar10(n: int, seed: int) -> CIFAR10Arrays:
    """Deterministic fake CIFAR-10-shaped data (class-colored noise blobs)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, size=n)
    base = (labels[:, None, None, None] * 25).astype(np.uint8)
    noise = rng.integers(0, 256, size=(n, 32, 32, 3), dtype=np.uint8) // 4
    images = np.clip(base + noise.astype(np.int32) * 3, 0, 255).astype(np.uint8)
    return CIFAR10Arrays(images=images, labels=labels.astype(np.int64))


def _maybe_download(data_dir: str) -> None:
    archive = os.path.join(data_dir, "cifar-10-python.tar.gz")
    os.makedirs(data_dir, exist_ok=True)
    if not os.path.exists(archive):
        import urllib.request

        print(f"Downloading CIFAR-10 to {archive} ...", flush=True)
        urllib.request.urlretrieve(_CIFAR_URL, archive)
    with tarfile.open(archive, "r:gz") as tf:
        tf.extractall(data_dir)


def load_cifar10_arrays(
    data_dir: str, train: bool, download: bool = True
) -> CIFAR10Arrays:
    """Read the standard CIFAR-10 python pickle batches into numpy arrays."""
    root = os.path.join(data_dir, _CIFAR_DIRNAME)
    if not os.path.isdir(root):
        if not download:
            raise FileNotFoundError(
                f"CIFAR-10 not found under {root} and download=False. "
                "Provide the standard cifar-10-batches-py directory, or use "
                "CIFAR10DataConfig(synthetic=True) for air-gapped smoke runs."
            )
        try:
            _maybe_download(data_dir)
        except Exception as exc:  # noqa: BLE001 - surface a clear remedy
            raise RuntimeError(
                f"CIFAR-10 is missing under {root} and the download failed "
                f"({exc}). In air-gapped environments place the dataset there "
                "manually or use CIFAR10DataConfig(synthetic=True)."
            ) from exc

    files = (
        [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    )
    imgs, labels = [], []
    for name in files:
        with open(os.path.join(root, name), "rb") as f:
            entry = pickle.load(f, encoding="latin1")
        data = np.asarray(entry["data"], dtype=np.uint8)  # (N, 3072) CHW-flat
        imgs.append(data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))  # NHWC
        labels.append(np.asarray(entry["labels"], dtype=np.int64))
    return CIFAR10Arrays(
        images=np.concatenate(imgs, axis=0), labels=np.concatenate(labels, axis=0)
    )


def resize_images_pil(images: np.ndarray, size: int) -> np.ndarray:
    """PIL-bilinear resize of a uint8 NHWC image stack (one pass).

    Bit-identical to the reference's torchvision ``Resize`` transform
    (``/root/reference/dddm/data.py:200-213`` — torchvision applies PIL
    bilinear to PIL inputs); hoisted out of the per-batch path so a
    memory-resident dataset pays the deterministic resize exactly once.
    """
    from PIL import Image

    out = np.empty(
        (images.shape[0], size, size, images.shape[3]), dtype=np.uint8
    )
    for i, im in enumerate(images):
        out[i] = np.asarray(
            Image.fromarray(im).resize((size, size), Image.BILINEAR)
        )
    return out


class ArrayLoader:
    """Minimal epoch loader over memory-resident arrays.

    Yields ``(images, labels)`` numpy batches. ``shuffle`` draws the epoch's
    permutation statelessly from ``(seed, epoch)`` (see :meth:`set_epoch`),
    so resumed runs reproduce a continuous run's data order exactly.
    When ``normalize`` is set, images are converted to float32 in [-1, 1]
    (the reference eval transform); otherwise raw uint8 flows through and
    normalisation happens on device inside the training step.
    """

    def __init__(
        self,
        data: CIFAR10Arrays,
        batch_size: int,
        *,
        shuffle: bool,
        drop_last: bool,
        normalize: bool,
        image_size: int = 32,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ) -> None:
        """``batch_size`` is the GLOBAL batch; with ``process_count > 1``
        every process draws the same seeded epoch permutation and yields its
        own ``batch_size // process_count`` slice of each global batch (the
        multi-host data-parallel contract: local shards assemble into the
        global array via ``jax.make_array_from_process_local_data``)."""
        if batch_size % process_count != 0:
            raise ValueError("global batch must divide evenly across processes")
        if process_count > 1 and not drop_last:
            # A ragged final global batch would yield uneven (or empty)
            # per-process slices, which make_array_from_process_local_data
            # rejects; every multi-host batch must be full-sized.
            raise ValueError(
                "drop_last=False is unsupported with process_count > 1: the "
                "final ragged batch cannot be assembled into a global array"
            )
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.normalize = normalize
        self.image_size = image_size
        self.process_index = process_index
        self.process_count = process_count
        self._seed = seed
        # epoch counter driving the shuffle permutation: STATELESS in
        # (seed, epoch), so `set_epoch(E)` after --resume reproduces the
        # exact data order of an uninterrupted run (a stateful RNG would
        # restart from permutation #1). Auto-increments per full
        # iteration for callers that never call set_epoch.
        self._epoch = 0
        # The reference applies a PIL bilinear Resize when image_size != 32
        # (data.py:200-213); PIL here gives bit-identical interpolation.
        # The resize is deterministic and the dataset memory-resident, so
        # it runs ONCE here (vs the reference's per-batch worker transform):
        # the per-epoch hot path then only slices uint8 views, keeping the
        # host feed far above device demand at long-sequence image sizes.
        # Trigger matches the reference transform exactly (`size != 32`
        # adds a Resize op, data.py:200-213) — NOT "size != actual shape":
        # synthetic non-32px datasets with the default image_size flow
        # through untouched, as they did through the reference's loader.
        if image_size != 32:
            self.data = CIFAR10Arrays(
                images=resize_images_pil(data.images, image_size),
                labels=data.labels,
            )

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle permutation to ``epoch`` (the torch
        ``DistributedSampler.set_epoch`` idiom). The trainer calls this per
        epoch so resumed runs see the same data order as continuous ones."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        n = self.data.images.shape[0]
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    @property
    def num_samples(self) -> int:
        return self.data.images.shape[0]

    def _prepare(self, images: np.ndarray) -> np.ndarray:
        if self.normalize:
            images = images.astype(np.float32) / 127.5 - 1.0
        return images

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = self.data.images.shape[0]
        if self.shuffle:
            order = np.random.default_rng(
                (self._seed, self._epoch)).permutation(n)
            self._epoch += 1  # no-op for callers that set_epoch per epoch
        else:
            order = np.arange(n)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        local = self.batch_size // self.process_count
        lo = self.process_index * local
        for i in range(0, stop, self.batch_size):
            idx = order[i : i + self.batch_size]
            if self.process_count > 1:
                idx = idx[lo : lo + local]
            yield self._prepare(self.data.images[idx]), self.data.labels[idx]


def build_cifar10_dataloaders(
    config: CIFAR10DataConfig,
) -> Tuple[ArrayLoader, ArrayLoader]:
    """Create train/test loaders (reference ``data.py:220-257`` factory).

    Train loader: shuffled, ``drop_last`` per config, raw uint8 (device-side
    augmentation + normalisation). Test loader: ordered, not dropped,
    float32 in [-1, 1].
    """
    if config.synthetic:
        train = _synthetic_cifar10(config.synthetic_size, config.seed)
        test = _synthetic_cifar10(max(config.synthetic_size // 4, 2), config.seed + 1)
    else:
        train = load_cifar10_arrays(config.data_dir, train=True, download=config.download)
        test = load_cifar10_arrays(config.data_dir, train=False, download=config.download)

    import jax

    train_loader = ArrayLoader(
        train,
        config.batch_size,
        shuffle=True,
        drop_last=config.drop_last,
        normalize=False,
        image_size=config.image_size,
        seed=config.seed,
        # multi-host: every process draws the same permutation (same seed)
        # and yields its slice of each global batch
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    pc = jax.process_count()
    test_loader = ArrayLoader(
        test,
        config.batch_size,
        shuffle=False,
        # multihost eval needs equal per-process slices of every batch, so
        # the (at most one) ragged tail batch is dropped on pods
        drop_last=pc > 1,
        normalize=True,
        image_size=config.image_size,
        seed=config.seed + 1,
        process_index=jax.process_index(),
        process_count=pc,
    )
    return train_loader, test_loader
