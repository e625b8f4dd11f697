"""ddm_tpu — a TPU-native (JAX / Flax / pjit / Pallas) framework implementing
Distributional Diffusion Models with Scoring Rules (De Bortoli et al., 2025).

Capability-parity rebuild of the reference PyTorch repo ``edluyuan/ddm``
(``/root/reference``), re-designed TPU-first: pure-functional math core,
jit-compiled training steps with fused on-device data generation, a
``lax.scan`` reverse sampler, Pallas kernels for the hot paths, and
``jax.sharding``-based data/tensor parallelism over TPU meshes.

The public surface mirrors the reference's curated ``__all__``
(``/root/reference/dddm/__init__.py:1-37``) so reference users find every
symbol they expect, plus the TPU-native additions (mesh/parallel utilities,
checkpoint resume, profiling).
"""

import os as _os

import jax as _jax

# Persistent compilation cache by default: Pallas kernel compiles are
# expensive (minutes through remote-compile TPU relays) and fully cacheable.
# Honour an explicit JAX_COMPILATION_CACHE_DIR; otherwise use a user cache.
# Skipped on pure-CPU runs: XLA:CPU AOT cache entries embed host machine
# features and can SIGILL when loaded on a different host (observed warning),
# and CPU compiles are cheap anyway.
def _platform_is_cpu() -> bool:
    """True when the session is pinned to CPU by either knob.

    Checks BOTH the env var and jax.config's ``jax_platforms`` value:
    ``dryrun_multichip`` pins CPU via ``jax.config.update`` without setting
    the env var, and the AOT-cache SIGILL risk (commit d18bf70) applies to
    any XLA:CPU run regardless of how it was selected.
    """
    if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True
    try:
        return _jax.config.jax_platforms == "cpu"
    except AttributeError:
        return False


try:  # pragma: no cover - environment-dependent
    if not _platform_is_cpu():
        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/ddm_tpu/jax_cache"),
        )
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 - cache is an optimisation, never fatal
    pass


def disable_cache_if_cpu_backend() -> None:
    """Turn the persistent compilation cache off when the resolved backend
    is XLA:CPU.

    Import-time gating can only see the two explicit CPU knobs; a CPU-only
    host with neither set still resolves to the cpu backend at first compile.
    Entry points call this right after argument parsing (when touching the
    backend is safe) to close that hole: XLA:CPU AOT cache entries embed host
    machine features and can SIGILL when loaded on a different host, and CPU
    compiles are cheap anyway.
    """
    try:  # pragma: no cover - environment-dependent
        if _jax.default_backend() == "cpu":
            _jax.config.update("jax_compilation_cache_dir", None)
    except Exception:  # noqa: BLE001
        pass

from .training import (
    TrainConfig,
    TrainState,
    distributional_training_step,
    make_loss_fn,
    make_train_step,
    train_dddm,
)
from .sampling import sample_dddm, sample_dddm_batched, sample_dddm_sharded
from .data.gmm import GMM, GMM2D, sample_gmm
from .data.cifar10 import CIFAR10DataConfig, build_cifar10_dataloaders
from .metrics import (
    KernelMMDLoss,
    MMD_loss,
    compute_activation_statistics,
    compute_fid,
    compute_image_mmd,
    frechet_distance,
    rbf_mmd2,
)
from .utils.plotting import plot_training_curves, save_image_grid, save_scatter
from .models.mlp import DDDMMLP
from .models.dit import DDDMDiT
from .models.factory import MODEL_DEFAULTS, SAMPLER_DEFAULTS, build_model

__version__ = "0.1.0"

__all__ = [
    "disable_cache_if_cpu_backend",
    "TrainConfig",
    "TrainState",
    "train_dddm",
    "distributional_training_step",
    "make_loss_fn",
    "make_train_step",
    "sample_dddm",
    "sample_dddm_batched",
    "sample_dddm_sharded",
    "sample_gmm",
    "CIFAR10DataConfig",
    "build_cifar10_dataloaders",
    "GMM2D",
    "GMM",
    "rbf_mmd2",
    "KernelMMDLoss",
    "MMD_loss",
    "InceptionEmbedding",  # provided lazily via __getattr__ (heavy import)
    "compute_activation_statistics",
    "compute_fid",
    "compute_image_mmd",
    "frechet_distance",
    "save_scatter",
    "save_image_grid",
    "plot_training_curves",
    "DDDMMLP",
    "DDDMDiT",
    "build_model",
    "MODEL_DEFAULTS",
    "SAMPLER_DEFAULTS",
]


def __getattr__(name):  # lazy import of the heavy Inception embedder
    if name == "InceptionEmbedding":
        from .models.inception import InceptionEmbedding

        return InceptionEmbedding
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
