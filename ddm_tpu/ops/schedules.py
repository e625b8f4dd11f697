"""Noise schedule and Gaussian-bridge math for DDDM (pure jnp).

TPU-native re-implementation of the reference math core
(``/root/reference/dddm/schedules.py:5-78``): the linear flow-matching
schedule alpha(t) = 1 - t, sigma(t) = t (paper eq. (3)), the forward marginal
x_t = alpha_t x_0 + sigma_t eps (eq. (2)), and the closed-form Gaussian-bridge
transition parameters mu_{s,t}, Sigma_{s,t} = std^2 I (eq. (4)) parameterised
by the churn coefficient eps_churn in [0, 1].

Everything here is shape-polymorphic, jit/vmap-friendly, and free of Python
control flow on traced values, so it fuses into surrounding XLA programs
(training step, lax.scan sampler) without host round-trips.

IMPORTANT numerical contract (mirrors the corrected reference coefficients at
``schedules.py:51-72``): the bridge mean uses *linear* sigma ratios for the
deterministic (eps_churn -> 0) limit,

    mu = (sigma_s / sigma_t) x_t + (alpha_s - (sigma_s / sigma_t) alpha_t) x0,

NOT squared ratios. An earlier version of the reference squared them, which
made the sampler ignore x_t when eps_churn = 0 and destroyed sample quality.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = [
    "alpha_sigma",
    "forward_marginal_sample",
    "gaussian_bridge_mu_sigma",
]

_DIV_EPS = 1e-8  # division guard, matches reference schedules.py:47


def _bcast_right(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Append trailing singleton dims until ``x.ndim == ndim``.

    Shape-polymorphic replacement for the reference's unsqueeze loops
    (``schedules.py:20-24,65-68``) — a single reshape instead of a Python
    loop of unsqueezes, so XLA sees one static reshape op.
    """
    if x.ndim > ndim:
        raise ValueError(f"cannot right-broadcast ndim {x.ndim} -> {ndim}")
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def alpha_sigma(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flow-matching noise schedule (paper eq. (3)).

    Args:
        t: any shape (typically ``[B]`` or scalar).

    Returns:
        ``(alpha, sigma)`` broadcast to ``t.shape``: ``alpha = 1 - t``,
        ``sigma = t``.
    """
    t = jnp.asarray(t)
    return 1.0 - t, t


def forward_marginal_sample(
    x0: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    """Forward marginal ``x_t = alpha_t x_0 + sigma_t eps`` (paper eq. (2)).

    Args:
        x0: clean data, shape ``[B, *data]``.
        t: times, shape ``[B]`` or scalar.
        eps: standard-normal noise; broadcastable against ``x0`` (typically
            the same shape).

    Returns:
        ``x_t`` with ``x0``'s shape.
    """
    x0 = jnp.asarray(x0)
    alpha_t, sigma_t = alpha_sigma(jnp.asarray(t, dtype=x0.dtype))
    alpha_t = _bcast_right(alpha_t, x0.ndim)
    sigma_t = _bcast_right(sigma_t, x0.ndim)
    eps = _bcast_right(jnp.asarray(eps), x0.ndim)
    return alpha_t * x0 + sigma_t * eps


def gaussian_bridge_mu_sigma(
    s: jnp.ndarray,
    t: jnp.ndarray,
    x0: jnp.ndarray,
    xt: jnp.ndarray,
    eps_churn: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bridge transition parameters ``mu_{s,t}``, ``Sigma_{s,t}`` (eq. (4)).

    Args:
        s, t: scalars or ``[B]`` with ``0 <= s < t <= 1``.
        x0: predicted clean sample ``x_hat_0``, shape ``[..., d]`` (any rank).
        xt: current noisy sample, same shape as ``x0``.
        eps_churn: churn coefficient ``eps`` in ``[0, 1]``; 0 gives the
            deterministic bridge, 1 the maximal-churn stochastic bridge.

    Returns:
        ``(mu, std)`` where ``mu`` has ``x0``'s shape and ``std`` broadcasts
        against it (trailing singleton dims), with ``Sigma = std^2 * I``.

    Reference parity: ``/root/reference/dddm/schedules.py:28-78`` (corrected
    linear-ratio coefficients; see module docstring).
    """
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    s = jnp.asarray(s, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)

    a_s, sig_s = alpha_sigma(s)
    a_t, sig_t = alpha_sigma(t)
    ratio = sig_s / (sig_t + _DIV_EPS)
    alpha_ratio = a_t / (a_s + _DIV_EPS)

    # Coefficients of eq. (4); r11 == r21 and r12 == r22 with this schedule
    # but they are kept distinct names to mirror the paper's roles:
    #   r01 weights x_t in the deterministic limit,
    #   r12 weights x_t in the full-churn limit,
    #   r21/r22 enter the x0 coefficient, r11 the variance shrinkage.
    r11 = alpha_ratio * ratio
    r12 = alpha_ratio * ratio**2
    r21 = alpha_ratio * ratio
    r22 = alpha_ratio * ratio**2
    r01 = ratio
    e2 = eps_churn**2

    nd = x0.ndim
    mu = (e2 * _bcast_right(r12, nd) + (1.0 - e2) * _bcast_right(r01, nd)) * xt + (
        _bcast_right(a_s, nd)
        * (1.0 - e2 * _bcast_right(r22, nd) - (1.0 - e2) * _bcast_right(r21, nd))
        * x0
    )

    inner = e2 * r11 + (1.0 - e2)
    var = (sig_s**2) * jnp.clip(1.0 - inner**2, min=0.0)
    std = jnp.sqrt(jnp.clip(var, min=0.0))
    return mu, _bcast_right(std, nd)
