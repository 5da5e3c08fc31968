"""Discretized mixture-of-logistics loss and sampler.

Parity with reference wavenet/mixture.py:27-114 (itself from PixelCNN++):
  * NLL with the 0/255-edge CDF cases and the tiny-bin log-pdf fallback
  * Gumbel-max mixture selection + logistic inverse-CDF sampling

Implemented in jax.numpy with explicit PRNG keys so sampling can live inside
a jitted/scanned generation loop.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_SCALE_MIN = float(math.log(1e-14))


def log_sum_exp(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1)
    m2 = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m2), axis=-1))


def discretized_mix_logistic_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                                  num_class: int = 65536,
                                  log_scale_min: float = LOG_SCALE_MIN,
                                  reduce: bool = True) -> jnp.ndarray:
    """NLL of targets y in [-1,1] under a discretized MoL.

    y_hat: [..., 3*nr_mix] (logit_probs | means | log_scales)
    y:     [..., 1]
    """
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:3 * nr_mix], log_scale_min)

    y = jnp.broadcast_to(y, y.shape[:-1] + (nr_mix,))
    centered = y - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_class - 1)

    plus_in = inv_stdv * (centered + half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - half_bin)
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)        # log CDF at -1 edge
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)         # log 1-CDF at +1 edge
    cdf_delta = cdf_plus - cdf_min

    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    log_probs = jnp.where(
        y < -0.999, log_cdf_plus,
        jnp.where(y > 0.999, log_one_minus_cdf_min,
                  jnp.where(cdf_delta > 1e-5,
                            jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                            log_pdf_mid - math.log((num_class - 1) / 2))))

    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    nll = -log_sum_exp(log_probs)
    if reduce:
        return jnp.sum(nll)
    return nll


def sample_from_discretized_mix_logistic(
        rng: jax.Array, y: jnp.ndarray,
        log_scale_min: float = LOG_SCALE_MIN) -> jnp.ndarray:
    """Draw samples in [-1,1]; y: [..., 3*nr_mix] -> [...]."""
    nr_mix = y.shape[-1] // 3
    rng_sel, rng_u = jax.random.split(rng)

    logit_probs = y[..., :nr_mix]
    # Gumbel-max mixture selection.
    u_sel = jax.random.uniform(rng_sel, logit_probs.shape,
                               minval=1e-5, maxval=1.0 - 1e-5)
    sel_idx = jnp.argmax(logit_probs - jnp.log(-jnp.log(u_sel)), axis=-1)
    sel = jax.nn.one_hot(sel_idx, nr_mix, dtype=y.dtype)

    means = jnp.sum(y[..., nr_mix:2 * nr_mix] * sel, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y[..., 2 * nr_mix:3 * nr_mix] * sel, axis=-1), log_scale_min)

    # Logistic inverse-CDF sampling.
    u = jax.random.uniform(rng_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)
