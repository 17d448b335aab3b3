"""Training losses (train/rnn_train.py:33-46).

* gains: ``mycost`` — masked quartic+quadratic error in the sqrt-gain domain
  plus a small BCE term.  The mask ``min(y_true+1, 1)`` zeroes bands whose
  target is the -1 "no data" sentinel; sqrt() inputs are clamped at 0 so the
  sentinel does not poison the masked lanes with NaNs.
* vad: ``my_crossentropy`` — BCE weighted by 2*|y_true-0.5| (confidence).
* combined: loss_weights [10, 0.5] (rnn_train.py:81).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def _bce(y_true, y_pred):
    p = jnp.clip(y_pred, _EPS, 1.0 - _EPS)
    t = jnp.clip(y_true, 0.0, 1.0)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def _mask(y_true):
    return jnp.minimum(y_true + 1.0, 1.0)


def gain_loss(y_true, y_pred):
    """mycost: mean over bands of mask * (10 d^4 + d^2 + 0.01 bce),
    d = sqrt(pred) - sqrt(true)."""
    m = _mask(y_true)
    d = jnp.sqrt(jnp.maximum(y_pred, 0.0)) - jnp.sqrt(jnp.maximum(y_true, 0.0))
    per_band = m * (10.0 * (d**4) + d**2 + 0.01 * _bce(y_true, y_pred))
    return jnp.mean(per_band, axis=-1)


def vad_loss(y_true, y_pred):
    """my_crossentropy: mean of 2|y_true - 0.5| * bce."""
    return jnp.mean(2.0 * jnp.abs(y_true - 0.5) * _bce(y_true, y_pred), axis=-1)


def msse(y_true, y_pred):
    """Metric: masked squared error in the sqrt domain (rnn_train.py:38-39)."""
    m = _mask(y_true)
    d = jnp.sqrt(jnp.maximum(y_pred, 0.0)) - jnp.sqrt(jnp.maximum(y_true, 0.0))
    return jnp.mean(m * d**2, axis=-1)


GRU_L2 = 1e-6  # Keras l2(1e-6) on the three GRUs (rnn_train.py:68-73)


def l2_regularization(params: dict) -> jnp.ndarray:
    """Keras kernel/recurrent l2(1e-6) regularizers on the three GRUs
    (reference train/rnn_train.py:68-73; the dense layers carry none)."""
    reg = jnp.float32(0.0)
    for name in ("vad_gru", "noise_gru", "denoise_gru"):
        for k in ("wi", "wr"):
            w = params[name][k]
            reg = reg + jnp.sum(w * w)
    return GRU_L2 * reg


def total_loss(gains_true, gains_pred, vad_true, vad_pred, sample_weight=None):
    """10 * mycost + 0.5 * my_crossentropy, averaged over batch and time."""
    g = gain_loss(gains_true, gains_pred)  # (B, T)
    v = vad_loss(vad_true, vad_pred)  # (B, T)
    per_step = 10.0 * g + 0.5 * v
    if sample_weight is not None:
        return jnp.sum(per_step * sample_weight) / jnp.maximum(
            jnp.sum(sample_weight), 1e-6
        )
    return jnp.mean(per_step)
