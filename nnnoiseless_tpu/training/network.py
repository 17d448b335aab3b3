"""Float training-mode network (the Keras model of train/rnn_train.py:65-77).

Topology (all GRUs ``reset_after=False``, recurrent activation sigmoid)::

    f(42) -> Dense24 tanh -> GRU24 tanh -> Dense1 sigmoid   (vad)
    [d, vad_h, f](90)  -> GRU48 relu
    [vad_h, noise_h, f](114) -> GRU96 tanh -> Dense22 sigmoid (gains)

Differences from the inference kernel (ops/rnn.py): float32 weights with
true tanh/sigmoid (training wants smooth gradients; the int8 table
approximation is an inference-time artifact), and a ``lax.scan`` over whole
sequences.  Weight layout matches the serialized format, so quantization +
dump produces a loadable ``.rnn``.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model import (
    RELU,
    SIGMOID,
    TANH,
    LayerMeta,
    ModelMeta,
    RnnModel,
    quantize_weights,
)

_F32 = jnp.float32

DEFAULT_META = ModelMeta(
    input_dense=LayerMeta(42, 24, TANH),
    vad_gru=LayerMeta(24, 24, TANH),
    noise_gru=LayerMeta(90, 48, RELU),
    denoise_gru=LayerMeta(114, 96, TANH),
    denoise_output=LayerMeta(96, 22, SIGMOID),
    vad_output=LayerMeta(24, 1, SIGMOID),
)

WEIGHT_CLIP = 0.499  # rnn_train.py:62 WeightClip constraint


class TrainableModel(NamedTuple):
    """Float params pytree; same dict layout as the inference model."""

    params: dict


def _glorot(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, _F32, -limit, limit)


def _orthogonal(key, shape):
    return jax.nn.initializers.orthogonal()(key, shape, _F32)


def init_train_params(key, meta: ModelMeta = DEFAULT_META) -> dict:
    """Keras-style init: glorot_uniform kernels, orthogonal recurrent, zero bias."""
    keys = jax.random.split(key, 16)
    ki = iter(keys)

    def dense(m: LayerMeta):
        return {
            "w": _glorot(next(ki), (m.nb_inputs, m.nb_neurons)),
            "b": jnp.zeros((m.nb_neurons,), _F32),
        }

    def gru(m: LayerMeta):
        return {
            "wi": _glorot(next(ki), (m.nb_inputs, 3 * m.nb_neurons)),
            "wr": _orthogonal(next(ki), (m.nb_neurons, 3 * m.nb_neurons)),
            "b": jnp.zeros((3 * m.nb_neurons,), _F32),
        }

    return {
        "input_dense": dense(meta.input_dense),
        "vad_gru": gru(meta.vad_gru),
        "noise_gru": gru(meta.noise_gru),
        "denoise_gru": gru(meta.denoise_gru),
        "denoise_output": dense(meta.denoise_output),
        "vad_output": dense(meta.vad_output),
    }


def clip_params(params: dict) -> dict:
    """Apply the Keras WeightClip(0.499) constraint to every tensor."""
    return jax.tree_util.tree_map(
        lambda w: jnp.clip(w, -WEIGHT_CLIP, WEIGHT_CLIP), params
    )


def _act(x, activation: int):
    if activation == TANH:
        return jnp.tanh(x)
    if activation == SIGMOID:
        return jax.nn.sigmoid(x)
    if activation == RELU:
        return jax.nn.relu(x)
    raise ValueError(activation)


def _dense(layer, m: LayerMeta, x):
    return _act(x @ layer["w"] + layer["b"], m.activation)


def _gru_cell(layer, m: LayerMeta, h, x):
    """Keras reset_after=False GRU cell (float)."""
    n = m.nb_neurons
    xz = x @ layer["wi"][:, :n] + layer["b"][:n]
    xr = x @ layer["wi"][:, n : 2 * n] + layer["b"][n : 2 * n]
    xh = x @ layer["wi"][:, 2 * n :] + layer["b"][2 * n :]
    z = jax.nn.sigmoid(xz + h @ layer["wr"][:, :n])
    r = jax.nn.sigmoid(xr + h @ layer["wr"][:, n : 2 * n])
    hh = _act(xh + (r * h) @ layer["wr"][:, 2 * n :], m.activation)
    return z * h + (1.0 - z) * hh


def sequence_forward(
    params: dict, features: jnp.ndarray, meta: ModelMeta = DEFAULT_META
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward a batch of sequences: features (B, T, 42) -> (gains, vad).

    Returns gains (B, T, 22) and vad (B, T, 1).  Scans over time with the
    batch inside each step (the time axis is the only true dependency).
    """
    b = features.shape[0]
    h0 = (
        jnp.zeros((b, meta.vad_gru.nb_neurons), _F32),
        jnp.zeros((b, meta.noise_gru.nb_neurons), _F32),
        jnp.zeros((b, meta.denoise_gru.nb_neurons), _F32),
    )

    def step(h, f):  # f: (B, 42)
        h_vad, h_noise, h_den = h
        d = _dense(params["input_dense"], meta.input_dense, f)
        h_vad = _gru_cell(params["vad_gru"], meta.vad_gru, h_vad, d)
        vad = _dense(params["vad_output"], meta.vad_output, h_vad)
        noise_in = jnp.concatenate([d, h_vad, f], axis=-1)
        h_noise = _gru_cell(params["noise_gru"], meta.noise_gru, h_noise, noise_in)
        den_in = jnp.concatenate([h_vad, h_noise, f], axis=-1)
        h_den = _gru_cell(params["denoise_gru"], meta.denoise_gru, h_den, den_in)
        gains = _dense(params["denoise_output"], meta.denoise_output, h_den)
        return (h_vad, h_noise, h_den), (gains, vad)

    _, (gains, vad) = jax.lax.scan(step, h0, jnp.swapaxes(features, 0, 1))
    return jnp.swapaxes(gains, 0, 1), jnp.swapaxes(vad, 0, 1)


def export_model(params: dict, meta: ModelMeta = DEFAULT_META) -> RnnModel:
    """Quantize float params to int8 and wrap as a loadable RnnModel.

    Same rule as train/dump_rnn.py: clip(round(256 w), -128, 127).
    """
    q = {
        name: {k: quantize_weights(np.asarray(v)).astype(np.float32) for k, v in layer.items()}
        for name, layer in params.items()
    }
    return RnnModel(q, meta)
