"""The noise-suppression RNN: dense layers + three RNNoise-style GRUs.

Faithful TPU re-expression of the reference compute (src/rnn.rs:242-379):

* pre-activations accumulate the *raw int8 weight values* (stored as f32)
  against f32 inputs, then scale by 1/256 before the table-based activation —
  identical arithmetic to the reference, but as batched matmuls on the MXU
  instead of scalar column loops;
* the GRU is Keras ``reset_after=False`` with the reset gate pre-multiplied
  by the state (rnn.rs:310-312): r = state * sigmoid(...), and the candidate
  uses ``r`` in the recurrent product;
* per-frame dataflow (rnn.rs:343-379):
  d = dense(f); vad_h = gru(d); vad = dense(vad_h);
  noise_h = gru([d, vad_h, f]); den_h = gru([vad_h, noise_h, f]);
  gains = dense(den_h).

All functions broadcast over leading batch axes; weights are tiny (87 KB)
and live comfortably in VMEM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import WEIGHTS_SCALE
from ..model import RELU, SIGMOID, TANH, LayerMeta, ModelMeta
from .precision import matmul
from .activations import relu, sigmoid_approx, tansig_approx

_SCALE = jnp.float32(WEIGHTS_SCALE)


def _activate(x: jnp.ndarray, activation: int) -> jnp.ndarray:
    if activation == TANH:
        return tansig_approx(x)
    if activation == SIGMOID:
        return sigmoid_approx(x)
    if activation == RELU:
        return relu(x)
    raise ValueError(f"unknown activation {activation}")


class RnnState(NamedTuple):
    """The three GRU hidden states (leading axes = batch)."""

    vad: jnp.ndarray
    noise: jnp.ndarray
    denoise: jnp.ndarray


def init_rnn_state(meta: ModelMeta, batch_shape: tuple = ()) -> RnnState:
    z = lambda n: jnp.zeros(batch_shape + (n,), jnp.float32)
    return RnnState(
        vad=z(meta.vad_gru.nb_neurons),
        noise=z(meta.noise_gru.nb_neurons),
        denoise=z(meta.denoise_gru.nb_neurons),
    )


def dense_apply(layer: dict, meta: LayerMeta, x: jnp.ndarray) -> jnp.ndarray:
    pre = (layer["b"] + matmul(x, layer["w"])) * _SCALE
    return _activate(pre, meta.activation)


def gru_apply(
    layer: dict, meta: LayerMeta, state: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    n = meta.nb_neurons
    gates_in = matmul(x, layer["wi"])  # (..., 3n)
    rec_zr = matmul(state, layer["wr"][:, : 2 * n])  # (..., 2n)
    b = layer["b"]

    z = sigmoid_approx(
        _SCALE * (b[:n] + gates_in[..., :n] + rec_zr[..., :n])
    )
    r = state * sigmoid_approx(
        _SCALE * (b[n : 2 * n] + gates_in[..., n : 2 * n] + rec_zr[..., n:])
    )
    h_pre = _SCALE * (
        b[2 * n :] + gates_in[..., 2 * n :] + matmul(r, layer["wr"][:, 2 * n :])
    )
    h = _activate(h_pre, meta.activation)
    return z * state + (jnp.float32(1.0) - z) * h


def rnn_step(
    params: dict, meta: ModelMeta, state: RnnState, features: jnp.ndarray
) -> tuple[RnnState, jnp.ndarray, jnp.ndarray]:
    """One frame through the full network.

    Returns (new_state, gains (...,22), vad_prob (...,)).

    For the standard topology this routes through a ``custom_vmap`` wrapper
    so the batched program can dispatch to the fused Pallas kernel
    (ops/rnn_pallas.py, opt-in via NNT_PALLAS_RNN=1).  Note: ``custom_vmap``
    has no autodiff rule, so this path is non-differentiable; the trainer
    uses its own flax network (training/network.py), not this function.
    """
    from .rnn_pallas import _flatten_params, standard_topology

    if standard_topology(meta):
        core = _make_rnn_core(meta)
        hv, hn, hd, gains, vad = core(
            _flatten_params(params), state.vad, state.noise, state.denoise, features
        )
        return RnnState(hv, hn, hd), gains, vad
    return _rnn_step_impl(params, meta, state, features)


def _unflatten_params(weights: tuple) -> dict:
    (id_w, id_b, vw_i, vw_r, vw_b, nw_i, nw_r, nw_b, dw_i, dw_r, dw_b,
     do_w, do_b, vo_w, vo_b) = weights
    r = lambda x: x.reshape(-1)
    return {
        "input_dense": {"w": id_w, "b": r(id_b)},
        "vad_gru": {"wi": vw_i, "wr": vw_r, "b": r(vw_b)},
        "noise_gru": {"wi": nw_i, "wr": nw_r, "b": r(nw_b)},
        "denoise_gru": {"wi": dw_i, "wr": dw_r, "b": r(dw_b)},
        "denoise_output": {"w": do_w, "b": r(do_b)},
        "vad_output": {"w": vo_w, "b": r(vo_b)},
    }


import functools  # noqa: E402
import jax  # noqa: E402  (used by the custom_vmap wrapper below)


@functools.lru_cache(maxsize=8)
def _make_rnn_core(meta: ModelMeta):
    """A custom_vmap-wrapped core specialized on the (hashable) meta.

    The primal path is the XLA implementation; the batched rule can
    dispatch to the fused Pallas kernel (ops/rnn_pallas.py) when enabled.
    """
    from .rnn_pallas import _BLOCK, meta_acts, rnn_step_pallas

    acts = meta_acts(meta)

    @jax.custom_batching.custom_vmap
    def core(weights: tuple, hv, hn, hd, f):
        st, gains, vad = _rnn_step_impl(
            _unflatten_params(weights), meta, RnnState(hv, hn, hd), f
        )
        return st.vad, st.noise, st.denoise, gains, vad

    @core.def_vmap
    def _rule(axis_size, in_batched, weights, hv, hn, hd, f):
        import os

        w_batched = any(jax.tree_util.tree_leaves(in_batched[0]))
        states_batched = all(in_batched[1:])
        if w_batched:
            # Ensemble use (vmap over params): run the reference impl under
            # an explicit vmap with per-leaf in_axes — the broadcast path
            # below assumes unbatched weights.
            w_axes = jax.tree_util.tree_map(
                lambda b: 0 if b else None, in_batched[0]
            )
            s_axes = tuple(0 if b else None for b in in_batched[1:])

            def call(w, hv_, hn_, hd_, f_):
                st, gains, vad = _rnn_step_impl(
                    _unflatten_params(w), meta, RnnState(hv_, hn_, hd_), f_
                )
                return st.vad, st.noise, st.denoise, gains, vad

            out = jax.vmap(call, in_axes=(w_axes,) + s_axes)(weights, hv, hn, hd, f)
            return out, (True,) * 5
        use_pallas = (
            not w_batched
            and states_batched
            and os.environ.get("NNT_PALLAS_RNN") == "1"
            and jax.default_backend() != "cpu"
            and axis_size % _BLOCK == 0
        )
        if use_pallas:
            (hv2, hn2, hd2), gains, vad = rnn_step_pallas(
                _unflatten_params(weights), acts, RnnState(hv, hn, hd), f
            )
        else:
            # the XLA implementation broadcasts over the leading batch axis
            def bcast(x, batched):
                return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)

            hv, hn, hd, f = (
                bcast(a, b) for a, b in zip((hv, hn, hd, f), in_batched[1:])
            )
            st, gains, vad = _rnn_step_impl(
                _unflatten_params(weights), meta, RnnState(hv, hn, hd), f
            )
            hv2, hn2, hd2 = st.vad, st.noise, st.denoise
        return (hv2, hn2, hd2, gains, vad), (True,) * 5

    return core


def _rnn_step_impl(
    params: dict, meta: ModelMeta, state: RnnState, features: jnp.ndarray
) -> tuple[RnnState, jnp.ndarray, jnp.ndarray]:
    d = dense_apply(params["input_dense"], meta.input_dense, features)
    vad_h = gru_apply(params["vad_gru"], meta.vad_gru, state.vad, d)
    vad = dense_apply(params["vad_output"], meta.vad_output, vad_h)

    noise_in = jnp.concatenate([d, vad_h, features], axis=-1)
    noise_h = gru_apply(params["noise_gru"], meta.noise_gru, state.noise, noise_in)

    den_in = jnp.concatenate([vad_h, noise_h, features], axis=-1)
    den_h = gru_apply(params["denoise_gru"], meta.denoise_gru, state.denoise, den_in)

    gains = dense_apply(params["denoise_output"], meta.denoise_output, den_h)
    return RnnState(vad_h, noise_h, den_h), gains, vad[..., 0]
