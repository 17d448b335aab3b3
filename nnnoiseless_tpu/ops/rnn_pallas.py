"""Fused Pallas kernel for the whole RNN cell (dense + 3 GRUs + 2 heads).

Motivation (docs/PERFORMANCE.md): in the XLA program, the scanned frame
step re-stages the GRU weight blocks between HBM and VMEM every iteration
and issues ~20 small matmuls + activations as separate ops.  This kernel
executes the entire per-frame network (ops/rnn.py::rnn_step semantics,
reference src/rnn.rs:343-379) for a block of streams in one pass: weights,
biases, and the tansig table are loaded once per program, every
intermediate lives in VMEM/registers, and one HBM read/write covers the
states and features.

Activation parity: the 201-entry tansig interpolation runs in-kernel with
the table in SMEM (scalar reads inside a fori loop) — bit-identical
select semantics to ops/activations.py.

Integration mirrors ops/window.py: a ``custom_vmap`` wrapper whose batched
rule dispatches to the blocked kernel on TPU for divisible batches when
``NNT_PALLAS_RNN=1``, and to the (natively batch-broadcasting) XLA
implementation otherwise.

MEASURED (batch 4096, one v5e-lite chip): the kernel is numerically correct
on hardware (<=3e-4 vs the XLA cell) but 24% slower end to end (5803x vs
7606x aggregate realtime) — the pallas_call is a fusion barrier and the
in-kernel scalar-loop tansig lookup is slower than XLA's vectorized
select-reduce.  Kept opt-in as the building block for a future whole-step
fusion (docs/PERFORMANCE.md), where the weights/table stay resident across
the entire frame rather than per-island.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import TANSIG_TABLE

_BLOCK = 512
_N_TAB = TANSIG_TABLE.shape[0]  # 201
_F32 = jnp.float32

# Standard topology (the only one the kernel specializes for).
_DIMS = dict(f=42, d=24, v=24, n=48, h=96, g=22)


def _tansig_k(x, tab_ref):
    """In-kernel tansig_approx with exact ops/activations.py semantics."""
    sign = jnp.where(x < 0.0, _F32(-1.0), _F32(1.0))
    ax = jnp.minimum(jnp.abs(jnp.where(jnp.isnan(x), _F32(0.0), x)), _F32(7.99))
    i = jnp.floor(_F32(0.5) + _F32(25.0) * ax).astype(jnp.int32)
    frac = ax - _F32(0.04) * i.astype(_F32)

    def body(k, y):
        return jnp.where(i == k, tab_ref[k], y)

    y = jax.lax.fori_loop(0, _N_TAB, body, jnp.zeros_like(x))
    dy = _F32(1.0) - y * y
    y = y + frac * dy * (_F32(1.0) - y * frac)
    out = sign * y
    out = jnp.where(x > _F32(-8.0), out, _F32(-1.0))
    return jnp.where(x < _F32(8.0), out, _F32(1.0))


def _sigmoid_k(x, tab_ref):
    return _F32(0.5) + _F32(0.5) * _tansig_k(_F32(0.5) * x, tab_ref)


def _act_k(x, activation, tab_ref):
    if activation == 0:
        return _tansig_k(x, tab_ref)
    if activation == 1:
        return _sigmoid_k(x, tab_ref)
    return jnp.maximum(x, _F32(0.0))


def _dot(x, w):
    return jnp.dot(
        x, w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )


# Plain Python float: a jnp scalar here would be captured as a constant by
# the kernel trace, which pallas_call rejects.
_SCALE = 0.00390625  # 1/256 exactly representable


def _gru_k(h, x, wi, wr, b, n, activation, tab_ref):
    gi = _dot(x, wi)
    rzr = _dot(h, wr[:, : 2 * n])
    z = _sigmoid_k(_SCALE * (b[0, :n] + gi[:, :n] + rzr[:, :n]), tab_ref)
    r = h * _sigmoid_k(
        _SCALE * (b[0, n : 2 * n] + gi[:, n : 2 * n] + rzr[:, n:]), tab_ref
    )
    hh = _act_k(
        _SCALE * (b[0, 2 * n :] + gi[:, 2 * n :] + _dot(r, wr[:, 2 * n :])),
        activation,
        tab_ref,
    )
    return z * h + (_F32(1.0) - z) * hh


def _make_kernel(acts: tuple):
    """Kernel specialized on the 6 static activation codes
    (input_dense, vad_gru, noise_gru, denoise_gru, denoise_output,
    vad_output) — the stock model uses relu GRU candidates."""
    a_id, a_vad, a_noise, a_den, a_do, a_vo = acts

    def _rnn_kernel(
        tab_ref,
        id_w, id_b, vw_i, vw_r, vw_b, nw_i, nw_r, nw_b, dw_i, dw_r, dw_b,
        do_w, do_b, vo_w, vo_b,
        f_ref, hv_ref, hn_ref, hd_ref,
        hv_out, hn_out, hd_out, g_out, vad_out,
    ):
        f = f_ref[:, :]
        hv, hn, hd = hv_ref[:, :], hn_ref[:, :], hd_ref[:, :]
        v, n = _DIMS["v"], _DIMS["n"]

        d = _act_k(_SCALE * (id_b[0, :] + _dot(f, id_w[:, :])), a_id, tab_ref)
        hv2 = _gru_k(hv, d, vw_i[:, :], vw_r[:, :], vw_b, v, a_vad, tab_ref)
        vad = _act_k(_SCALE * (vo_b[0, :] + _dot(hv2, vo_w[:, :])), a_vo, tab_ref)

        noise_in = jnp.concatenate([d, hv2, f], axis=-1)
        hn2 = _gru_k(hn, noise_in, nw_i[:, :], nw_r[:, :], nw_b, n, a_noise, tab_ref)

        den_in = jnp.concatenate([hv2, hn2, f], axis=-1)
        hd2 = _gru_k(hd, den_in, dw_i[:, :], dw_r[:, :], dw_b, _DIMS["h"], a_den, tab_ref)

        gains = _act_k(_SCALE * (do_b[0, :] + _dot(hd2, do_w[:, :])), a_do, tab_ref)

        hv_out[:, :] = hv2
        hn_out[:, :] = hn2
        hd_out[:, :] = hd2
        g_out[:, :] = gains
        vad_out[:, :] = vad

    return _rnn_kernel


@functools.partial(jax.jit, static_argnames=("acts", "interpret"))
def _rnn_pallas(weights: tuple, hv, hn, hd, f, acts: tuple, interpret: bool = False):
    b = f.shape[0]
    dims = _DIMS
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    row_spec = lambda cols: pl.BlockSpec(
        (_BLOCK, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_specs = [
        vmem((dims["f"], dims["d"])), vmem((1, dims["d"])),
        vmem((dims["d"], 3 * dims["v"])), vmem((dims["v"], 3 * dims["v"])), vmem((1, 3 * dims["v"])),
        vmem((dims["f"] + dims["d"] + dims["v"], 3 * dims["n"])), vmem((dims["n"], 3 * dims["n"])), vmem((1, 3 * dims["n"])),
        vmem((dims["f"] + dims["v"] + dims["n"], 3 * dims["h"])), vmem((dims["h"], 3 * dims["h"])), vmem((1, 3 * dims["h"])),
        vmem((dims["h"], dims["g"])), vmem((1, dims["g"])),
        vmem((dims["v"], 1)), vmem((1, 1)),
    ]
    out_shapes = (
        jax.ShapeDtypeStruct((b, dims["v"]), jnp.float32),
        jax.ShapeDtypeStruct((b, dims["n"]), jnp.float32),
        jax.ShapeDtypeStruct((b, dims["h"]), jnp.float32),
        jax.ShapeDtypeStruct((b, dims["g"]), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
    )
    out_specs = (
        row_spec(dims["v"]), row_spec(dims["n"]), row_spec(dims["h"]),
        row_spec(dims["g"]), row_spec(1),
    )
    tab = jnp.asarray(TANSIG_TABLE)
    return pl.pallas_call(
        _make_kernel(acts),
        grid=(b // _BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + w_specs
        + [row_spec(dims["f"]), row_spec(dims["v"]), row_spec(dims["n"]), row_spec(dims["h"])],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(tab, *weights, f, hv, hn, hd)


def _flatten_params(params: dict) -> tuple:
    """The 15 weight arrays in kernel order; biases reshaped to (1, n)."""
    p = params
    r1 = lambda x: x.reshape(1, -1)
    return (
        p["input_dense"]["w"], r1(p["input_dense"]["b"]),
        p["vad_gru"]["wi"], p["vad_gru"]["wr"], r1(p["vad_gru"]["b"]),
        p["noise_gru"]["wi"], p["noise_gru"]["wr"], r1(p["noise_gru"]["b"]),
        p["denoise_gru"]["wi"], p["denoise_gru"]["wr"], r1(p["denoise_gru"]["b"]),
        p["denoise_output"]["w"], r1(p["denoise_output"]["b"]),
        p["vad_output"]["w"], r1(p["vad_output"]["b"]),
    )


def pallas_rnn_enabled() -> bool:
    return os.environ.get("NNT_PALLAS_RNN") == "1"


def standard_topology(meta) -> bool:
    d = _DIMS
    return (
        meta.input_dense.nb_inputs == d["f"]
        and meta.input_dense.nb_neurons == d["d"]
        and meta.vad_gru.nb_neurons == d["v"]
        and meta.noise_gru.nb_neurons == d["n"]
        and meta.denoise_gru.nb_neurons == d["h"]
        and meta.denoise_output.nb_neurons == d["g"]
    )


def meta_acts(meta) -> tuple:
    """The 6 activation codes of a ModelMeta, kernel order."""
    return (
        meta.input_dense.activation,
        meta.vad_gru.activation,
        meta.noise_gru.activation,
        meta.denoise_gru.activation,
        meta.denoise_output.activation,
        meta.vad_output.activation,
    )


def rnn_step_pallas(params: dict, acts: tuple, state, features):
    """Batched rnn_step through the fused kernel: state leaves (B, n),
    features (B, 42).  Returns (new_state_tuple, gains, vad (B,))."""
    weights = _flatten_params(params)
    hv, hn, hd, gains, vad = _rnn_pallas(
        weights, state.vad, state.noise, state.denoise, features, acts
    )
    return (hv, hn, hd), gains, vad[:, 0]
