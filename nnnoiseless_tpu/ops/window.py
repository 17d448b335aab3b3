"""Lagged analysis-window extraction — Pallas kernel + portable fallback.

The analysis at the pitch lag needs ``input_mem[-(960+lag) : -lag]`` with a
*per-stream* lag (reference transform_input, src/features.rs:281-298).  On
TPU a vmapped ``dynamic_slice`` lowers to an elementwise gather (~4 ms/step
at B=4096, the single hottest op of the pipeline), and the pure-XLA barrel
shifter, while much faster, still round-trips ~0.5 GB/step of intermediates
through HBM.

The Pallas kernel performs the same barrel shift entirely in VMEM: each
program loads a (block, 1728) tile once, applies 10 static ``pltpu.roll``
shifts gated per-row by the lag bits, and writes the (block, 960) window —
one HBM read + one write total.  Garbage wrapped around by ``roll`` only
ever occupies positions < lag <= 768, never the extracted tail.

Integration is via ``jax.custom_batching.custom_vmap``: the per-stream
function used inside the vmapped frame step sees the materialized batch
axis and can dispatch to the blocked kernel (``NNT_PALLAS_WINDOW=1``).
Measured end to end the pure-XLA barrel shifter currently wins — XLA fuses
it with the adjacent windowing/DFT ops, while a ``pallas_call`` is a fusion
barrier — so the kernel stays opt-in; see the dispatch rule below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PITCH_BUF_SIZE, WINDOW_SIZE

_N_BITS = 10  # covers lags < 1024 (PITCH_MAX_PERIOD = 768)
_BLOCK = 256  # streams per program: (256, 1728) f32 = 1.7 MB in VMEM
_OFF = PITCH_BUF_SIZE - WINDOW_SIZE  # 768


def _barrel_shift_window(input_mem: jnp.ndarray, lag: jnp.ndarray) -> jnp.ndarray:
    """Portable XLA formulation: 10 static shifts + bit-selects (any backend).

    ``input_mem`` (..., 1728), ``lag`` (...) int32 — broadcasts over leading
    axes.
    """
    y = input_mem
    for b in range(_N_BITS):
        sh = 1 << b
        zeros = jnp.zeros(y.shape[:-1] + (sh,), y.dtype)
        shifted = jnp.concatenate([zeros, y[..., :-sh]], axis=-1)
        y = jnp.where((((lag >> b) & 1) == 1)[..., None], shifted, y)
    return y[..., _OFF:]


def _window_kernel(lag_ref, mem_ref, out_ref):
    y = mem_ref[:, :]  # (block, 1728)
    lag = lag_ref[:, :]  # (block, 1) int32
    for b in range(_N_BITS):
        rolled = pltpu.roll(y, 1 << b, axis=1)
        y = jnp.where(((lag >> b) & 1) == 1, rolled, y)
    out_ref[:, :] = y[:, _OFF:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_window(mem: jnp.ndarray, lag: jnp.ndarray, interpret: bool = False):
    b = mem.shape[0]
    return pl.pallas_call(
        _window_kernel,
        grid=(b // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_BLOCK, PITCH_BUF_SIZE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK, WINDOW_SIZE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, WINDOW_SIZE), mem.dtype),
        interpret=interpret,
    )(lag[:, None].astype(jnp.int32), mem)


@jax.custom_batching.custom_vmap
def window_at_lag(input_mem: jnp.ndarray, lag: jnp.ndarray) -> jnp.ndarray:
    """input_mem[-(960+lag) : -lag] for one stream: (1728,), () -> (960,)."""
    return _barrel_shift_window(input_mem, lag)


@window_at_lag.def_vmap
def _window_at_lag_vmap(axis_size, in_batched, input_mem, lag):
    import os

    mem_b, lag_b = in_batched
    if not mem_b:
        input_mem = jnp.broadcast_to(input_mem, (axis_size,) + input_mem.shape)
    if not lag_b:
        lag = jnp.broadcast_to(lag, (axis_size,) + lag.shape)
    # Measured end to end (batch 4096, one v5e chip) the XLA barrel shifter
    # WINS: XLA fuses its shifts/selects with the neighboring windowing and
    # DFT stage-1 ops, while the Pallas call is a fusion barrier (6562x vs
    # 7384x aggregate realtime).  The kernel is kept as an opt-in
    # (NNT_PALLAS_WINDOW=1) and as the template for deeper fusions.
    use_pallas = (
        os.environ.get("NNT_PALLAS_WINDOW") == "1"
        and jax.default_backend() != "cpu"
        and axis_size % _BLOCK == 0
    )
    if use_pallas:
        out = _pallas_window(input_mem, lag)
    else:
        out = _barrel_shift_window(input_mem, lag)
    return out, True
