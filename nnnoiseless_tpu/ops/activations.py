"""Table-based activation approximations.

The reference evaluates tanh/sigmoid via a 201-entry lookup table with a
cubic correction (src/util.rs:29-53).  Output parity requires reproducing
that approximation — the true ``jnp.tanh`` does NOT match.  On TPU the table
lookup is a small gather on the VPU; the whole thing fuses into the
surrounding matmul epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tables import TANSIG_TABLE

_TABLE = jnp.asarray(TANSIG_TABLE)
_GRID = jnp.arange(TANSIG_TABLE.shape[0], dtype=jnp.int32)


def _table_lookup(idx: jnp.ndarray) -> jnp.ndarray:
    """Exact table read as a one-hot select-reduce.

    A plain gather from the 201-entry table is scalar-unit-bound on TPU and
    dominates the RNN cell's runtime; the equivalent one-hot compare +
    masked sum runs on the VPU and fuses with the surrounding elementwise
    ops.  Bit-exact: each product is table_value * {0,1} and exactly one
    term per lane is nonzero, so summation order cannot change the result.
    """
    one_hot = idx[..., None] == _GRID
    return jnp.sum(jnp.where(one_hot, _TABLE, jnp.float32(0.0)), axis=-1)


def tansig_approx(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise tanh approximation, exactly the reference's math.

    Clamps to ±1 outside (-8, 8); NaN maps to 1.0 (the reference's reversed
    comparisons catch NaNs in the first branch).
    """
    x = jnp.asarray(x, jnp.float32)
    sign = jnp.where(x < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    # Compute the interpolation on |x| clamped into range; out-of-range and
    # NaN lanes are overridden below.
    ax = jnp.minimum(jnp.abs(jnp.where(jnp.isnan(x), 0.0, x)), jnp.float32(7.99))
    i = jnp.floor(jnp.float32(0.5) + jnp.float32(25.0) * ax)
    frac = ax - jnp.float32(0.04) * i
    y = _table_lookup(i.astype(jnp.int32))
    dy = jnp.float32(1.0) - y * y
    y = y + frac * dy * (jnp.float32(1.0) - y * frac)
    out = sign * y
    # Reference order: `if !(x < 8) return 1` (catches NaN), `if !(x > -8) return -1`.
    out = jnp.where(x > jnp.float32(-8.0), out, jnp.float32(-1.0))
    out = jnp.where(x < jnp.float32(8.0), out, jnp.float32(1.0))
    return out


def sigmoid_approx(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 + 0.5 * tansig(0.5 * x) (reference util.rs:47-49)."""
    return jnp.float32(0.5) + jnp.float32(0.5) * tansig_approx(jnp.float32(0.5) * x)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, jnp.float32(0.0))
