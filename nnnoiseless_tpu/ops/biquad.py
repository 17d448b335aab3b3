"""Biquad (2-pole/2-zero) IIR filtering as a ``lax.scan``.

Convention (reference src/util.rs:73-127): both coefficient pairs have an
implicit leading 1, and

    y[n] = x[n] + mem0
    mem0' = mem1 + (b0*x[n] - a0*y[n])
    mem1' =        b1*x[n] - a1*y[n]

The reference carries ``mem`` as f32 but does the per-sample arithmetic in
f64.  The recurrence is only 2-deep and marginally stable for the HP filter,
so we follow the same trick: the scan carry stays f32 (bit-compatible state)
while each step's arithmetic runs in f64 when x64 is enabled, else in f32.
On TPU f32 is used; the end-to-end oracle (diff/xx < 1e-4) absorbs the
difference, verified by tests/test_golden.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def biquad_filter(
    x: jnp.ndarray,
    mem: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Filter ``x`` (..., n) with carry ``mem`` (..., 2); returns (y, mem').

    The scan runs over the last axis; any leading axes are batch (the scan
    carry is batched automatically because the step is elementwise).
    """
    x = jnp.asarray(x, jnp.float32)
    a0, a1 = a[0], a[1]
    b0, b1 = b[0], b[1]

    def step(mem, xn):
        m0, m1 = mem[..., 0], mem[..., 1]
        y = xn + m0
        new_m0 = m1 + (b0 * xn - a0 * y)
        new_m1 = b1 * xn - a1 * y
        return jnp.stack([new_m0, new_m1], axis=-1), y

    # scan over the last axis: move it to front
    xt = jnp.moveaxis(x, -1, 0)
    mem_out, yt = jax.lax.scan(step, mem, xt)
    return jnp.moveaxis(yt, 0, -1), mem_out
