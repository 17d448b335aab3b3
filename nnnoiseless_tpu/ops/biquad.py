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

import functools

import jax
import jax.numpy as jnp
import numpy as np


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


@functools.lru_cache(maxsize=8)
def _linear_biquad_tables(a0, a1, b0, b1, n):
    """Unrolled-recurrence matrices for a fixed biquad over n samples.

    The biquad is an affine linear recurrence in the 2-vector carry
    ``m``: with y[t] = x[t] + m0[t],

        m[t+1] = A m[t] + c x[t],   A = [[-a0, 1], [-a1, 0]],
                                    c = [b0 - a0, b1 - a1].

    Unrolling gives every output and the final carry as *linear* functions
    of the inputs and the initial carry — i.e. the whole sequential filter
    is one (n, n) Toeplitz matmul plus rank-2 carry terms.  On TPU this
    replaces a 480-step ``lax.scan`` (the latency hot spot of the frame
    step) with a single MXU contraction.  Weights are precomputed in f64.

    Returns (W (n,n): y = x + x @ W + mem @ P,  P (2,n),
             H (n,2): mem' = x @ H + mem @ Q,   Q (2,2)).
    """
    A = np.array([[-a0, 1.0], [-a1, 0.0]], np.float64)
    c = np.array([b0 - a0, b1 - a1], np.float64)
    # powers[j] = A^j
    powers = np.empty((n + 1, 2, 2))
    powers[0] = np.eye(2)
    for j in range(1, n + 1):
        powers[j] = A @ powers[j - 1]
    # y[t] = x[t] + m[t][0];  m[t] = A^t m0 + sum_{k<t} A^{t-1-k} c x[k]
    g = powers[:, 0, :] @ c  # g[j] = (A^j c)[0]
    W = np.zeros((n, n))
    for t in range(1, n):
        W[: t, t] = g[t - 1 :: -1][:t]  # W[k, t] = g[t-1-k]
    P = powers[: n, 0, :].T.copy()  # P[i, t] = A^t[0, i]
    H = (powers[n - 1 :: -1, :, :] @ c)[:, :]  # H[k] = A^{n-1-k} c
    Q = powers[n].T  # mem' = A^n m0  ->  m0 @ Q with Q = (A^n)^T
    # NumPy (not jnp) so the cache is safe across traces.
    return (
        W.astype(np.float32),
        P.astype(np.float32),
        H.astype(np.float32),
        Q.astype(np.float32),
    )


def biquad_filter_frames(
    frames: jnp.ndarray, mem: jnp.ndarray, a: tuple, b: tuple
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Filter a whole chunk of frames (B, T, n) with carry (B, 2) at once.

    The filter is linear/time-invariant, so the O(T B n^2) matmul work is
    hoisted out of the frame scan into ONE batched contraction; only the
    2-dim carry evolution (mem_{t+1} = x_t @ H + mem_t @ Q) remains
    sequential — a T-step scan over (B, 2) matrices.  Identical math to
    per-frame :func:`biquad_filter_dense` calls.

    Returns (filtered (B, T, n), mem' (B, 2)).
    """
    n = frames.shape[-1]
    W, P, H, Q = (
        jnp.asarray(t)
        for t in _linear_biquad_tables(
            float(a[0]), float(a[1]), float(b[0]), float(b[1]), n
        )
    )
    # Full fp32 contraction: the unrolled-recurrence rows carry ~250
    # slowly-decaying coefficients whose large partial sums cancel to an
    # O(input) result, so 3-pass bf16 loses up to ~160 i16 units at
    # production batch (tiling-dependent; measured vs an f64 oracle on
    # v5e).  HIGHEST keeps the error < 0.1 units at every batch size.
    hp = jax.lax.Precision.HIGHEST
    xw = jnp.matmul(frames, W, precision=hp)  # (B, T, n)
    xh = jnp.matmul(frames, H, precision=hp)  # (B, T, 2)

    def step(m, xh_t):  # m (B, 2), xh_t (B, 2)
        return jnp.matmul(m, Q, precision=hp) + xh_t, m

    mem_out, mems = jax.lax.scan(step, mem, jnp.swapaxes(xh, 0, 1))
    mems = jnp.swapaxes(mems, 0, 1)  # (B, T, 2): carry at each frame start
    y = frames + xw + jnp.matmul(mems, P, precision=hp)
    return y, mem_out


def biquad_filter_dense(
    x: jnp.ndarray, mem: jnp.ndarray, a: tuple, b: tuple
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Biquad with *static* coefficients as one matmul (see above).

    Same math as :func:`biquad_filter` up to f32 summation order (the
    reference itself accumulates in f64; the end-to-end oracle absorbs the
    difference).  ``a``/``b`` must be Python floats so the unrolled weight
    matrices are trace-time constants.
    """
    n = x.shape[-1]
    W, P, H, Q = (
        jnp.asarray(t)
        for t in _linear_biquad_tables(
            float(a[0]), float(a[1]), float(b[0]), float(b[1]), n
        )
    )
    hp = jax.lax.Precision.HIGHEST  # see biquad_filter_frames: the
    # unrolled-recurrence contraction cancels large partial sums
    y = x + jnp.matmul(x, W, precision=hp) + jnp.matmul(mem, P, precision=hp)
    mem_out = jnp.matmul(x, H, precision=hp) + jnp.matmul(mem, Q, precision=hp)
    return y, mem_out
