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


def _tables_f64(a0, a1, b0, b1, n):
    """f64 versions of the unrolled-recurrence matrices (see below)."""
    A = np.array([[-a0, 1.0], [-a1, 0.0]], np.float64)
    c = np.array([b0 - a0, b1 - a1], np.float64)
    powers = np.empty((n + 1, 2, 2))
    powers[0] = np.eye(2)
    for j in range(1, n + 1):
        powers[j] = A @ powers[j - 1]
    g = powers[:, 0, :] @ c
    W = np.zeros((n, n))
    for t in range(1, n):
        W[:t, t] = g[t - 1 :: -1][:t]
    P = powers[:n, 0, :].T.copy()
    H = powers[n - 1 :: -1, :, :] @ c
    Q = powers[n].T
    return W, P, H, Q


@functools.lru_cache(maxsize=8)
def _carry_prop_tables(a0, a1, b0, b1, n, t_count):
    """Closed-form frame-to-frame carry propagation over a whole chunk.

    The per-frame carry recurrence mem_{t+1} = mem_t @ Q + xh_t is itself a
    linear recurrence, so every frame-start state is a linear function of
    the initial state and the per-frame input terms:

        mem_t = mem_0 @ Q^t + sum_{k<t} xh_k @ Q^{t-1-k}.

    Flattened, ALL t_count+1 states (including the final carry) come from
    ONE (B, 2*t_count) x (2*t_count, 2*(t_count+1)) matmul plus a rank-2
    initial-state term — replacing a t_count-step ``lax.scan`` of tiny
    (B, 2) x (2, 2) matmuls whose cost on TPU is per-iteration dispatch,
    not FLOPs.

    Conditioning: Q = (A^n)^T is severely non-normal for the HP filter
    (entries ±144 cancelling to a ~0.4-norm action), so accumulating
    xh_k @ Q^j directly in f32 loses ~2 i16 units at production batch.
    The tables are therefore built in Q's MODAL basis: with Tm the real
    eigenbasis (columns [Re v, Im v] for a complex pair), G = Tm^-1 Q Tm
    is a pure rotation-scaling whose powers have entries <= |lambda|^j —
    every table entry is bounded and nothing cancels.  The basis change is
    folded into the endpoint tables in f64: xh' = frames @ (H Tm),
    u_0 = mem @ Tm, y-contribution u @ (Tm^-1 P), final carry
    u_T @ Tm^-1.  A (near-)defective Q falls back to Tm = I.

    Returns f32 (HT (n, 2), Tm (2, 2), M (2t, 2(t+1)), Qp (2, 2(t+1)),
    Pp (2, n), Tinv (2, 2)); see :func:`biquad_filter_frames` for use.
    """
    _, P, H, Q = _tables_f64(a0, a1, b0, b1, n)
    lam, V = np.linalg.eig(Q)
    if abs(lam[0].imag) > 1e-12 * abs(lam[0]):
        v = V[:, 0]
        Tm = np.stack([v.real, v.imag], axis=1)
    else:
        Tm = V.real
    # A near-defective eigenbasis puts ~cond(Tm)-scale entries into the f32
    # Tinv/Pp tables, reintroducing the cancellation the modal basis is
    # meant to remove; gate on the condition number (not the determinant —
    # a det just above any threshold can still mean ~1e6-entry tables) and
    # fall back to the identity, which is always correct (G = Q exactly).
    if not np.all(np.isfinite(Tm)) or np.linalg.cond(Tm) > 1e3:
        Tm = np.eye(2)
    Tinv = np.linalg.inv(Tm)
    G = Tinv @ Q @ Tm
    # The modal form must reproduce Q; if it does not (ill-conditioned
    # eigendecomposition), keep correctness over conditioning.  Not an
    # ``assert`` — that would be stripped under ``python -O`` and pass an
    # unvalidated basis into the f32 tables.
    if not np.allclose(Tm @ G @ Tinv, Q, atol=1e-8 * max(1.0, abs(Q).max())):
        Tm = Tinv = np.eye(2)
        G = Q
    gpow = np.empty((t_count + 1, 2, 2))
    gpow[0] = np.eye(2)
    for j in range(1, t_count + 1):
        gpow[j] = gpow[j - 1] @ G
    M = np.zeros((t_count, 2, t_count + 1, 2))
    for t in range(1, t_count + 1):
        for k in range(t):
            M[k, :, t, :] = gpow[t - 1 - k]
    Qp = np.transpose(gpow, (1, 0, 2)).reshape(2, 2 * (t_count + 1))
    return (
        (H @ Tm).astype(np.float32),
        Tm.astype(np.float32),
        M.reshape(2 * t_count, 2 * (t_count + 1)).astype(np.float32),
        Qp.astype(np.float32),
        (Tinv @ P).astype(np.float32),
        Tinv.astype(np.float32),
    )


# Sub-frame length for the blocked contraction below.  480-sample frames
# split 4x: the Toeplitz W cost per sample is O(n_sub) (k blocks of
# (n/k)^2), so 120-sample sub-frames cut the dominant HIGHEST-precision
# matmul ~4x while staying one lane-pad away from the 128 MXU tile.
_SUB_FRAME = 120


def biquad_filter_frames(
    frames: jnp.ndarray, mem: jnp.ndarray, a: tuple, b: tuple
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Filter a whole chunk of frames (B, T, n) with carry (B, 2) at once.

    The filter is linear/time-invariant, so the O(T B n^2) matmul work is
    hoisted out of the frame scan into ONE batched contraction, and the
    2-dim frame-to-frame carry evolution — itself linear — is likewise one
    small matmul against trace-time Q-power tables (_carry_prop_tables)
    instead of a T-step scan.  Identical math to per-frame
    :func:`biquad_filter_dense` calls.

    The frame axis is only a view: the carry propagation is exact at ANY
    block length, so the chunk is re-sliced into 120-sample sub-frames
    first — the (n, n) Toeplitz contraction is quadratic in block length
    while the carry matmul is quadratic in block COUNT but ~1000x smaller,
    so 4x shorter blocks cut the dominant matmul ~4x (the sub-frame carry
    tables are built in f64 like the frame-level ones; same modal
    conditioning story).

    Returns (filtered (B, T, n), mem' (B, 2)).
    """
    b_sz, t_count, n = frames.shape
    if n % _SUB_FRAME == 0 and n > _SUB_FRAME:
        k = n // _SUB_FRAME
        y, mem_out = _biquad_frames_blocked(
            frames.reshape(b_sz, t_count * k, _SUB_FRAME), mem, a, b
        )
        return y.reshape(b_sz, t_count, n), mem_out
    return _biquad_frames_blocked(frames, mem, a, b)


def _biquad_frames_blocked(
    frames: jnp.ndarray, mem: jnp.ndarray, a: tuple, b: tuple
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b_sz, t_count, n = frames.shape
    a0, a1 = float(a[0]), float(a[1])
    b0, b1 = float(b[0]), float(b[1])
    W, _, _, _ = (
        jnp.asarray(t) for t in _linear_biquad_tables(a0, a1, b0, b1, n)
    )
    HT, Tm, M, Qp, Pp, Tinv = (
        jnp.asarray(t) for t in _carry_prop_tables(a0, a1, b0, b1, n, t_count)
    )
    # Full fp32 contraction: the unrolled-recurrence rows carry ~250
    # slowly-decaying coefficients whose large partial sums cancel to an
    # O(input) result, so 3-pass bf16 loses up to ~160 i16 units at
    # production batch (tiling-dependent; measured vs an f64 oracle on
    # v5e).  HIGHEST keeps the error < 0.1 units at every batch size.
    hp = jax.lax.Precision.HIGHEST
    xw = jnp.matmul(frames, W, precision=hp)  # (B, T, n)
    xh = jnp.matmul(frames, HT, precision=hp)  # (B, T, 2), modal basis
    u = jnp.matmul(xh.reshape(b_sz, 2 * t_count), M, precision=hp)
    u = (u + jnp.matmul(jnp.matmul(mem, Tm, precision=hp), Qp, precision=hp))
    u = u.reshape(b_sz, t_count + 1, 2)  # modal states at each frame start
    y = frames + xw + jnp.matmul(u[:, :t_count], Pp, precision=hp)
    mem_out = jnp.matmul(u[:, t_count], Tinv, precision=hp)
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
