"""Pitch analysis: downsample + LPC whitening, two-stage search, octave removal.

TPU-first re-design of the reference pitch stack (src/pitch.rs):

* the 2x decimation + order-4 LPC whitening FIR becomes vectorized slicing,
  five dot products, an unrolled 4-step Levinson recursion and a 6-tap
  convolution — no sequential sample loops;
* the coarse (147-lag) and fine (294-lag) cross-correlations are dense
  1-D convolutions on the MXU (the reference computes the fine stage
  sparsely; on TPU the dense product is cheaper than gather-heavy
  sparsity, and the result is masked back to the reference's candidate
  set so selection is identical);
* the normalized top-2 selection (find_best_pitch, pitch.rs:372-405) is a
  closed-form prefix scan + masked double argmax — no sequential loop;
* remove_doubling's ~31 dynamic-lag inner products become ONE dense
  385-lag correlation plus scalar lookups; the k=2..15 octave loop is
  statically unrolled with masked updates, and the early ``break``
  becomes a sticky invalid flag.

Everything is a pure function of (input_mem, last_period, last_gain); the
only cross-frame pitch state is (last_period, last_gain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    MAX_PITCH,
    PITCH_FRAME_DS,
    PITCH_MAX_DS,
    PITCH_MAX_PERIOD,
    PITCH_MIN_DS,
    PITCH_MIN_PERIOD,
)
from ..tables import SECOND_CHECK
from .precision import dot

_F32 = jnp.float32

# 0.9, 0.9^2, ... computed with sequential f32 multiplies like the reference
# (pitch.rs:470-474: tmp *= 0.9 each iteration in f32).
_LPC_TAPER = np.empty(4, dtype=np.float32)
_t = np.float32(1.0)
for _i in range(4):
    _t = np.float32(_t * np.float32(0.9))
    _LPC_TAPER[_i] = _t


def downsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """[1/4, 1/2, 1/4] decimation by 2: (1728,) -> (864,).

    x_lp[i] = ((x[2i-1] + x[2i+1])/2 + x[2i])/2, with x[-1] treated as 0
    (reference pitch.rs:455-458).
    """
    even = x[0::2]  # x[2i]
    odd = x[1::2]  # x[2i+1]
    prev_odd = jnp.concatenate([jnp.zeros((1,), _F32), odd[:-1]])  # x[2i-1]
    return ((prev_odd + odd) * _F32(0.5) + even) * _F32(0.5)


def autocorr5(x: jnp.ndarray) -> jnp.ndarray:
    """Autocorrelation lags 0..4 of (n,) — five masked dots."""
    n = x.shape[-1]
    acs = [dot(x, x)]
    for k in range(1, 5):
        acs.append(dot(x[: n - k], x[k:]))
    return jnp.stack(acs)


def lpc4(ac: jnp.ndarray) -> jnp.ndarray:
    """Order-4 Levinson-Durbin with the reference's early-exit semantics.

    Replicates pitch.rs:257-292: returns zeros when ac[0] == 0; freezes all
    updates once the prediction error drops below 0.001 * ac[0].
    """
    lpc = [_F32(0.0)] * 4
    error = ac[0]
    done = ac[0] == _F32(0.0)
    thresh = _F32(0.001) * ac[0]
    for i in range(4):
        rr = ac[i + 1]
        for j in range(i):
            rr = rr + lpc[j] * ac[i - j]
        r = -rr / jnp.where(done, _F32(1.0), error)
        new = list(lpc)
        new[i] = r
        for j in range((i + 1) // 2):
            tmp1, tmp2 = new[j], new[i - 1 - j]
            new[j] = tmp1 + r * tmp2
            new[i - 1 - j] = tmp2 + r * tmp1
        lpc = [jnp.where(done, o, n) for o, n in zip(lpc, new)]
        error = jnp.where(done, error, error - r * r * error)
        done = jnp.logical_or(done, error < thresh)
    return jnp.stack(lpc)


def whiten(x_lp: jnp.ndarray) -> jnp.ndarray:
    """LPC whitening of the downsampled buffer (pitch.rs:448-483)."""
    ac = autocorr5(x_lp)
    ac = ac.at[0].multiply(_F32(1.0001))  # -40 dB noise floor
    lag_win = jnp.asarray(
        [1.0] + [1.0 - (0.008 * i) * (0.008 * i) for i in range(1, 5)], _F32
    )
    # reference: ac[i] -= ac[i] * (0.008 i)^2  ==  ac[i] *= (1 - (0.008 i)^2)
    # keep the subtract form for bit-level faithfulness:
    sub = jnp.asarray([0.0] + [(0.008 * i) * (0.008 * i) for i in range(1, 5)], _F32)
    ac = ac - ac * sub
    del lag_win

    c = lpc4(ac) * jnp.asarray(_LPC_TAPER)
    # Add a zero at 0.8: kernel [1, c0+0.8, c1+0.8c0, c2+0.8c1, c3+0.8c2, 0.8c3]
    kernel = jnp.stack(
        [
            _F32(1.0),
            c[0] + _F32(0.8),
            c[1] + _F32(0.8) * c[0],
            c[2] + _F32(0.8) * c[1],
            c[3] + _F32(0.8) * c[2],
            _F32(0.8) * c[3],
        ]
    )
    # fir5_in_place == causal FIR with zero history.  Expressed as six
    # shifted multiply-adds (pure VPU): under the chunk path's vmap a
    # per-row-kernel jnp.convolve becomes a (B*T)-group conv, which XLA
    # lowers pathologically on TPU.
    n = x_lp.shape[0]
    y = kernel[0] * x_lp
    for j in range(1, 6):
        y = y + kernel[j] * jnp.concatenate(
            [jnp.zeros((j,), _F32), x_lp[: n - j]]
        )
    return y


@functools.lru_cache(maxsize=8)
def _banded_ones(n: int, length: int, n_lags: int, reverse: bool = False):
    """(n, n_lags) f32 matrix W with W[j, k] = 1 iff j in the k-th window.

    Forward: window k = [k, k+length); reverse: window k = [n - length - k,
    n - k) (the octave-removal energy table's backward walk).  Multiplying
    ``y*y`` by W yields all sliding window energies as ONE MXU product —
    the TPU-native form of the reference's running add/subtract energy
    updates (pitch.rs:137-142, 400-402); lane-axis cumsum/flip chains are
    relayout-bound on TPU (measured ~100 ms each at production batch).
    """
    w = np.zeros((n, n_lags), np.float32)
    for k in range(n_lags):
        if reverse:
            w[n - length - k : n - k, k] = 1.0
        else:
            w[k : k + length, k] = 1.0
    return w


def window_energies(
    y: jnp.ndarray, length: int, n_lags: int, reverse: bool = False
) -> jnp.ndarray:
    """||y[k : k+length]||^2 for k in [0, n_lags) (or the reversed walk),
    batched over leading axes, as one banded matmul."""
    w = jnp.asarray(_banded_ones(y.shape[-1], length, n_lags, reverse))
    # 3-pass bf16: ~2^-21 relative on all-positive sums — validated on
    # hardware against the golden oracle + lag-exact pitch trace.
    return jnp.matmul(y * y, w, precision=jax.lax.Precision.HIGH)


def sliding_dot(x: jnp.ndarray, y: jnp.ndarray, n_lags: int) -> jnp.ndarray:
    """xcorr[i] = dot(x, y[i : i+len(x)]) for i in [0, n_lags).

    Dense formulation of pitch_xcorr (pitch.rs:296-363), expressed as a
    1-D convolution (XLA convs are correlations — no kernel flip), which
    lowers onto the MXU.  Under ``vmap`` the batching rule turns this into
    one grouped conv; unlike a gather-of-windows formulation it never
    materializes the (B, n_lags, n) window tensor (2.3 GB at B=4096).
    """
    n = x.shape[0]
    out = jax.lax.conv_general_dilated(
        y[None, None, :],  # (1, 1, m)
        x[None, None, :],  # (1, 1, n)
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGH,
    )[0, 0]
    return out[:n_lags]


def find_best_pitch(
    xcorr: jnp.ndarray,
    y: jnp.ndarray,
    length: int,
    energies: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-2 lags maximizing xcorr^2 / ||y[i:i+length]||^2.

    The reference (pitch.rs:372-405) runs a sequential loop: a running
    window norm ``ysn`` updated and clamped to >= 1 after every lag, and a
    cross-multiplied best/second-best tracker over ``xcorr[i]^2 / ysn_i``
    restricted to ``xcorr[i] > 0``.

    TPU-first formulation, fully parallel (no scan):

    * in exact arithmetic the clamped running norm is simply
      ``u_i = 1 + ||y[i:i+length]||^2`` — the ``max(.., 1)`` clamp exists
      only to guard the reference's sequential f32 add/subtract updates
      from drifting below 1.  Window norms come from one log-depth cumsum
      of ``y^2`` (monotone positive prefix sums, differenced per window).
      The f32 error class matches the reference's own streaming updates
      (ulp of the running total); a ones-kernel conv would be bit-closer
      to exact but XLA lowers wide 1-D convs as shifted adds (~10x the
      cost of the entire pitch search — measured on v5e), so the clamp is
      kept and the cumsum wins;
    * the streaming top-2 tracker selects exactly the two largest ratios
      (earlier lag wins ties), reproduced by a masked double argmax with
      the reference's sentinel semantics for <2 qualified lags.

    f32 rounding differs from the sequential loop at ulp level; lag
    decisions on real audio are unaffected (golden oracle + lag-exact
    cross-check vs the sequential native engine, tests/test_pitch_trace.py).
    """
    n_lags = xcorr.shape[0]
    # ||y[i:i+length]||^2 — one banded matmul, or a caller-shared table
    # (the chunk path computes the 385-lag forward table ONCE and serves
    # this consumer and octave removal's reversed walk from it; the banded
    # matrices are column-selections of each other, so sharing is
    # bit-exact).
    w = energies[:n_lags] if energies is not None else window_energies(
        y, length, n_lags
    )
    u = jnp.maximum(_F32(1.0) + w, _F32(1.0))  # ysn as seen at each lag

    qualified = xcorr > _F32(0.0)
    ratio = jnp.where(qualified, (xcorr * xcorr) / u, -jnp.inf)
    best = jnp.argmax(ratio).astype(jnp.int32)
    # mask via select, not .at[best].set: a batched scatter at a dynamic
    # per-row index is serialization-bound on TPU
    ratio2 = jnp.where(
        jnp.arange(n_lags, dtype=jnp.int32) == best, -jnp.inf, ratio
    )
    has_second = jnp.any(ratio2 > -jnp.inf)
    any_q = jnp.any(qualified)
    second = jnp.where(
        has_second,
        jnp.argmax(ratio2).astype(jnp.int32),
        # one qualified lag -> the demoted initial best (0);
        # zero qualified -> the initial second sentinel (1).
        jnp.where(any_q, jnp.int32(0), jnp.int32(1)),
    )
    return best, second


def pitch_search(
    pitch_buf: jnp.ndarray,
    xcorr2_full: jnp.ndarray | None = None,
    energies: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Two-stage coarse/fine pitch search on the whitened 2x buffer.

    Returns the reference's ``2*best_pitch - offset`` (pitch.rs:63-115), an
    int32 in [0, 2*MAX_PITCH/2).

    ``xcorr2_full`` (>= 294 lags) may be supplied by the caller: the fine
    stage's dense correlation ``dot(x[384:864], x[i:i+480])`` is the SAME
    product octave removal needs at 385 lags (doubling_tables), so the
    chunk path computes it once via DFTs (ops/fft.py::xcorr_dft) and
    shares it between both consumers.
    """
    x_lp = pitch_buf[PITCH_MAX_DS:]  # (480,)
    # 4x-downsampled views
    x_lp4 = x_lp[0::2][: PITCH_FRAME_DS // 2]  # (240,)
    y_lp4 = pitch_buf[0::2][: PITCH_FRAME_DS // 2 + MAX_PITCH // 4]  # (387,)

    # Coarse: brute force over 147 lags (DFT matmuls — a vmapped
    # sliding_dot becomes a huge grouped conv, see xcorr_dft).
    from .fft import xcorr_dft

    xcorr4 = xcorr_dft(x_lp4, y_lp4, MAX_PITCH // 4)
    best4, second4 = find_best_pitch(xcorr4, y_lp4, PITCH_FRAME_DS // 2)

    # Fine: all 294 lags as one dense product, masked to the reference's
    # candidate set (within ±2 of 2*best or 2*second), values clamped >= -1.
    n_fine = MAX_PITCH // 2
    if xcorr2_full is None:
        xcorr2_full = sliding_dot(x_lp, pitch_buf, n_fine)
    else:
        xcorr2_full = xcorr2_full[:n_fine]
    lags = jnp.arange(n_fine, dtype=jnp.int32)
    near = (jnp.abs(lags - 2 * best4) <= 2) | (jnp.abs(lags - 2 * second4) <= 2)
    xcorr2 = jnp.where(near, jnp.maximum(xcorr2_full, _F32(-1.0)), _F32(0.0))
    best2, _ = find_best_pitch(xcorr2, pitch_buf, PITCH_FRAME_DS, energies)

    # Pseudo-interpolation (only in the interior).
    bm1 = jnp.clip(best2 - 1, 0, n_fine - 1)
    bp1 = jnp.clip(best2 + 1, 0, n_fine - 1)
    a = xcorr2[bm1]
    b = xcorr2[best2]
    c = xcorr2[bp1]
    offset = jnp.where(
        c - a > _F32(0.7) * (b - a),
        jnp.int32(1),
        jnp.where(a - c > _F32(0.7) * (b - c), jnp.int32(-1), jnp.int32(0)),
    )
    interior = (best2 > 0) & (best2 < n_fine - 1)
    offset = jnp.where(interior, offset, jnp.int32(0))
    return 2 * best2 - offset


def doubling_tables(
    x: jnp.ndarray,
    corr_full: jnp.ndarray | None = None,
    energies: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Frame-local inputs of octave removal: (corr_full, yy_lookup, xx).

    Pure function of the whitened 2x buffer — no dependence on the
    cross-frame pitch carry — so the chunk path hoists it out of the scan
    (computed for all (B, T) frames as batched MXU convs, chunk.py).

    * ``corr_full`` (385,): all lag correlations in one dense pass; the
      reference computes ~31 dot products at data-dependent lags
      (pitch.rs:137-221) — per-stream dynamic-slice windows are
      gather-bound on TPU, while the dense correlation is one MXU conv
      and each lookup is then a scalar index.
      ``corr_at(t) = corr_full[384 - t]``.
    * ``yy_lookup`` (385,): ``max(xx + sum_{k<=i}(x[384-k]^2 - x[864-k]^2), 0)``
      (the reference's running energy table, pitch.rs:137-142).
    * ``xx`` (): energy of the 480-sample tail.
    """
    max_period = PITCH_MAX_DS  # 384
    n = PITCH_FRAME_DS  # 480
    x_tail = x[max_period:]  # x[384:864]
    if corr_full is None:
        corr_full = sliding_dot(x_tail, x, max_period + 1)  # (385,)

    # yy_lookup[k] == ||x[384-k : 864-k]||^2 (the reference's running
    # add/subtract table telescopes to exact window energies): one banded
    # matmul for all 385 windows.  The reversed walk is a lane flip of the
    # forward table (reverse window k = forward window 384-k — identical
    # banded-matrix columns, reordered), so when the caller shares the
    # forward table the flip is bit-exact and the matmul is skipped
    # entirely.  Non-negative by construction; the clamp only guards f32
    # rounding.
    yy_lookup = jnp.maximum(
        energies[..., ::-1]
        if energies is not None
        else window_energies(x, n, max_period + 1, reverse=True),
        _F32(0.0),
    )
    xx = yy_lookup[..., 0]
    return corr_full, yy_lookup, xx


N_DOUBLING_K = 14  # k = 2..15 octave-removal candidates


def doubling_candidates(
    corr_full: jnp.ndarray,
    yy_lookup: jnp.ndarray,
    xx: jnp.ndarray,
    pitch_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Frame-local candidate tables for octave removal, packed on lanes.

    Everything remove_doubling looks up is a function of the frame-local
    ``pitch_idx`` alone — the cross-frame carry (last_period, last_gain)
    only enters the accept thresholds (pitch.rs:173-189).  So the ~50
    data-dependent table lookups are hoisted here (XLA gathers, batched
    over all (B, T) frames) and the scan/kernel keeps only the 14-step
    select chain on these lanes (remove_doubling_from_candidates).

    Returns (105,) f32, layout::

        [0]      t0 (exact small int as f32)
        [1]      g0
        [2]      xy0
        [3]      yy0
        [4:18]   t1 for k = 2..15
        [18:32]  xy_k   (averaged two-lag correlation)
        [32:46]  yy_k
        [46:60]  g1_k
        [60:75]  corr_at(cand - 1) for cand in [t0, t1_2..t1_15]
        [75:90]  corr_at(cand)
        [90:105] corr_at(cand + 1)
    """
    max_period = PITCH_MAX_DS
    t0 = jnp.minimum(pitch_idx // 2, max_period - 1)

    def corr_at(t):
        return corr_full[max_period - t]

    def pitch_gain(xy, yy):
        return xy / jnp.sqrt(_F32(1.0) + xx * yy)

    xy0 = corr_at(t0)
    yy0 = yy_lookup[t0]
    g0 = pitch_gain(xy0, yy0)

    t1s, xys, yys, g1s = [], [], [], []
    for k in range(2, 16):
        t1 = (2 * t0 + k) // (2 * k)
        if k == 2:
            t1b = jnp.where(t1 + t0 > max_period, t0, t0 + t1)
        else:
            t1b = (2 * SECOND_CHECK[k] * t0 + k) // (2 * k)
        xy = (corr_at(t1) + corr_at(t1b)) * _F32(0.5)
        yy = (yy_lookup[t1] + yy_lookup[t1b]) * _F32(0.5)
        t1s.append(t1)
        xys.append(xy)
        yys.append(yy)
        g1s.append(pitch_gain(xy, yy))

    cands = [t0] + t1s
    cm1 = [corr_at(t - 1) for t in cands]
    cc = [corr_at(t) for t in cands]
    cp1 = [corr_at(t + 1) for t in cands]

    f = lambda vs: jnp.stack([jnp.asarray(v, _F32) for v in vs])
    return jnp.concatenate(
        [
            jnp.stack([t0.astype(_F32), g0, xy0, yy0]),
            f(t1s), f(xys), f(yys), f(g1s), f(cm1), f(cc), f(cp1),
        ]
    )


def remove_doubling_from_candidates(
    cand: jnp.ndarray,
    last_period: jnp.ndarray,
    last_gain: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The carry-dependent half of octave removal on precomputed candidate
    lanes (see doubling_candidates): the k=2..15 threshold/select chain
    with the previous frame's continuity bonus (pitch.rs:173-221).  All
    integer quantities ride as exact small floats — no gathers, no integer
    division."""
    min_period = _F32(PITCH_MIN_DS)
    t0 = cand[0]
    g0 = cand[1]
    xy0, yy0 = cand[2], cand[3]
    prev_period = jnp.floor(last_period.astype(_F32) * _F32(0.5))

    best_xy, best_yy = xy0, yy0
    t, g = t0, g0
    bidx = _F32(0.0)  # selected candidate index (0 = t0, k-1 for k)
    stopped = jnp.bool_(False)

    for k in range(2, 16):
        t1 = cand[4 + (k - 2)]
        active = ~stopped & (t1 >= min_period)
        stopped = stopped | (t1 < min_period)
        xy = cand[18 + (k - 2)]
        yy = cand[32 + (k - 2)]
        g1 = cand[46 + (k - 2)]
        adiff = jnp.abs(t1 - prev_period)
        cont = jnp.where(
            adiff <= 1,
            last_gain,
            jnp.where(
                (adiff <= 2) & (_F32(5 * k * k) < t0),
                last_gain * _F32(0.5),
                _F32(0.0),
            ),
        )
        thresh = jnp.where(
            t1 < 3 * min_period,
            jnp.maximum(_F32(0.85) * g0 - cont, _F32(0.4)),
            jnp.where(
                t1 < 2 * min_period,
                jnp.maximum(_F32(0.9) * g0 - cont, _F32(0.5)),
                jnp.maximum(_F32(0.7) * g0 - cont, _F32(0.3)),
            ),
        )
        upd = active & (g1 > thresh)
        best_xy = jnp.where(upd, xy, best_xy)
        best_yy = jnp.where(upd, yy, best_yy)
        t = jnp.where(upd, t1, t)
        g = jnp.where(upd, g1, g)
        bidx = jnp.where(upd, _F32(k - 1), bidx)

    best_xy = jnp.maximum(best_xy, _F32(0.0))
    pg = jnp.where(best_yy <= best_xy, _F32(1.0), best_xy / (best_yy + _F32(1.0)))

    sel = jnp.arange(15, dtype=_F32) == bidx
    pick = lambda off: jnp.sum(jnp.where(sel, cand[off : off + 15], _F32(0.0)))
    c0 = pick(60)
    c1 = pick(75)
    c2 = pick(90)
    offset = jnp.where(
        c2 - c0 > _F32(0.7) * (c1 - c0),
        _F32(1.0),
        jnp.where(c0 - c2 > _F32(0.7) * (c1 - c2), _F32(-1.0), _F32(0.0)),
    )
    pg = jnp.minimum(pg, g)
    period = jnp.maximum(2 * t + offset, _F32(PITCH_MIN_PERIOD))
    return period.astype(jnp.int32), pg


def remove_doubling(
    x: jnp.ndarray,
    pitch_idx: jnp.ndarray,
    last_period: jnp.ndarray,
    last_gain: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Octave-error removal (pitch.rs:118-221): try T/k for k=2..15.

    ``x`` is the whitened 2x-downsampled buffer (864,); ``pitch_idx`` is in
    the original-rate domain.  Returns (period, gain) in the original domain.
    """
    corr_full, yy_lookup, xx = doubling_tables(x)
    return remove_doubling_from_tables(
        corr_full, yy_lookup, xx, pitch_idx, last_period, last_gain
    )


def remove_doubling_from_tables(
    corr_full: jnp.ndarray,
    yy_lookup: jnp.ndarray,
    xx: jnp.ndarray,
    pitch_idx: jnp.ndarray,
    last_period: jnp.ndarray,
    last_gain: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The carry-dependent half of octave removal: the k=2..15 selection
    loop with the previous frame's continuity bonus (pitch.rs:173-179),
    operating purely on precomputed tables — scalar selects and gathers,
    the only pitch work left inside the production scan."""
    min_period = PITCH_MIN_DS  # 30
    max_period = PITCH_MAX_DS  # 384

    t0 = jnp.minimum(pitch_idx // 2, max_period - 1)
    prev_period = last_period // 2

    def corr_at(t):
        return corr_full[max_period - t]

    xy0 = corr_at(t0)
    yy0 = yy_lookup[t0]

    def pitch_gain(xy, xx_, yy_):
        return xy / jnp.sqrt(_F32(1.0) + xx_ * yy_)

    g0 = pitch_gain(xy0, xx, yy0)

    best_xy, best_yy = xy0, yy0
    t, g = t0, g0
    stopped = jnp.bool_(False)

    for k in range(2, 16):
        t1 = (2 * t0 + k) // (2 * k)
        active = ~stopped & (t1 >= min_period)
        stopped = stopped | (t1 < min_period)
        if k == 2:
            t1b = jnp.where(t1 + t0 > max_period, t0, t0 + t1)
        else:
            t1b = (2 * SECOND_CHECK[k] * t0 + k) // (2 * k)
        xy = (corr_at(t1) + corr_at(t1b)) * _F32(0.5)
        yy = (yy_lookup[t1] + yy_lookup[t1b]) * _F32(0.5)
        g1 = pitch_gain(xy, xx, yy)
        adiff = jnp.abs(t1 - prev_period)
        cont = jnp.where(
            adiff <= 1,
            last_gain,
            jnp.where(
                (adiff <= 2) & (5 * k * k < t0),
                last_gain * _F32(0.5),
                _F32(0.0),
            ),
        )
        # Threshold chain exactly as written (pitch.rs:183-189); note the
        # middle branch is shadowed by the first, as in the reference.
        thresh = jnp.where(
            t1 < 3 * min_period,
            jnp.maximum(_F32(0.85) * g0 - cont, _F32(0.4)),
            jnp.where(
                t1 < 2 * min_period,
                jnp.maximum(_F32(0.9) * g0 - cont, _F32(0.5)),
                jnp.maximum(_F32(0.7) * g0 - cont, _F32(0.3)),
            ),
        )
        upd = active & (g1 > thresh)
        best_xy = jnp.where(upd, xy, best_xy)
        best_yy = jnp.where(upd, yy, best_yy)
        t = jnp.where(upd, t1, t)
        g = jnp.where(upd, g1, g)

    best_xy = jnp.maximum(best_xy, _F32(0.0))
    pg = jnp.where(best_yy <= best_xy, _F32(1.0), best_xy / (best_yy + _F32(1.0)))

    c0 = corr_at(t - 1)
    c1 = corr_at(t)
    c2 = corr_at(t + 1)
    offset = jnp.where(
        c2 - c0 > _F32(0.7) * (c1 - c0),
        jnp.int32(1),
        jnp.where(c0 - c2 > _F32(0.7) * (c1 - c2), jnp.int32(-1), jnp.int32(0)),
    )
    pg = jnp.minimum(pg, g)
    period = jnp.maximum(2 * t + offset, PITCH_MIN_PERIOD)
    return period, pg


def pitch_process(
    input_mem: jnp.ndarray,
    last_period: jnp.ndarray,
    last_gain: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full per-frame pitch analysis (reference PitchFinder::process).

    ``input_mem`` is the (1728,) input history.  Returns (period, gain); the
    caller carries them as the next frame's (last_period, last_gain).
    """
    x_lp = whiten(downsample_2x(input_mem))
    search = pitch_search(x_lp)
    pitch_idx = PITCH_MAX_PERIOD - search
    return remove_doubling(x_lp, pitch_idx, last_period, last_gain)
