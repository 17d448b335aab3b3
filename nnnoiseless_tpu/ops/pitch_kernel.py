"""Fused pitch-analysis Pallas kernel: raw 2x window -> candidate tables.

Round-3 precompute redesign.  The chunk phase's pitch stack — LPC
whitening, the shared 385-lag correlation, the coarse/fine search and the
octave-removal candidate tables (ops/pitch.py, re-deriving
src/pitch.rs:63-221 + 448-483) — used to run as ~8 chained XLA programs
over (T*B, ...) tensors, streaming every intermediate (the whitened
buffer, two spectra, the correlation/energy tables; ~10 GB per production
chunk) through HBM.  The work is frame-local and batch-parallel, so the
TPU-native shape is ONE parallel Pallas kernel over row blocks: each
(block, 864) raw window is whitened, searched and tabulated entirely in
VMEM, and only the (block, 105) candidate lanes + the pitch index ever
leave the chip.

Numerics: every matmul runs in the 3-pass bf16 class (hi/lo splits,
frame_kernel._mm3) the XLA path is parity-validated at; the banded
window-energy matrix and the decimation selectors are 0/1-valued — exact
in bf16 — so those products need only the 2-pass operand split.  The
385-lag correlation DFT runs at n = 1024 = 8 x 128 through a
contiguous-block Cooley-Tukey factorization (_ct_dft_bases): a radix-8
VPU combine of lane-aligned 128-slices, five (128, 128) folded-twiddle
basis matmuls per side, and a scrambled-bin-order inverse — ~6x fewer
basis FLOPs than the round-4 dense 864-row bases at the same precision
class, with the bin permutation absorbed into the inverse table.

Reduction orders inside a block (row sums for autocorrelation, the
whitening FIR chain) differ from the XLA path at f32 ulp level; lag
DECISIONS are gated by the CPU equivalence tests (interpret mode, exact
candidate-lane comparison) and the TPU lane's golden + flip-budget bars,
like every other program-shape change this round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    MAX_PITCH,
    PITCH_FRAME_DS,
    PITCH_MAX_DS,
    PITCH_MAX_PERIOD,
)
from .frame_kernel import _div_const, _lookup, _mm3, _split3, _split_hi_lo
from .pitch import _LPC_TAPER
from ..tables import SECOND_CHECK

_F32 = jnp.float32
_BF16 = jnp.bfloat16

_N_DS = 864  # downsampled pitch-buffer length
_DS_STEP = 240  # ds samples per frame (FRAME_SIZE / 2): window stride
_N_LAGS = PITCH_MAX_DS + 1  # 385
_N_FINE = MAX_PITCH // 2  # 294 fine-search lags
_N_COARSE = MAX_PITCH // 4  # 147 coarse lags
_LEN4 = PITCH_FRAME_DS // 2  # 240: coarse kernel length
_YLEN4 = _LEN4 + _N_COARSE  # 387: coarse y length
_N_DFT4 = 388  # coarse DFT size (240 + 147 - 1 -> even)
_H4_PAD = 256  # padded coarse half-spectrum (195 -> 256)
_X4_PAD = 256  # x_lp4 lanes (240 -> 256)
_NEG = np.float32(-3.0e38)  # -inf stand-in (Mosaic-safe)

# --- Cooley-Tukey geometry for the 385-lag correlation DFT ------------------
# The linear correlation needs any n >= 480 + 385 - 1 = 864; n = 1024 = 8*128
# makes every CT block a CONTIGUOUS, lane-ALIGNED 128-slice (decimation in
# frequency, n = a + 128 b), so the factorization costs no permutation at
# all inside the kernel: a radix-8 combine of the 128-lane blocks on the VPU
# (coefficients in {0, +-1, +-sqrt(2)/2}), then one (128, 128) basis matmul
# per spectral phase r with the twiddle e^{-2 pi i r a / 1024} folded into
# the basis.  Real input needs only phases r = 0..4 (conjugate symmetry
# covers 5..7).  Bins come out in the scrambled order k = 8 m + r, which
# NEVER needs normalizing: the conj(X)*Y product is elementwise and the
# inverse basis rows are permuted to match at table-build time.
_CT_NA = 128  # lanes per block / stage-2 DFT length
_CT_NB = 8  # blocks (radix)
_CT_N = _CT_NA * _CT_NB  # 1024-point transform
_CT_R = 5  # stored phases (r = 0..4)
_CT_H = _CT_R * _CT_NA  # 640 stored bins per spectrum


def _ct_dft_bases():
    """Stacked stage-2 CT bases + the scrambled-order inverse, f64 -> f32.

    Returns (bc, bs, ic_ct):
      bc, bs (640, 128): rows 128 r + a hold the phase-r basis
        B_r[a, m] = e^{-2 pi i a (8 m + r) / 1024} (cos / sin parts) — the
        inter-block twiddle is folded in, so X[8 m + r] = g_r @ B_r where
        g_r is the radix-8 block combine.
      ic_ct (1280, 384): inverse for corr[s] = (1/n) sum_k conj(X_k) Y_k
        e^{2 pi i k s / n} over the packed [Pr(640) | Pi(640)] product in
        scrambled bin order; self-conjugate phase blocks (r = 0, 4) carry
        weight 1 (both k and n-k are present), r = 1..3 weight 2 (their
        conjugates r = 7..5 are not stored).  Only 384 lag columns: lag
        384 equals the tail energy e_tab[384] and is never read by the
        candidate walk (pidx >= 181 keeps every lookup at lane <= 383,
        and zero pad rows resolve to pidx = 768, t0 = 383), so dropping
        it lands the output on exactly 3 MXU tiles.
    """
    a = np.arange(_CT_NA)
    bc = np.zeros((_CT_H, _CT_NA))
    bs = np.zeros((_CT_H, _CT_NA))
    for r in range(_CT_R):
        theta = 2.0 * np.pi * np.outer(a, 8 * np.arange(_CT_NA) + r) / _CT_N
        bc[_CT_NA * r : _CT_NA * (r + 1)] = np.cos(theta)
        bs[_CT_NA * r : _CT_NA * (r + 1)] = np.sin(theta)

    l_r = np.repeat(np.arange(_CT_R), _CT_NA)
    l_m = np.tile(np.arange(_CT_NA), _CT_R)
    k = 8 * l_m + l_r  # (640,) bin index of each stored lane
    w = np.where((l_r == 0) | (l_r == 4), 1.0, 2.0)
    s = np.arange(_N_LAGS - 1)[None, :]  # 384 lag columns
    theta_ks = 2.0 * np.pi * k[:, None] * s / _CT_N
    ic = (
        np.concatenate(
            [w[:, None] * np.cos(theta_ks), -w[:, None] * np.sin(theta_ks)],
            axis=0,
        )
        / _CT_N
    )  # (1280, 384)
    f32 = lambda m: np.ascontiguousarray(m, np.float32)
    return f32(bc), f32(bs), f32(ic)


def _packed_dft_bases(n: int, h_pad: int, n_lags: int, rows: int):
    """(rows, 2*h_pad) forward basis + (2*h_pad, n_lags) inverse, f64->f32.

    Packed [re(h_pad) | im(h_pad)] with bins >= n//2+1 zeroed.  Matches
    ops/fft.py::_raw_corr_bases except for the alignment padding."""
    h = n // 2 + 1
    idx = np.arange(rows)[:, None]
    k = np.arange(h_pad)[None, :]
    theta = 2.0 * np.pi * idx * np.minimum(k, h - 1) / n
    valid = (k < h).astype(np.float64)
    fwd = np.concatenate(
        [np.cos(theta) * valid, -np.sin(theta) * valid], axis=1
    )  # (rows, 2*h_pad)

    ck = np.where(np.arange(h_pad) < h, 2.0, 0.0)
    ck[0] = 1.0
    if h - 1 < h_pad:
        ck[h - 1] = 1.0
    sk = np.where(np.arange(h_pad) < h, -2.0, 0.0)
    sk[0] = 0.0
    if h - 1 < h_pad:
        sk[h - 1] = 0.0
    lag = np.arange(n_lags)[None, :]
    theta_kl = 2.0 * np.pi * np.minimum(np.arange(h_pad), h - 1)[:, None] * lag / n
    inv = (
        np.concatenate(
            [ck[:, None] * np.cos(theta_kl), sk[:, None] * np.sin(theta_kl)],
            axis=0,
        )
        / n
    )  # (2*h_pad, n_lags)
    f32 = lambda m: np.ascontiguousarray(m, np.float32)
    return f32(fwd), f32(inv)


_TAIL_PAD = 512  # tail lanes after slicing (480 nonzero -> 512 aligned)


@functools.lru_cache(maxsize=1)
def _pitch_consts():
    """All constant operands, bf16 hi/lo split (0/1 matrices single-copy).

    The 385-lag correlation runs through the contiguous-block CT bases
    (see _ct_dft_bases): the x side (the 480-live-lane tail, 512 lanes)
    combines 4 blocks, the y side (864 live lanes) 7.  Versus the round-4
    dense 864/512-row bases padded to 1024 packed lanes, the CT cuts that
    stage from 360 to ~200 MXU tile-passes per block and frees ~5 MB of
    VMEM."""
    bc, bs, ic = _ct_dft_bases()
    # coarse DFTs (n = 388): y side reads 387 rows, x side 240 (padded 256)
    fr4, ic4 = _packed_dft_bases(_N_DFT4, _H4_PAD, _N_COARSE, rows=_YLEN4)
    fr4x = np.zeros((_X4_PAD, 2 * _H4_PAD), np.float32)
    fr4x[:_LEN4] = fr4[:_LEN4]

    # banded window-energy matrices (0/1: exact in bf16)
    w_e = np.zeros((_N_DS, _N_LAGS), np.float32)
    for k in range(_N_LAGS):
        w_e[k : k + PITCH_FRAME_DS, k] = 1.0
    w4 = np.zeros((_YLEN4, _N_COARSE), np.float32)
    for k in range(_N_COARSE):
        w4[k : k + _LEN4, k] = 1.0

    # decimation selectors (0/1: exact in bf16)
    d_y4 = np.zeros((_N_DS, _YLEN4), np.float32)  # y_lp4[j] = y[2j]
    d_y4[2 * np.arange(_YLEN4), np.arange(_YLEN4)] = 1.0
    d_x4 = np.zeros((_TAIL_PAD, _X4_PAD), np.float32)  # x_lp4[j] = tail[2j]
    d_x4[2 * np.arange(_LEN4), np.arange(_LEN4)] = 1.0

    return bc, bs, ic, fr4, fr4x, ic4, w_e, w4, d_y4, d_x4


@functools.lru_cache(maxsize=2)
def _pitch_operands(mxu3: bool):
    """ORDERED constant operand tuple (pallas_call inputs; Mosaic kernels
    cannot capture array constants).  ``mxu3``: bf16 hi/lo splits for the
    3-pass contraction class; False (interpret mode) keeps plain f32 so
    the CPU equivalence tests compare f32 against f32, exactly like the
    frame kernel's ``mxu3`` switch.

    NUMPY arrays only — this cache outlives jit traces, and a jnp array
    created inside a trace is a leaked tracer."""
    bc, bs, ic, fr4, fr4x, ic4, w_e, w4, d_y4, d_x4 = _pitch_consts()
    if not mxu3:
        return (bc, bs, ic, fr4, fr4x, ic4, w_e, w4, d_y4, d_x4)
    bf = lambda m: np.asarray(m).astype(_BF16)
    return (
        _split_hi_lo(bc) + _split_hi_lo(bs) + _split_hi_lo(ic)
        + _split_hi_lo(fr4) + _split_hi_lo(fr4x) + _split_hi_lo(ic4)
        + (bf(w_e), bf(w4), bf(d_y4), bf(d_x4))
    )


# radix-8 twiddle values omega^p = e^{-2 pi i p / 8}: every coefficient is
# 0, +-1 or +-sqrt(2)/2, so the block combine is a handful of VPU adds
_CT_C = float(np.sqrt(2.0) / 2.0)
_CT_WRE = (1.0, _CT_C, 0.0, -_CT_C, -1.0, -_CT_C, 0.0, _CT_C)
_CT_WIM = (0.0, -_CT_C, -1.0, -_CT_C, 0.0, _CT_C, 1.0, _CT_C)


def _radix8_combine(blocks):
    """g_r = sum_b blocks[b] * omega^{r b} for the stored phases r = 0..4.

    ``blocks``: contiguous (bk, 128) lane-slices of the zero-padded
    1024-lane input (trailing all-zero blocks simply omitted).  Returns
    five (re, im) pairs; im is None for the self-conjugate phases
    r = 0, 4 whose weights are real."""
    out = []
    for r in range(_CT_R):
        re = None
        im = None
        for b, blk in enumerate(blocks):
            p = (r * b) % 8
            wr, wi = _CT_WRE[p], _CT_WIM[p]
            if wr != 0.0:
                t = blk if wr == 1.0 else (-blk if wr == -1.0 else blk * _F32(wr))
                re = t if re is None else re + t
            if wi != 0.0:
                t = blk if wi == 1.0 else (-blk if wi == -1.0 else blk * _F32(wi))
                im = t if im is None else im + t
        out.append((re, im))
    return out


def _ct_forward(blocks, ct_split, ct_mm):
    """1024-point forward DFT of contiguous 128-lane blocks.

    Radix-8 block combine on the VPU, then one (128, 128) folded-twiddle
    basis matmul per phase on the MXU.  Returns ([re_r], [im_r]) for
    r = 0..4 in the scrambled bin order k = 8 m + r."""
    res, ims = [], []
    for r, (gre, gim) in enumerate(_radix8_combine(blocks)):
        gre_s = ct_split(gre)
        xre = ct_mm(gre_s, "bc", r)
        xim = -ct_mm(gre_s, "bs", r)
        if gim is not None:
            gim_s = ct_split(gim)
            xre = xre + ct_mm(gim_s, "bs", r)
            xim = xim + ct_mm(gim_s, "bc", r)
        res.append(xre)
        ims.append(xim)
    return res, ims


def _mm_exact01(x, w01):
    """2-pass contraction with an EXACT-bf16 (0/1-valued) matrix."""
    hi, lo = _split3(x)
    d = lambda a: jnp.dot(a, w01, preferred_element_type=_F32)
    return d(hi) + d(lo)


def _roll_right(x, j):
    """x shifted right by j lanes, zeros shifted in (static j)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lanes >= j, pltpu.roll(x, j, axis=1), _F32(0.0))


def _row_argmax(ratio):
    """(best_value, first_index) over lanes — earlier lane wins ties."""
    m = jnp.max(ratio, axis=1, keepdims=True)
    lanes = jax.lax.broadcasted_iota(jnp.int32, ratio.shape, 1)
    idx = jnp.min(
        jnp.where(ratio == m, lanes, jnp.int32(1 << 30)), axis=1, keepdims=True
    )
    return m, idx


def _find_best_pitch_block(xcorr, w):
    """ops/pitch.py::find_best_pitch on (bk, n_lags) lanes.

    Returns (best, second) (bk, 1) int32 with the reference's sentinel
    semantics for < 2 qualified lags (pitch.rs:372-405)."""
    u = jnp.maximum(_F32(1.0) + w, _F32(1.0))
    qualified = xcorr > _F32(0.0)
    ratio = jnp.where(qualified, (xcorr * xcorr) / u, _NEG)
    _, best = _row_argmax(ratio)
    lanes = jax.lax.broadcasted_iota(jnp.int32, ratio.shape, 1)
    ratio2 = jnp.where(lanes == best, _NEG, ratio)
    m2, second = _row_argmax(ratio2)
    has_second = m2 > _NEG
    any_q = jnp.max(qualified.astype(jnp.int32), axis=1, keepdims=True) > 0
    second = jnp.where(
        has_second,
        second,
        jnp.where(any_q, jnp.int32(0), jnp.int32(1)),
    )
    return best, second


def _whiten_block(x):
    """ops/pitch.py::whiten on a (bk, 864) block: order-4 Levinson + the
    6-tap zero-history FIR (pitch.rs:448-483), all lanes resident."""
    n = x.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # autocorrelation lags 0..4: masked roll + row sum
    acs = [jnp.sum(x * x, axis=1, keepdims=True)]
    for k in range(1, 5):
        # left-roll by k (roll is cyclic-right for positive shifts)
        shifted = jnp.where(lanes < n - k, pltpu.roll(x, n - k, axis=1), _F32(0.0))
        acs.append(jnp.sum(x * shifted, axis=1, keepdims=True))
    ac = acs
    ac[0] = ac[0] * _F32(1.0001)
    for i in range(1, 5):
        s = np.float32((0.008 * i) * (0.008 * i))
        ac[i] = ac[i] - ac[i] * s

    # Levinson-Durbin with the reference's early-exit freeze
    lpc = [jnp.zeros_like(ac[0])] * 4
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
            t1, t2 = new[j], new[i - 1 - j]
            new[j] = t1 + r * t2
            new[i - 1 - j] = t2 + r * t1
        lpc = [jnp.where(done, o, nw) for o, nw in zip(lpc, new)]
        error = jnp.where(done, error, error - r * r * error)
        done = jnp.logical_or(done, error < thresh)
    c = [lpc[i] * _F32(_LPC_TAPER[i]) for i in range(4)]

    # FIR taps with the 0.8 zero folded in
    k0 = _F32(1.0)
    taps = [
        c[0] + _F32(0.8),
        c[1] + _F32(0.8) * c[0],
        c[2] + _F32(0.8) * c[1],
        c[3] + _F32(0.8) * c[2],
        _F32(0.8) * c[3],
    ]
    y = k0 * x
    for j in range(1, 6):
        y = y + taps[j - 1] * _roll_right(x, j)
    return y


def _lookup_rng(table, idx, lo: int, hi: int):
    """_lookup restricted to the STATIC index range [lo, hi] — exact: a
    compare outside the proven range can never match, so slicing the
    table to the vreg-aligned columns covering the range drops only
    always-false lanes.  Indices beyond the table width still resolve to
    0, like the full-width lookup."""
    n = table.shape[1]
    lo = max(0, min(lo, n - 1))
    hi = max(lo, min(hi, n - 1))
    c0 = (lo // _CT_NA) * _CT_NA
    c1 = min(((hi // _CT_NA) + 1) * _CT_NA, n)
    lanes = (
        jax.lax.broadcasted_iota(jnp.int32, (1, c1 - c0), 1) + jnp.int32(c0)
    )
    return jnp.sum(
        jnp.where(lanes == idx, table[:, c0:c1], _F32(0.0)),
        axis=1,
        keepdims=True,
    )


def _candidate_lanes(corr, e_tab, xx, pidx):
    """ops/pitch.py::doubling_candidates on (bk, .) lanes.

    ``e_tab`` is the FORWARD 385-lag energy table; the reversed walk
    yy_lookup[t] == max(e_tab[384 - t], 0) is realized by index
    arithmetic in the lookups (no lane flip).

    Every lookup index is STATICALLY bounded: pidx ranges over
    [PITCH_MAX_PERIOD - 2(_N_FINE-1) - 1, PITCH_MAX_PERIOD + 1] (pad rows
    resolve to PITCH_MAX_PERIOD), so t0 in [90, 383], and the octave
    candidates t1(k) = (2 t0 + k) // (2k) live in ~384/k-wide windows.
    Each lookup therefore scans only the 128-lane columns covering its
    proven range (_lookup_rng) — the walk was ~17 ms of the kernel's
    ~68 ms device time at full width, dominated by always-false
    compare/reduce lanes."""
    maxp = PITCH_MAX_DS
    # pidx = PITCH_MAX_PERIOD - (2*best2 - offset), best2 in [0, 294),
    # offset in {-1,0,1} -> t0 = min(pidx//2, maxp-1) in [t0_lo, maxp-1]
    t0_lo = (PITCH_MAX_PERIOD - 2 * (_N_FINE - 1) - 1) // 2  # 90
    t0_hi = maxp - 1
    t0 = jnp.minimum(_div_const(pidx, 2), maxp - 1)

    def corr_at(t, lo, hi):
        # corr_at over candidate range [lo, hi] -> index range reversed
        return _lookup_rng(corr, maxp - t, maxp - hi, maxp - lo)

    def yy_at(t, lo, hi):
        return jnp.maximum(
            _lookup_rng(e_tab, maxp - t, maxp - hi, maxp - lo), _F32(0.0)
        )

    def pitch_gain(xy, yy):
        return xy / jnp.sqrt(_F32(1.0) + xx * yy)

    xy0 = corr_at(t0, t0_lo, t0_hi)
    yy0 = yy_at(t0, t0_lo, t0_hi)
    g0 = pitch_gain(xy0, yy0)

    t1s, xys, yys, g1s = [], [], [], []
    bounds = [(t0_lo, t0_hi)]
    for k in range(2, 16):
        t1 = _div_const(2 * t0 + k, 2 * k)
        # (2 a t0 + k) // (2k) is nondecreasing in t0 -> endpoint bounds
        lo1, hi1 = (2 * t0_lo + k) // (2 * k), (2 * t0_hi + k) // (2 * k)
        if k == 2:
            t1b = jnp.where(t1 + t0 > maxp, t0, t0 + t1)
            lob, hib = t0_lo, maxp
        else:
            sc = SECOND_CHECK[k]
            t1b = _div_const(2 * sc * t0 + k, 2 * k)
            lob = (2 * sc * t0_lo + k) // (2 * k)
            hib = (2 * sc * t0_hi + k) // (2 * k)
        xy = (corr_at(t1, lo1, hi1) + corr_at(t1b, lob, hib)) * _F32(0.5)
        yy = (yy_at(t1, lo1, hi1) + yy_at(t1b, lob, hib)) * _F32(0.5)
        t1s.append(t1)
        bounds.append((lo1, hi1))
        xys.append(xy)
        yys.append(yy)
        g1s.append(pitch_gain(xy, yy))

    cands = [t0] + t1s
    cm1 = [corr_at(t - 1, lo - 1, hi - 1) for t, (lo, hi) in zip(cands, bounds)]
    cc = [corr_at(t, lo, hi) for t, (lo, hi) in zip(cands, bounds)]
    cp1 = [corr_at(t + 1, lo + 1, hi + 1) for t, (lo, hi) in zip(cands, bounds)]
    return jnp.concatenate(
        [t0.astype(_F32), g0, xy0, yy0]
        + [t.astype(_F32) for t in t1s]
        + xys + yys + g1s + cm1 + cc + cp1,
        axis=1,
    )


def _make_pitch_kernel(mxu3: bool, skip: tuple = (), stream: bool = False):
    # ``skip`` (profiling only): stub out stages so skip-deltas attribute
    # kernel time, mirroring frame_kernel's knob.  Stages: 'whiten' (LPC +
    # FIR), 'etab' (385-lag energy table), 'corr' (the whole 385-lag CT
    # correlation), 'corrinv' (only the CT inverse matmul), 'coarse' (the
    # 4x-decimated search), 'cand' (the candidate-lane walk).  Stubbed
    # stages write zeros of the right shape; XLA/Mosaic dead-code
    # elimination then drops the stage's compute.
    #
    # ``stream``: the sliding-window variant (pitch_analysis_stream).
    # Consecutive frames' 864-lane windows overlap by 624 samples, so the
    # stacked form streams 3.5x redundant HBM traffic; here the grid is
    # (B/block, T) with T sequential and the window lives in VMEM scratch —
    # each step DMAs only the 240 NEW downsampled samples plus the 1-lane
    # boundary patch, and the window advances by an in-VMEM shift.
    def kernel(x_ref, *refs):
        # stream mode: x_ref is the (block, 864) window-0 head; two extra
        # leading inputs (the 240 new ds samples + the lane-0 patch) and a
        # trailing VMEM scratch hold the sliding window.
        if stream:
            news_ref, w0_ref = refs[0], refs[1]
            w_scr = refs[-1]
            refs = refs[2:-1]
        if mxu3:
            (
                bc_hi, bc_lo, bs_hi, bs_lo, ic_hi, ic_lo, fr4_hi,
                fr4_lo, fr4x_hi, fr4x_lo, ic4_hi, ic4_lo, w_e_ref, w4_ref,
                d_y4_ref, d_x4_ref, cand_ref, pidx_ref,
            ) = refs
            consts = {
                "ic": (ic_hi[:, :], ic_lo[:, :]),
                "fr4": (fr4_hi[:, :], fr4_lo[:, :]),
                "fr4x": (fr4x_hi[:, :], fr4x_lo[:, :]),
                "ic4": (ic4_hi[:, :], ic4_lo[:, :]),
            }
            ct = {"bc": (bc_hi[:, :], bc_lo[:, :]), "bs": (bs_hi[:, :], bs_lo[:, :])}
            mm = lambda x, k: _mm3(_split3(x), *consts[k])
            mm01 = _mm_exact01
            ct_split = _split3

            def ct_mm(g_s, which, r):
                hi, lo = ct[which]
                s = slice(_CT_NA * r, _CT_NA * (r + 1))
                return _mm3(g_s, hi[s], lo[s])

        else:
            (
                bc_ref, bs_ref, ic_ref, fr4_ref, fr4x_ref, ic4_ref,
                w_e_ref, w4_ref, d_y4_ref, d_x4_ref,
                cand_ref, pidx_ref,
            ) = refs
            consts = {
                "ic": ic_ref,
                "fr4": fr4_ref, "fr4x": fr4x_ref, "ic4": ic4_ref,
            }
            ct = {"bc": bc_ref, "bs": bs_ref}
            mm = lambda x, k: jnp.dot(
                x, consts[k][:, :], preferred_element_type=_F32
            )
            mm01 = lambda x, w: jnp.dot(x, w, preferred_element_type=_F32)
            ct_split = lambda g: g

            def ct_mm(g, which, r):
                return jnp.dot(
                    g,
                    ct[which][_CT_NA * r : _CT_NA * (r + 1), :],
                    preferred_element_type=_F32,
                )
        if stream:
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _init_window():
                w_scr[:, :] = x_ref[:, :]  # window 0 (the head slice)

            @pl.when(t != 0)
            def _advance_window():
                cur = w_scr[:, :]
                w_scr[:, :] = jnp.concatenate(
                    [cur[:, _DS_STEP:], news_ref[0, :, :]], axis=1
                )

            x = w_scr[:, :]
            # reference zero-boundary semantics: lane 0 of EACH window is
            # the window-local decimation value (chunk.py builds the same
            # patch for the stacked path); the patch is applied to the
            # local copy only — the shifted-out lane never carries it.
            l0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            x = jnp.where(l0 == 0, w0_ref[0, :, :], x)
        else:
            x = x_ref[:, :]  # (bk, 864) raw downsampled window
        y = x if "whiten" in skip else _whiten_block(x)

        # shared 385-lag forward window-energy table (0/1 matrix: exact)
        y2 = y * y
        if "etab" in skip:
            e_tab = jnp.zeros((x.shape[0], _N_LAGS), _F32)
        else:
            e_tab = mm01(y2, w_e_ref[:, :])  # (bk, 385)

        # 385-lag correlation corr[s] = dot(y[384:], y[s:s+480]) via the
        # 1024-point contiguous-block CT DFT (see _ct_dft_bases)
        lanes = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        tail = jnp.where(
            lanes < PITCH_FRAME_DS,
            pltpu.roll(y, _N_DS - PITCH_MAX_DS, axis=1),
            _F32(0.0),
        )  # y[384:864] left-aligned, zero-padded (cyclic-right roll)
        tail = tail[:, :_TAIL_PAD]  # lanes >= 480 are zero; 512-aligned
        # contiguous 128-lane CT blocks: x side 4 (480 live), y side 7
        # (864 live; block 6 = y[768:864] via roll + mask, zero above 96)
        xb = [tail[:, _CT_NA * b : _CT_NA * (b + 1)] for b in range(4)]
        yb = [y[:, _CT_NA * b : _CT_NA * (b + 1)] for b in range(6)]
        y6 = pltpu.roll(y, _N_DS - 6 * _CT_NA, axis=1)[:, :_CT_NA]
        l6 = jax.lax.broadcasted_iota(jnp.int32, y6.shape, 1)
        yb.append(jnp.where(l6 < _N_DS - 6 * _CT_NA, y6, _F32(0.0)))
        if "corr" in skip:
            corr = jnp.zeros((x.shape[0], _N_LAGS - 1), _F32)
        else:
            xres, xims = _ct_forward(xb, ct_split, ct_mm)
            yres, yims = _ct_forward(yb, ct_split, ct_mm)
            # conj(X) * Y per phase, packed [Pr(640)|Pi(640)] scrambled order
            pr = [xres[r] * yres[r] + xims[r] * yims[r] for r in range(_CT_R)]
            pi = [xres[r] * yims[r] - xims[r] * yres[r] for r in range(_CT_R)]
            prod = jnp.concatenate(pr + pi, axis=1)  # (bk, 1280)
            if "corrinv" in skip:
                corr = prod[:, : _N_LAGS - 1]
            else:
                corr = mm(prod, "ic")  # (bk, 384); lag 384 never read

        # coarse stage on 4x-decimated views (exact 0/1 selectors)
        if "coarse" in skip:
            best4 = jnp.zeros((x.shape[0], 1), jnp.int32)
            second4 = jnp.zeros((x.shape[0], 1), jnp.int32)
        else:
            y4 = mm01(y, d_y4_ref[:, :])  # (bk, 387) = y[0::2][:387]
            x4 = mm01(tail, d_x4_ref[:, :])  # (bk, 256) = y[384::2][:240]
            x4k = mm(x4, "fr4x")
            y4k = mm(y4, "fr4")
            x4r, x4i = x4k[:, :_H4_PAD], x4k[:, _H4_PAD:]
            y4r, y4i = y4k[:, :_H4_PAD], y4k[:, _H4_PAD:]
            prod4 = jnp.concatenate(
                [x4r * y4r + x4i * y4i, x4r * y4i - x4i * y4r], axis=1
            )
            xcorr4 = mm(prod4, "ic4")  # (bk, 147)
            w4 = mm01(y4 * y4, w4_ref[:, :])  # (bk, 147)
            best4, second4 = _find_best_pitch_block(xcorr4, w4)

        # fine stage: the shared correlation masked to the candidate set
        fine_lanes = jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[0], _N_FINE), 1
        )
        near = (jnp.abs(fine_lanes - 2 * best4) <= 2) | (
            jnp.abs(fine_lanes - 2 * second4) <= 2
        )
        corr_fine = corr[:, :_N_FINE]
        xcorr2 = jnp.where(
            near, jnp.maximum(corr_fine, _F32(-1.0)), _F32(0.0)
        )
        best2, _ = _find_best_pitch_block(xcorr2, e_tab[:, :_N_FINE])

        # pseudo-interpolation (interior only)
        bm1 = jnp.clip(best2 - 1, 0, _N_FINE - 1)
        bp1 = jnp.clip(best2 + 1, 0, _N_FINE - 1)
        a = _lookup(xcorr2, bm1)
        b = _lookup(xcorr2, best2)
        cv = _lookup(xcorr2, bp1)
        offset = jnp.where(
            cv - a > _F32(0.7) * (b - a),
            jnp.int32(1),
            jnp.where(a - cv > _F32(0.7) * (b - cv), jnp.int32(-1), jnp.int32(0)),
        )
        interior = (best2 > 0) & (best2 < _N_FINE - 1)
        offset = jnp.where(interior, offset, jnp.int32(0))
        search = 2 * best2 - offset
        pidx = PITCH_MAX_PERIOD - search  # (bk, 1) i32

        xx = jnp.maximum(e_tab[:, PITCH_MAX_DS:], _F32(0.0))  # (bk, 1)
        if "cand" in skip:
            cand_ref[:, :] = jnp.zeros((x.shape[0], 105), _F32) + xx
        else:
            cand_ref[:, :] = _candidate_lanes(corr, e_tab, xx, pidx)
        pidx_ref[:, :] = pidx

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "block", "skip"))
def pitch_analysis_pallas(
    x_lp_raw, interpret: bool = False, block: int = 128, skip: tuple = ()
):
    """(R, 864) raw 2x-downsampled windows -> ((R, 105) candidate lanes,
    (R,) i32 pitch_idx).

    Replaces chunk.py's whiten -> xcorr_dft -> pitch_search ->
    doubling_tables -> candidates_pallas chain with one VMEM-resident
    pass.  Rows are padded to a block multiple; pad rows compute on
    zeros and are sliced away."""
    r = x_lp_raw.shape[0]
    # bk=128 default: the DFT bases + per-block intermediates total ~13 MB
    # VMEM; 256-row blocks overflow the ~16 MB budget.
    rp = -(-r // block) * block
    if rp != r:
        x_lp_raw = jnp.pad(x_lp_raw, ((0, rp - r), (0, 0)))

    def spec(lanes):
        return pl.BlockSpec(
            (block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    mxu3 = not interpret
    operands = _pitch_operands(mxu3)
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for c in operands
    ]
    cand, pidx = pl.pallas_call(
        _make_pitch_kernel(mxu3, skip),
        grid=(rp // block,),
        in_specs=[spec(_N_DS)] + const_specs,
        out_specs=[spec(105), spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((rp, 105), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x_lp_raw, *operands)
    return cand[:r], pidx[:r, 0]


@functools.partial(
    jax.jit, static_argnames=("t_count", "interpret", "block", "skip")
)
def pitch_analysis_stream(
    ds,
    w0,
    t_count: int,
    interpret: bool = False,
    block: int = 128,
    skip: tuple = (),
):
    """Sliding-window pitch analysis over a contiguous ds signal.

    ``ds`` (B, >= 864 + 240*t_count): the 2x-downsampled HP-filtered
    signal including the 864-sample history head (chunk.py builds it);
    frame t's window is ds[:, 240(t+1) : 240(t+1) + 864].  ``w0``
    (t_count, B): the window-local lane-0 decimation patch (reference
    zero-boundary semantics, pitch.rs:455-458).  Returns ((t_count, B,
    105) candidate lanes, (t_count, B) i32 pitch_idx) — identical values
    to pitch_analysis_pallas on the stacked windows, but the kernel DMAs
    only the 240 NEW samples per frame (the stacked form re-streams the
    624 overlapped lanes of every window: 3.5x the HBM traffic, measured
    ~10 ms of the kernel's ~63 ms at B=4096/T=100), and the precompute
    never materializes the (T, B, 864) stack at all."""
    b = ds.shape[0]
    need = _N_DS + _DS_STEP * t_count
    if ds.shape[1] < need:
        raise ValueError(
            f"ds too short for {t_count} windows: need {need} samples, "
            f"have {ds.shape[1]}"
        )
    bp = -(-b // block) * block
    if bp != b:
        ds = jnp.pad(ds, ((0, bp - b), (0, 0)))
        w0 = jnp.pad(w0, ((0, 0), (0, bp - b)))
    head = ds[:, _DS_STEP : _DS_STEP + _N_DS]  # window 0
    # tails of windows 1..T-1, TIME-MAJOR: Mosaic lane blocks must be
    # 128-divisible or full-width, so the 240-wide per-frame blocks ride
    # the last axis of a (T, B, 240) view (one XLA transpose — 3.5x less
    # traffic than the stacked windows even counting it).
    news = ds[:, _N_DS : _N_DS + _DS_STEP * t_count]
    news = jnp.swapaxes(news.reshape(bp, t_count, _DS_STEP), 0, 1)
    w0t = w0[:, :, None]  # (T, B, 1)
    nb = bp // block

    mxu3 = not interpret
    operands = _pitch_operands(mxu3)
    const_specs = [
        pl.BlockSpec(c.shape, lambda i, t: (0, 0), memory_space=pltpu.VMEM)
        for c in operands
    ]
    cand, pidx = pl.pallas_call(
        _make_pitch_kernel(mxu3, skip, stream=True),
        grid=(nb, t_count),
        in_specs=[
            pl.BlockSpec(
                (block, _N_DS), lambda i, t: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block, _DS_STEP),
                lambda i, t: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block, 1), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
            ),
        ]
        + const_specs,
        out_specs=[
            pl.BlockSpec(
                (block, 105),
                lambda i, t, nb=nb: (t * nb + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block, 1),
                lambda i, t, nb=nb: (t * nb + i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_count * bp, 105), jnp.float32),
            jax.ShapeDtypeStruct((t_count * bp, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((block, _N_DS), jnp.float32)],
        interpret=interpret,
    )(head, news, w0t, *operands)
    cand = cand.reshape(t_count, bp, 105)[:, :b]
    pidx = pidx.reshape(t_count, bp)[:, :b]
    return cand, pidx
