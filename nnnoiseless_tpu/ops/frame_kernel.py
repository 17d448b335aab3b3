"""The fused frame-loop Pallas kernel: the entire scan body in VMEM.

The production engine is precompute (chunk.py, large batched ops) + a
sequential per-frame remainder.  Expressed as a ``lax.scan``, that
remainder is dominated not by compute but by XLA's per-iteration staging:
loop-invariant weights/tables and every carry round-trip HBM<->VMEM each
iteration (docs/PERFORMANCE.md).  This kernel runs the WHOLE frame loop for
a block of streams inside one ``pallas_call``:

* grid = (B/block, T) with the frame axis as the minor (sequential)
  dimension; per-frame precompute slices stream in via BlockSpec indexing
  (Pallas double-buffers them against compute automatically);
* the recurrent carries live in the final-carry OUTPUT refs, whose index
  map is constant in t — so they stay VMEM-resident across all T frames
  and are flushed to HBM once per block;
* every weight and table — both DFT bases, band/interp matrices, the DCT,
  the GRU weights, the tansig table — has a constant index map and is
  fetched once per block;
* the analysis/synthesis DFTs are dense MXU matmuls whose bases fold in
  the Vorbis window, the ``wnorm`` forward scale, the hermitian unfold and
  the /2 inverse scale (reference src/features.rs:281-298, 263-275); the
  three big bases contract as manual 3-pass bf16 (hi/lo split, _mm3 — the
  precision class the XLA path is parity-validated at; Mosaic itself only
  exposes 1-pass bf16 and 6-pass f32).  Spectra stay packed
  ``[re(481) | im(481)]`` on 962 lanes end-to-end: band
  energies/correlation use a doubled (962, 22) matrix and gain
  interpolation a doubled (22, 962) matrix, so no misaligned lane splits
  occur anywhere;
* the ENTIRE lag-0 analysis — windowed DFT, band energies, the floored
  log spectrum, cepstrum and the silence gate (features.rs:115-169) — runs
  in-kernel from the VMEM-resident input history: the only per-frame
  streams are the HP-filtered frame and the octave-removal candidate
  tables (round 3; previously the precompute streamed a (T, B, 962)
  spectrum tensor through HBM);
* remove_doubling's data-dependent table lookups are one-hot lane
  reductions, the tansig table values are recomputed as tanh of the grid
  point (see _tansig_g), and the //(2k) integer divisions use an exact
  multiply-by-reciprocal with integer fixup;
* the pitch-lag window extraction is the 10-step barrel shift of
  ops/window.py, on the VMEM-resident input history.

Semantics are identical to pipeline.frame_step_hoisted (same reference
lines); matmuls run at fp32 contract precision (Mosaic HIGHEST), tighter
than the XLA path's 3-pass bf16.  Golden/per-sample/lag-trace tests gate
parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    CEPS_MEM,
    FRAME_SIZE,
    FREQ_SIZE,
    NB_BANDS,
    NB_DELTA_CEPS,
    PITCH_BUF_SIZE,
    PITCH_MAX_DS,
    PITCH_MIN_DS,
    WINDOW_SIZE,
)
from ..tables import (
    BAND_CORR_MATRIX,
    BAND_INTERP_MATRIX,
    DCT_SCALE,
    DCT_TABLE,
    SECOND_CHECK,
    TANSIG_TABLE,
    VORBIS_WINDOW,
    WNORM,
)
from .rnn_pallas import _flatten_params, _DIMS

_F32 = jnp.float32
_BF16 = jnp.bfloat16
_BLOCK = 128
_N_ROLL_BITS = 10  # lags < 1024 (PITCH_MAX_PERIOD = 768)
_PACKED = 2 * FREQ_SIZE  # 962: [re | im]
_NCORR = PITCH_MAX_DS + 1  # 385 doubling-correlation lags
_SCALE = 0.00390625  # 1/256 (python float: trace-time constant)

# Per-frame inputs arrive as TWO streamed refs: the HP-filtered frame
# (fps, block, 480) and the octave-removal candidate tables
# (fps, block, 105; ops/pitch.py::doubling_candidates layout — the ~50
# data-dependent lookups are a parallel Pallas kernel in the chunk phase,
# candidates_pallas).  Everything else the frame needs — the lag-0
# spectrum, band energies, log/cepstral features, the silence gate — is
# computed IN-KERNEL from the input-history carry (round 3: this deleted
# the precompute's largest matmul and its (T, B, 962) HBM spectrum
# stream, reference features.rs:115-169).
_CAND_LANES = 105
# Packed output block: denoised frame + vad + pitch trace on one stream
# (the trace lanes are free — the block is 512 lanes either way — and give
# the TPU test lane a per-frame lag trace from the production kernel).
_OFF_VAD = 480
_OFF_PERIOD = 481
_OFF_PGAIN = 482
_OUT_LANES = 512


# ---------------------------------------------------------------------------
# trace-time constants (f64 precompute, f32 cast — tables.py convention)
# ---------------------------------------------------------------------------


from .fft import dense_dft_bases as _dft_consts  # F, IV1, IV2 (shared)


@functools.lru_cache(maxsize=1)
def _band_consts():
    corr2 = np.concatenate([BAND_CORR_MATRIX.T, BAND_CORR_MATRIX.T], axis=0)
    interp2 = np.concatenate(
        [BAND_INTERP_MATRIX.T, BAND_INTERP_MATRIX.T], axis=1
    )
    f32 = lambda m: np.ascontiguousarray(m, np.float32)
    return f32(corr2), f32(interp2), np.ascontiguousarray(DCT_TABLE, np.float32)


def _split_hi_lo(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """f32 matrix -> (hi, lo) bf16 pair with hi + lo ~= m (manual 3-pass
    bf16 decomposition of the DFT bases, see _mm3)."""
    m32 = np.ascontiguousarray(m, np.float32)
    hi = m32.astype(jnp.bfloat16)
    lo = (m32 - hi.astype(np.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=1)
def _dft_consts_split():
    fwd, iv1, iv2 = _dft_consts()
    return tuple(_split_hi_lo(m) for m in (fwd, iv1, iv2))


def _split3(x):
    """f32 (bk, n) -> (hi, lo) bf16 operand decomposition."""
    hi = x.astype(_BF16)
    lo = (x - hi.astype(_F32)).astype(_BF16)
    return hi, lo


def _mm3(x_hl, w_hi, w_lo):
    """3-pass bf16 contraction ~= Precision.HIGH, the precision class the
    XLA path's DFT/correlation matmuls are parity-validated at
    (ops/fft.py).  Mosaic exposes only DEFAULT (1-pass bf16, too lossy)
    and HIGHEST (6-pass f32); the manual hi/lo split recovers the 3-pass
    point, halving MXU passes on the kernel's three big DFT bases."""
    x_hi, x_lo = x_hl
    d = lambda a, b: jnp.dot(a, b[:, :], preferred_element_type=_F32)
    return d(x_hi, w_hi) + (d(x_lo, w_hi) + d(x_hi, w_lo))


def _div_const(v, d: int):
    """Exact v // d for int32 v in [0, ~2^23), static d, without integer
    division (multiply by f32 reciprocal + integer fixup)."""
    q = jnp.floor(v.astype(_F32) * np.float32(1.0 / d)).astype(jnp.int32)
    q = q - (q * d > v).astype(jnp.int32)
    q = q + ((q + 1) * d <= v).astype(jnp.int32)
    return q


def _lookup(table, idx):
    """Per-row dynamic gather table[row, idx[row]] as a one-hot reduce.

    table (bk, L), idx (bk, 1) int32 -> (bk, 1).  (Mosaic's hardware
    ``tpu.dynamic_gather`` crashes this backend's compile helper, so the
    compare-select-reduce stays.)"""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, table.shape[1]), 1)
    return jnp.sum(
        jnp.where(lanes == idx, table, _F32(0.0)), axis=1, keepdims=True
    )


def _tansig_g(x, tab2d):
    """tansig_approx on (bk, n) — ops/activations.py semantics (same index
    grid, cubic correction, clamps, NaN -> 1).

    The table entry is recomputed as tanh(0.04 i) on the VPU instead of
    gathered: a per-element 201-way lookup costs ~200 loop iterations
    (fori) or a (bk, n, 201) one-hot — both measured dominant.  The
    recomputation deviates from the stored table by up to 3.4e-5 ABSOLUTE
    measured on TPU (tests/test_precision_tpu.py::
    test_kernel_tansig_table_delta): the backend's reduced-precision tanh
    approximation dominates; the table's 6-decimal rounding
    (tables.py::_build_tansig_table) contributes only ~5e-7.  The
    deviation is invisible end-to-end (hardware golden 4.9e-08 rel, ≤1
    i16 unit per sample); the cubic *approximation*, which parity does
    require, is unchanged.  ``tab2d`` is kept for signature parity.
    """
    del tab2d
    sign = jnp.where(x < 0.0, _F32(-1.0), _F32(1.0))
    ax = jnp.minimum(jnp.abs(jnp.where(jnp.isnan(x), _F32(0.0), x)), _F32(7.99))
    i = jnp.floor(_F32(0.5) + _F32(25.0) * ax).astype(jnp.int32)
    frac = ax - _F32(0.04) * i.astype(_F32)
    y = jnp.tanh(_F32(0.04) * i.astype(_F32))  # == tab[i] +- 1 ulp
    dy = _F32(1.0) - y * y
    y = y + frac * dy * (_F32(1.0) - y * frac)
    out = sign * y
    out = jnp.where(x > _F32(-8.0), out, _F32(-1.0))
    return jnp.where(x < _F32(8.0), out, _F32(1.0))


def _sigmoid_g(x, tab2d):
    return _F32(0.5) + _F32(0.5) * _tansig_g(_F32(0.5) * x, tab2d)


def _act_g(x, activation, tab2d):
    if activation == 0:
        return _tansig_g(x, tab2d)
    if activation == 1:
        return _sigmoid_g(x, tab2d)
    return jnp.maximum(x, _F32(0.0))


def _mm(x, w):
    # Mosaic supports only DEFAULT (single-pass bf16 — ~2^-8, far too
    # lossy for the per-sample parity bar) and HIGHEST (fp32 contract).
    return jnp.dot(
        x, w, preferred_element_type=_F32, precision=jax.lax.Precision.HIGHEST
    )


def _mm2(x, wb):
    """2-pass bf16 contraction with EXACT bf16 weights: every model weight
    is an int8 value (rnn.rs:21 WEIGHTS_SCALE), and integers up to 256 are
    exactly representable in bf16's 8-bit significand, so only the
    activation operand needs a hi/lo split.  Error ~2^-16 relative (the
    3-pass class the DFT bases are parity-validated at) for 1/3 the MXU
    passes of HIGHEST."""
    x_hi = x.astype(_BF16)
    x_lo = (x - x_hi.astype(_F32)).astype(_BF16)
    return jnp.dot(x_hi, wb, preferred_element_type=_F32) + jnp.dot(
        x_lo, wb, preferred_element_type=_F32
    )


def _gru_g(h, x, wi, wr, b, n, activation, tab2d, mm=_mm):
    gi = mm(x, wi)
    rzr = mm(h, wr[:, : 2 * n])
    z = _sigmoid_g(_SCALE * (b[0, :n] + gi[:, :n] + rzr[:, :n]), tab2d)
    r = h * _sigmoid_g(
        _SCALE * (b[0, n : 2 * n] + gi[:, n : 2 * n] + rzr[:, n:]), tab2d
    )
    hh = _act_g(
        _SCALE * (b[0, 2 * n :] + gi[:, 2 * n :] + mm(r, wr[:, 2 * n :])),
        activation,
        tab2d,
    )
    return z * h + (_F32(1.0) - z) * hh


def _remove_doubling_block(cand, last_period, last_gain):
    """remove_doubling_from_candidates (ops/pitch.py) on a (bk, .) block.

    cand (bk, 105) precomputed candidate lanes, last_period (bk, 1) i32,
    last_gain (bk, 1).  Returns (period (bk,1) i32, gain (bk,1) f32).

    The k = 2..15 scan is evaluated for ALL 14 submultiples at once on the
    packed candidate lanes — (bk, 14) arithmetic instead of ~200 (bk, 1)
    column ops (a (bk, 1) op uses 1/128th of the VPU lanes; this stage was
    the hottest in the round-3 kernel at 81 ms/chunk).  The sequential
    "overwrite if better" chain selects the LARGEST winning k, and the
    early-break (`t1 < minp` stops the scan) masks every later lane via a
    prefix-OR, so the lane-parallel form is decision-exact
    (pitch.rs:118-221)."""
    minp = _F32(PITCH_MIN_DS)
    lane = lambda i: cand[:, i : i + 1]
    t0, g0, xy0, yy0 = lane(0), lane(1), lane(2), lane(3)
    prev_period = jnp.floor(last_period.astype(_F32) * _F32(0.5))

    t1 = cand[:, 4:18]  # (bk, 14), k = 2..15
    xy = cand[:, 18:32]
    yy = cand[:, 32:46]
    g1 = cand[:, 46:60]
    # Mosaic only supports integer iota; cast to f32 after
    kf = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 14), 1) + 2
    ).astype(_F32)  # (1, 14): k = 2..15

    # stop chain: lane k is active iff no lane k' <= k has t1 < minp
    # (the sequential loop breaks the scan at the first too-small t1);
    # inclusive prefix-OR via log-step shifted maxes over the 14 lanes
    pref = (t1 < minp).astype(_F32)
    for sh in (1, 2, 4, 8):
        pref = jnp.maximum(pref, jnp.pad(pref, ((0, 0), (sh, 0)))[:, :-sh])
    active = pref == _F32(0.0)

    adiff = jnp.abs(t1 - prev_period)
    cont = jnp.where(
        adiff <= 1,
        last_gain,
        jnp.where(
            (adiff <= 2) & (_F32(5.0) * kf * kf < t0),
            last_gain * _F32(0.5),
            _F32(0.0),
        ),
    )
    thresh = jnp.where(
        t1 < 3 * minp,
        jnp.maximum(_F32(0.85) * g0 - cont, _F32(0.4)),
        jnp.where(
            t1 < 2 * minp,
            jnp.maximum(_F32(0.9) * g0 - cont, _F32(0.5)),
            jnp.maximum(_F32(0.7) * g0 - cont, _F32(0.3)),
        ),
    )
    upd = active & (g1 > thresh)
    # the sequential chain keeps the LAST (largest-k) winner
    win = jnp.max(jnp.where(upd, kf - _F32(1.0), _F32(0.0)), axis=1, keepdims=True)
    sel14 = (kf - _F32(1.0) == win) & upd
    pick14 = lambda v, dflt: jnp.sum(
        jnp.where(sel14, v, _F32(0.0)), axis=1, keepdims=True
    ) + jnp.where(jnp.any(sel14, axis=1, keepdims=True), _F32(0.0), dflt)
    best_xy = pick14(xy, xy0)
    best_yy = pick14(yy, yy0)
    t = pick14(t1, t0)
    g = pick14(g1, g0)
    bidx = win

    best_xy = jnp.maximum(best_xy, _F32(0.0))
    pg = jnp.where(
        best_yy <= best_xy, _F32(1.0), best_xy / (best_yy + _F32(1.0))
    )
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, 15), 1) == bidx.astype(
        jnp.int32
    )
    pick = lambda off: jnp.sum(
        jnp.where(sel, cand[:, off : off + 15], _F32(0.0)),
        axis=1, keepdims=True,
    )
    c0 = pick(60)
    c1 = pick(75)
    c2 = pick(90)
    offset = jnp.where(
        c2 - c0 > _F32(0.7) * (c1 - c0),
        _F32(1.0),
        jnp.where(c0 - c2 > _F32(0.7) * (c1 - c2), _F32(-1.0), _F32(0.0)),
    )
    pg = jnp.minimum(pg, g)
    period = jnp.maximum(2 * t + offset, _F32(60)).astype(jnp.int32)
    return period, pg


def _make_cand_kernel():
    """Candidate-table builder (ops/pitch.py::doubling_candidates layout).

    A *parallel* Pallas kernel — grid over row blocks, no sequential axis,
    no carries — whose one-hot lane reductions are the TPU-native gather:
    XLA lowers the same ~100 per-row dynamic lookups as serial gathers
    (measured +550 ms on the batched precompute), while here they are
    fully pipelined VPU compare-select-reduces (~6 ms).
    """
    maxp = PITCH_MAX_DS

    def kernel(corr_ref, yy_ref, xx_ref, pidx_ref, out_ref):
        corr = corr_ref[:, :]  # (bk, 385)
        yy_tab = yy_ref[:, :]  # (bk, 385)
        xx = xx_ref[:, :]  # (bk, 1)
        pidx = pidx_ref[:, :]  # (bk, 1) i32
        t0 = jnp.minimum(_div_const(pidx, 2), maxp - 1)

        def corr_at(t):
            return _lookup(corr, maxp - t)

        def pitch_gain(xy, yy):
            return xy / jnp.sqrt(_F32(1.0) + xx * yy)

        xy0 = corr_at(t0)
        yy0 = _lookup(yy_tab, t0)
        g0 = pitch_gain(xy0, yy0)

        t1s, xys, yys, g1s = [], [], [], []
        for k in range(2, 16):
            t1 = _div_const(2 * t0 + k, 2 * k)
            if k == 2:
                t1b = jnp.where(t1 + t0 > maxp, t0, t0 + t1)
            else:
                t1b = _div_const(2 * SECOND_CHECK[k] * t0 + k, 2 * k)
            xy = (corr_at(t1) + corr_at(t1b)) * _F32(0.5)
            yy = (_lookup(yy_tab, t1) + _lookup(yy_tab, t1b)) * _F32(0.5)
            t1s.append(t1)
            xys.append(xy)
            yys.append(yy)
            g1s.append(pitch_gain(xy, yy))

        cands = [t0] + t1s
        cm1 = [corr_at(t - 1) for t in cands]
        cc = [corr_at(t) for t in cands]
        cp1 = [corr_at(t + 1) for t in cands]

        out_ref[:, :] = jnp.concatenate(
            [t0.astype(_F32), g0, xy0, yy0]
            + [t.astype(_F32) for t in t1s]
            + xys + yys + g1s + cm1 + cc + cp1,
            axis=1,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def candidates_pallas(corr, yy, xx, pidx, interpret: bool = False):
    """(R, 385) corr / yy, (R,) xx, (R,) i32 pidx -> (R, 105) candidates.

    Row counts are padded up to a block multiple (small batches / odd
    chunk sizes); pad rows compute on zeros and are sliced away.
    """
    r = corr.shape[0]
    block = 256 if r % 256 == 0 else 128
    rp = -(-r // block) * block
    if rp != r:
        pad = lambda a: jnp.pad(a, ((0, rp - r),) + ((0, 0),) * (a.ndim - 1))
        corr, yy, xx, pidx = pad(corr), pad(yy), pad(xx), pad(pidx)

    def spec(lanes):
        return pl.BlockSpec(
            (block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        _make_cand_kernel(),
        grid=(rp // block,),
        in_specs=[spec(_NCORR), spec(_NCORR), spec(1), spec(1)],
        out_specs=spec(105),
        out_shape=jax.ShapeDtypeStruct((rp, 105), jnp.float32),
        interpret=interpret,
    )(corr, yy, xx.reshape(rp, 1), pidx.reshape(rp, 1).astype(jnp.int32))
    return out[:r]


def _make_frame_kernel(acts: tuple, skip: tuple = (), fps: int = 1,
                       mxu3: bool = True):
    # ``skip`` (profiling only): stub out stages to attribute kernel time —
    # 'rd' octave removal, 'lag0' the in-kernel lag-0 DFT/feature block,
    # 'dft' lagged window+forward DFT, 'rnn', 'feat' feature assembly,
    # 'comb' comb/gain stage, 'inv' inverse DFT+OLA.
    # ``fps``: frames per grid step — the sequential per-frame logic is
    # unrolled fps times inside one kernel invocation, dividing the
    # per-step pipeline overhead (the dominant cost at fps=1).
    # ``mxu3``: contract the three big DFT bases as manual 3-pass bf16
    # (_mm3) instead of 6-pass HIGHEST; disabled in interpret mode so the
    # CPU equivalence tests compare f32 against f32.
    a_id, a_vad, a_noise, a_den, a_do, a_vo = acts
    d_f, d_d, d_v, d_n, d_h = (
        _DIMS["f"], _DIMS["d"], _DIMS["v"], _DIMS["n"], _DIMS["h"],
    )
    nb = NB_BANDS
    dly = NB_DELTA_CEPS

    def kernel(*refs):
        it = iter(refs)
        tab_ref = next(it)
        if mxu3:
            F_hi, F_lo, IV1_hi, IV1_lo, IV2_hi, IV2_lo = (
                next(it) for _ in range(6)
            )
            mm_F = lambda xhl: _mm3(xhl, F_hi, F_lo)
            mm_IV1 = lambda xhl: _mm3(xhl, IV1_hi, IV1_lo)
            mm_IV2 = lambda xhl: _mm3(xhl, IV2_hi, IV2_lo)
            prep = _split3
        else:
            F_ref, IV1_ref, IV2_ref = (next(it) for _ in range(3))
            mm_F = lambda x: _mm(x, F_ref[:, :])
            mm_IV1 = lambda x: _mm(x, IV1_ref[:, :])
            mm_IV2 = lambda x: _mm(x, IV2_ref[:, :])
            prep = lambda x: x
        CORR2_ref, INTERP2_ref, DCT_ref = (next(it) for _ in range(3))
        (
            id_w, id_b, vw_i, vw_r, vw_b, nw_i, nw_r, nw_b,
            dw_i, dw_r, dw_b, do_w, do_b, vo_w, vo_b,
        ) = (next(it) for _ in range(15))
        # int8-valued weight matrices are exact in bf16 (see _mm2);
        # converted ONCE per grid step, outside the frame loop.  In
        # interpret mode (CPU equivalence tests) everything stays f32.
        w8 = (lambda r: r[:, :].astype(_BF16)) if mxu3 else (lambda r: r[:, :])
        mmw = _mm2 if mxu3 else _mm
        W_id, W_vi, W_vr, W_ni, W_nr, W_di, W_dr, W_do, W_vo = (
            w8(id_w), w8(vw_i), w8(vw_r), w8(nw_i), w8(nw_r),
            w8(dw_i), w8(dw_r), w8(do_w), w8(vo_w),
        )
        # (176, 8) block-sum indicator for the cepstral-distance feature:
        # seg8[l, i] = 1 iff lane l belongs to history row i
        seg8 = (
            jax.lax.broadcasted_iota(jnp.int32, (CEPS_MEM * nb, CEPS_MEM), 0)
            // nb
            == jax.lax.broadcasted_iota(
                jnp.int32, (CEPS_MEM * nb, CEPS_MEM), 1
            )
        ).astype(_F32)
        (mem0, synth0, cmem0, hv0, hn0, hd0, lastg0, per0, pgain0) = (
            next(it) for _ in range(9)
        )
        filt_ref, cand_ref = next(it), next(it)
        out_ref = next(it)
        (memF, synthF, cmemF, hvF, hnF, hdF, lastgF, perF, pgainF) = (
            next(it) for _ in range(9)
        )

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            memF[:, :] = mem0[:, :]
            synthF[:, :] = synth0[:, :]
            cmemF[:, :] = cmem0[:, :]
            hvF[:, :] = hv0[:, :]
            hnF[:, :] = hn0[:, :]
            hdF[:, :] = hd0[:, :]
            lastgF[:, :] = lastg0[:, :]
            perF[:, :] = per0[:, :]
            pgainF[:, :] = pgain0[:, :]

        def bands(v):  # packed (.., 962) -> (.., 22)
            return _mm(v, CORR2_ref[:, :])

        def dct(v):  # (.., 22) -> (.., 22)
            return _mm(v, DCT_ref[:, :]) * np.float32(DCT_SCALE)

        # ---- batched lag-0 analysis for ALL fps frames of this grid step
        #      (features.rs:119-125, 147-169).  The lag-0 block — windowed
        #      DFT -> band energies -> floored log spectrum -> cepstrum ->
        #      silence gate — has NO feedback from the sequential carries:
        #      the input history at frame fi is a pure function of the
        #      step-initial history and the streamed frames.  So it runs
        #      ONCE per grid step on (fps*bk) stacked rows: one fps-times
        #      larger MXU product, and a single pass through the 22-step
        #      floor/follow chain (serialization-bound (bk, 1) column work)
        #      instead of fps passes.  Bit-identical per row to the
        #      per-frame form — same ops, bigger batch.
        bk = filt_ref.shape[1]
        if 'lag0' not in skip:
            ext = jnp.concatenate(
                [memF[:, :]] + [filt_ref[fi, :, :] for fi in range(fps)],
                axis=1,
            )  # (bk, 1728 + fps*480)
            # Per-frame windows have lane offsets 96/64/32/0/... (start =
            # 768 + 480*fi mod 128); Mosaic cannot concatenate vectors with
            # mismatched vpad layouts along dim 0 (verified on v5e: "
            # tpu.concatenate" with in_layout {0,96}/{0,64}/... fails to
            # lower).  So run the forward DFT per frame — identical MXU
            # pass count, fps dots of (bk, 960) instead of one of
            # (fps*bk, 960) — and concatenate the OUTPUTS, which are all
            # canonical-layout matmul results.
            x_all = jnp.concatenate(
                [
                    mm_F(prep(ext[
                        :,
                        PITCH_BUF_SIZE - WINDOW_SIZE + (fi + 1) * FRAME_SIZE
                        : PITCH_BUF_SIZE + (fi + 1) * FRAME_SIZE,
                    ]))
                    for fi in range(fps)
                ],
                axis=0,
            )  # (fps*bk, 962)
            ex_all = bands(x_all * x_all)
            raw = jnp.log10(_F32(1e-2) + ex_all)
            log_max = jnp.full_like(raw[:, :1], _F32(-2.0))
            follow = jnp.full_like(raw[:, :1], _F32(-2.0))
            cols = []
            for i in range(nb):
                v = jnp.maximum(
                    jnp.maximum(raw[:, i : i + 1], log_max - _F32(7.0)),
                    follow - _F32(1.5),
                )
                log_max = jnp.maximum(log_max, v)
                follow = jnp.maximum(follow - _F32(1.5), v)
                cols.append(v)
            ly_all = jnp.concatenate(cols, axis=1)
            sil_all = jnp.sum(ex_all, axis=1, keepdims=True) < _F32(0.04)
            lanes22 = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
            ceps_off = jnp.where(
                lanes22 == 0,
                _F32(-12.0),
                jnp.where(lanes22 == 1, _F32(-4.0), _F32(0.0)),
            )
            ceps_all = dct(ly_all) + ceps_off

        def one_frame(fi):
            filt = filt_ref[fi, :, :]  # (bk, 480)
            cand = cand_ref[fi, :, :]  # (bk, 105)
            self_frame(filt, cand, fi)

        def self_frame(filt, cand, fi):
            # ---- input history shift (features.rs:97-104) ----------------
            mem = jnp.concatenate([memF[:, FRAME_SIZE:], filt], axis=1)
            memF[:, :] = mem

            # ---- lag-0 analysis: this frame's slice of the batched
            #      per-step block above ------------------------------------
            if 'lag0' in skip:
                x = jnp.concatenate([filt, filt, filt[:, :2]], axis=1)
                ex = bands(x * x)
                ceps = ex
                sil = ex[:, :1] < _F32(0.0)
            else:
                x = x_all[fi * bk : (fi + 1) * bk]
                ex = ex_all[fi * bk : (fi + 1) * bk]
                sil = sil_all[fi * bk : (fi + 1) * bk]
                ceps = ceps_all[fi * bk : (fi + 1) * bk]

            # ---- octave removal (carry-coupled half, pitch.rs:118-221) -------
            if 'rd' in skip:
                period = jnp.maximum(
                    cand[:, 0:1].astype(jnp.int32) * 2, 60
                )
                pgain = cand[:, 1:2] * _F32(0.0)
            else:
                period, pgain = _remove_doubling_block(
                    cand, perF[:, :], pgainF[:, :]
                )
            perF[:, :] = period
            pgainF[:, :] = pgain
            out_ref[fi, :, _OFF_PERIOD : _OFF_PERIOD + 1] = period.astype(_F32)
            out_ref[fi, :, _OFF_PGAIN : _OFF_PGAIN + 1] = pgain

            # ---- pitch-lag window (barrel shift) + forward DFT ---------------
            if 'dft' in skip:
                p = x
            else:
                w = mem
                for b in range(_N_ROLL_BITS):
                    rolled = pltpu.roll(w, 1 << b, axis=1)
                    w = jnp.where(((period >> b) & 1) == 1, rolled, w)
                w960 = w[:, PITCH_BUF_SIZE - WINDOW_SIZE :]
                p = mm_F(prep(w960))  # (bk, 962)

            def interp(v):  # (bk, 22) -> packed-broadcast (bk, 962)
                return _mm(v, INTERP2_ref[:, :])

            ep = bands(p * p)
            exp = bands(x * p) / jnp.sqrt(_F32(0.001) + ex * ep)

            # ---- features (features.rs:139-216) ------------------------------
            tmp = dct(exp)
            f_pitch = jnp.concatenate(
                [
                    tmp[:, 0:1] + _F32(-1.3),
                    tmp[:, 1:2] + _F32(-0.9),
                    tmp[:, 2:dly],
                ],
                axis=1,
            )
            f_period = _F32(0.01) * (period.astype(_F32) - _F32(300.0))

            cm = cmemF[:, :]  # (bk, 176) rows newest-first
            new_cm = jnp.concatenate([ceps, cm[:, : (CEPS_MEM - 1) * nb]], axis=1)
            c0 = ceps[:, :dly]
            c1 = new_cm[:, nb : nb + dly]
            c2 = new_cm[:, 2 * nb : 2 * nb + dly]
            f_sum = c0 + c1 + c2
            f_d1 = c0 - c2
            f_d2 = c0 - _F32(2.0) * c1 + c2

            if 'feat' in skip:
                f_spec = None
            else:
                # spectral-variability feature (features.rs:204-214): per
                # cepstral-history row, min distance to any other row,
                # averaged over rows.  Lane-parallel: for each cyclic
                # offset dd, roll the packed (bk, 176) history by dd rows
                # and block-sum the squared difference with ONE (176, 8)
                # indicator matmul — all 8 (i, i-dd) pair distances at
                # once.  (The 8x8 python loop was 56 (bk, 1) column ops —
                # the second-hottest stage of the round-3 kernel, ~44 ms.)
                md = None
                for dd in range(1, CEPS_MEM):
                    nr = pltpu.roll(new_cm, dd * nb, axis=1)
                    d2 = new_cm - nr
                    dist = _mm(d2 * d2, seg8)  # (bk, 8)
                    md = dist if md is None else jnp.minimum(md, dist)
                f_spec = (
                    jnp.sum(md, axis=1, keepdims=True) / _F32(CEPS_MEM)
                    - _F32(2.1)
                )

            if 'feat' in skip:
                features = jnp.concatenate([ceps, ceps[:, :20]], axis=1)
            else:
                features = jnp.concatenate(
                    [f_sum, ceps[:, dly:nb], f_d1, f_d2, f_pitch, f_period, f_spec],
                    axis=1,
                )  # (bk, 42)
                features = jnp.where(sil, _F32(0.0), features)
            cmemF[:, :] = jnp.where(sil, cm, new_cm)

            # ---- RNN (rnn.rs:343-379; recomputed-table activations) ----------
            if 'rnn' in skip:
                gains = jnp.abs(features[:, :22]) * _F32(0.01)
                vad = features[:, :1]
                hv2, hn2, hd2 = hvF[:, :], hnF[:, :], hdF[:, :]
                hv, hn, hd = hv2, hn2, hd2
            f = features
            tab2d = tab_ref[:, :]  # (1, 256) padded tansig table
            if 'rnn' not in skip:
                hv, hn, hd = hvF[:, :], hnF[:, :], hdF[:, :]
            if 'rnn' not in skip:
                d = _act_g(_SCALE * (id_b[0, :] + mmw(f, W_id)), a_id, tab2d)
                hv2 = _gru_g(hv, d, W_vi, W_vr, vw_b, d_v, a_vad, tab2d, mmw)
                vad = _act_g(
                    _SCALE * (vo_b[0, :] + mmw(hv2, W_vo)), a_vo, tab2d
                )
                noise_in = jnp.concatenate([d, hv2, f], axis=-1)
                hn2 = _gru_g(hn, noise_in, W_ni, W_nr, nw_b, d_n, a_noise, tab2d, mmw)
                den_in = jnp.concatenate([hv2, hn2, f], axis=-1)
                hd2 = _gru_g(hd, den_in, W_di, W_dr, dw_b, d_h, a_den, tab2d, mmw)
                gains = _act_g(
                    _SCALE * (do_b[0, :] + mmw(hd2, W_do)), a_do, tab2d
                )
            hvF[:, :] = jnp.where(sil, hv, hv2)
            hnF[:, :] = jnp.where(sil, hn, hn2)
            hdF[:, :] = jnp.where(sil, hd, hd2)
            out_ref[fi, :, _OFF_VAD : _OFF_VAD + 1] = jnp.where(
                sil, _F32(0.0), vad
            )

            # ---- comb filter + hangover + gain (features.rs:223-257,
            #      denoise.rs:102-112) -----------------------------------------
            if 'comb' in skip:
                x_comb = x
                gains = gains * _F32(1.0)
            g_sq = gains * gains
            exp_sq = exp * exp
            r = jnp.where(
                exp > gains,
                _F32(1.0),
                exp_sq * (_F32(1.0) - g_sq)
                / (_F32(0.001) + g_sq * (_F32(1.0) - exp_sq)),
            )
            if 'comb' not in skip:
                r = jnp.sqrt(jnp.clip(r, _F32(0.0), _F32(1.0)))
                r = r * jnp.sqrt(ex / (_F32(1e-8) + ep))
                x1 = x + p * interp(r)
                new_e = bands(x1 * x1)
                x_comb = x1 * interp(jnp.sqrt(ex / (_F32(1e-8) + new_e)))

            lastg = lastgF[:, :]
            g2 = jnp.maximum(gains, _F32(0.6) * lastg)
            x_gained = x_comb * interp(g2)
            x_final = jnp.where(sil, x, x_gained)
            lastgF[:, :] = jnp.where(sil, lastg, g2)

            # ---- synthesis: inverse DFT + overlap-add (features.rs:263-275) --
            if 'inv' in skip:
                out_ref[fi, :, :FRAME_SIZE] = x_final[:, :FRAME_SIZE] + synthF[:, :]
            else:
                xf = prep(x_final)
                head = mm_IV1(xf)  # (bk, 480)
                tail = mm_IV2(xf)  # (bk, 480)
                out_ref[fi, :, :FRAME_SIZE] = head + synthF[:, :]
                synthF[:, :] = tail

        for fi in range(fps):
            one_frame(fi)


    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("acts", "block", "interpret", "skip", "fps", "mxu3"),
)
def frame_loop_pallas(
    weights: tuple,
    carry_arrays: tuple,
    filt: jnp.ndarray,
    cand: jnp.ndarray,
    acts: tuple,
    block: int = _BLOCK,
    interpret: bool = False,
    skip: tuple = (),
    fps: int = 1,
    mxu3: bool = True,
):
    """Run the full frame loop. See _scan_batch for the dispatch wrapper.

    carry_arrays: (mem (B,1728), synth (B,480), cmem (B,176), hv, hn, hd,
                   lastg (B,22), period (B,1) i32, pgain (B,1))
    filt/cand: TIME-MAJOR (T, B, 480/105) per-frame precompute streams —
               the HP-filtered frames and the octave-removal candidate
               tables; everything else is derived in-kernel.
    Returns (packed_out (T, B, _OUT_LANES): frame + vad, new_carry_arrays).
    """
    t, b, _ = filt.shape
    assert b % block == 0, (b, block)
    assert t % fps == 0, (t, fps)
    grid = (b // block, t // fps)

    corr2, interp2, dctm = _band_consts()
    tab_np = np.zeros((1, 256), np.float32)
    tab_np[0, : TANSIG_TABLE.shape[0]] = TANSIG_TABLE
    tab = jnp.asarray(tab_np)

    if mxu3:
        (f_hi, f_lo), (iv1_hi, iv1_lo), (iv2_hi, iv2_lo) = _dft_consts_split()
        dft_in = (f_hi, f_lo, iv1_hi, iv1_lo, iv2_hi, iv2_lo)
    else:
        dft_in = _dft_consts()
    const_in = tuple(jnp.asarray(m) for m in dft_in) + (
        jnp.asarray(corr2), jnp.asarray(interp2), jnp.asarray(dctm),
    )

    def cspec(arr):  # whole-array const, never re-fetched
        shape = arr.shape
        return pl.BlockSpec(
            shape, lambda i, tt: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def carry_spec(arr):  # (B, k) -> (block, k) at row-block i
        return pl.BlockSpec(
            (block, arr.shape[1]), lambda i, tt: (i, 0), memory_space=pltpu.VMEM
        )

    def xs_spec(arr):  # (T, B, k) -> (fps, block, k) at (t, i)
        return pl.BlockSpec(
            (fps, block, arr.shape[2]),
            lambda i, tt: (tt, i, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [cspec(tab)]
        + [cspec(a) for a in const_in]
        + [cspec(w) for w in weights]
        + [carry_spec(a) for a in carry_arrays]
        + [xs_spec(filt), xs_spec(cand)]
    )
    out_shape = (
        jax.ShapeDtypeStruct((t, b, _OUT_LANES), jnp.float32),  # frame+vad
    ) + tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in carry_arrays)
    out_specs = (xs_spec(out_shape[0]),) + tuple(
        carry_spec(a) for a in carry_arrays
    )

    outs = pl.pallas_call(
        _make_frame_kernel(acts, skip, fps, mxu3),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # ~19 MB live per program (DFT bases + carries + streamed frame
        # slices + temporaries) — above the 16 MB default scoped limit but
        # far under the chip's physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tab, *const_in, *weights, *carry_arrays, filt, cand)
    return outs[0], outs[1:]


def fused_scan_available(meta, batch: int, block: int = _BLOCK) -> bool:
    """The fused kernel serves EVERY batch size (the stream axis is padded
    to a block multiple with zeroed silent streams, run_fused_scan); only a
    non-standard model topology falls back to the XLA scan path."""
    from .rnn_pallas import standard_topology

    del batch, block
    return standard_topology(meta)


def _pad_batch(arr, bp: int, axis: int):
    b = arr.shape[axis]
    if b == bp:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, bp - b)
    return jnp.pad(arr, widths)


def run_fused_scan(params, meta, carry, pre, interpret: bool = False,
                   block: int | None = None, skip: tuple = (),
                   fps: int | None = None, return_trace: bool = False):
    """Adapter: DenoiseCarry + FramePre (B, T, ...) -> same pytree outputs
    as the lax.scan path (carry', out (B,T,480), vad (B,T)); with
    ``return_trace`` a 4th element (periods (B,T) i32, gains (B,T)) — the
    kernel's per-frame pitch decisions, used by the TPU flip-count lane.

    Batches that are not a multiple of ``block`` are padded with zeroed
    streams (a zero carry + zero frames is a valid silent stream — the
    reference's own initial state); the pad rows are sliced away from every
    output, so the production kernel serves ALL batch sizes (the reference
    has one engine for every caller, src/denoise.rs:95).
    """
    from .rnn_pallas import meta_acts
    from ..pipeline import DenoiseCarry, FeatureState

    t, b = pre.filtered.shape[0], pre.filtered.shape[1]
    if block is None:
        # 256-row blocks halve the grid's per-step pipeline overhead and
        # measure ~6 ms/chunk faster at production batch (two-phase steady
        # 186.4 vs 192.3 ms, v5e 08-20); batches that cannot fill a 256
        # block keep 128 to halve the zero-stream padding.  Results are
        # block-size-invariant: every reduction is within a row (stream).
        block = 256 if b > _BLOCK else _BLOCK
    bp = -(-b // block) * block
    feat = carry.feat
    carry_arrays = (
        feat.input_mem,
        carry.synthesis_mem,
        feat.cepstral_mem.reshape(b, CEPS_MEM * NB_BANDS),
        carry.rnn.vad,
        carry.rnn.noise,
        carry.rnn.denoise,
        carry.lastg,
        feat.pitch_period.reshape(b, 1).astype(jnp.int32),
        feat.pitch_gain.reshape(b, 1),
    )
    carry_arrays = tuple(_pad_batch(a, bp, 0) for a in carry_arrays)
    filt = _pad_batch(pre.filtered, bp, 1)
    cand = _pad_batch(pre.cand, bp, 1)
    if fps is None:  # largest frames-per-step that divides the chunk
        from ..flags import FPS as want

        # fps=5 measured fastest at production shape (155.8 ms vs 167.5
        # at fps=4 and 161.5 at fps=10 for the 100-frame 4096-batch chunk)
        fps = next(f for f in (want, 5, 4, 2, 1) if f <= want and t % f == 0)
    weights = _flatten_params(params)
    packed_out, cf = frame_loop_pallas(
        weights, carry_arrays, filt, cand,
        meta_acts(meta), block=block,
        interpret=interpret, skip=skip, fps=fps,
        mxu3=not interpret,
    )
    packed_out = packed_out[:, :b]
    cf = tuple(a[:b] for a in cf)
    out = jnp.swapaxes(packed_out[:, :, :FRAME_SIZE], 0, 1)  # (B, T, 480)
    vad = jnp.swapaxes(packed_out[:, :, _OFF_VAD : _OFF_VAD + 1], 0, 1)
    mem, synth, cmem, hv, hn, hd, lastg, per, pg = cf
    from ..ops.rnn import RnnState

    new_carry = DenoiseCarry(
        feat=FeatureState(
            input_mem=mem,
            hp_mem=feat.hp_mem,  # patched by the caller (chunk-level filter)
            cepstral_mem=cmem.reshape(b, CEPS_MEM, NB_BANDS),
            pitch_period=per.reshape(b),
            pitch_gain=pg.reshape(b),
        ),
        synthesis_mem=synth,
        rnn=RnnState(hv, hn, hd),
        lastg=lastg,
    )
    if return_trace:
        periods = jnp.swapaxes(
            packed_out[:, :, _OFF_PERIOD], 0, 1
        ).astype(jnp.int32)
        pgains = jnp.swapaxes(packed_out[:, :, _OFF_PGAIN], 0, 1)
        return new_carry, out, vad.reshape(b, t), (periods, pgains)
    return new_carry, out, vad.reshape(b, t)
