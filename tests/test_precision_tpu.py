"""TPU-hardware precision lane (NNT_TEST_PLATFORM=tpu; skipped on CPU).

CPU-calibrated precision is a trap: ``jax.lax.Precision`` is ignored on
CPU, so only this lane sees the real bf16-emulation rounding of the MXU.
Two regression classes that CPU tests are structurally blind to:

* the hoisted-biquad contraction (round 2 shipped a HIGH-precision variant
  that lost up to 157 i16 units at batch 128 from cancellation in the
  unrolled-recurrence rows while every CPU test stayed green) — pinned
  here against a float64 host oracle across batch shapes;
* pitch-lag decision flips between differently-compiled production
  programs (different matmul tile reduction orders can flip near-tie ±1
  lags) — counted here with an explicit flip budget, instead of only the
  waveform-level energy bars of conftest.assert_waveform_close.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nnnoiseless_tpu import FRAME_SIZE, init_batch_carry

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="TPU hardware lane (set NNT_TEST_PLATFORM=tpu)",
)


def _biquad_oracle_f64(x: np.ndarray, a, b) -> np.ndarray:
    """Sequential float64 reference of the biquad recurrence
    (src/util.rs:95-107) over the last axis."""
    y = np.empty_like(x, dtype=np.float64)
    m0 = np.zeros(x.shape[:-1])
    m1 = np.zeros(x.shape[:-1])
    for n in range(x.shape[-1]):
        xn = x[..., n].astype(np.float64)
        yn = xn + m0
        m0 = m1 + (b[0] * xn - a[0] * yn)
        m1 = b[1] * xn - a[1] * yn
        y[..., n] = yn
    return y


@pytest.mark.parametrize("batch", [1, 64, 128])
def test_hoisted_biquad_vs_f64_oracle(batch):
    """The chunk-hoisted Toeplitz biquad must track the f64 oracle to
    ~1 i16 unit at every batch shape (the round-2 bug lost 157)."""
    from nnnoiseless_tpu.ops.biquad import biquad_filter_frames
    from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B

    t = 8
    rng = np.random.RandomState(batch)
    frames = (rng.randn(batch, t, FRAME_SIZE) * 3000).astype(np.float32)
    got, _ = jax.jit(
        lambda fr, hp: biquad_filter_frames(
            fr, hp, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B)
        )
    )(jnp.asarray(frames), jnp.zeros((batch, 2), jnp.float32))
    want = _biquad_oracle_f64(
        frames.reshape(batch, t * FRAME_SIZE), BIQUAD_HP_A, BIQUAD_HP_B
    ).reshape(batch, t, FRAME_SIZE)
    err = np.abs(np.asarray(got, np.float64) - want).max()
    print(f"hoisted biquad max |err| vs f64 oracle at batch {batch}: {err:.3f}")
    # Round-4 bar: the modal-basis closed-form carry (ops/biquad.py::
    # _carry_prop_tables) measures 0.001 units at batch 1..4096 on v5e;
    # the pre-modal forms measured 0.8-1.8.  0.05 locks the improvement in.
    assert err <= 0.05, f"batch {batch}: max err {err} i16 units"


def test_throughput_floor_batch4096():
    """Perf regressions should fail a test, not a round: the production
    two-phase engine must hold >= 15,000x aggregate realtime at the
    headline batch (round-4 record: 17,672x; the floor leaves ~15% for
    tunnel variance)."""
    import time

    from nnnoiseless_tpu import RnnModel
    from nnnoiseless_tpu.denoise import _two_phase_chunk

    model = RnnModel.default()
    b, t = 4096, 100
    rng = np.random.RandomState(0)
    frames = jnp.asarray((rng.randn(b, t, FRAME_SIZE) * 3000).astype(np.float32))
    carry = init_batch_carry(model.meta, b)

    def run():
        c, out, _ = _two_phase_chunk(model.params, model.meta, carry, frames)
        # derived-scalar readback: the only reliable completion barrier on
        # this backend (bench.py::force)
        return float(jnp.sum(out[:, -1, 0]))

    run()  # compile + warm
    best = min(
        (lambda t0: (run(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    rt = b * t / best / 100.0
    print(f"two-phase @4096: {best*1000:.1f} ms = {rt:.0f}x realtime")
    assert rt >= 15_000.0, f"throughput floor breached: {rt:.0f}x"


def test_kernel_tansig_table_delta():
    """The fused kernel recomputes tanh instead of reading the 6-decimal
    table (ops/frame_kernel.py::_tansig_g); measure the deviation on the
    hardware VPU and pin its documented bound.  Measured 3.35e-05 on TPU —
    the backend's reduced-precision tanh approximation, NOT the table's
    decimal rounding (~5e-7), dominates.  Invisible end-to-end: the
    hardware golden holds 4.9e-08 rel with this kernel."""
    from nnnoiseless_tpu.ops.activations import tansig_approx
    from nnnoiseless_tpu.ops.frame_kernel import _tansig_g

    x = np.linspace(-9.0, 9.0, 200_001).astype(np.float32)
    want = np.asarray(jax.jit(tansig_approx)(jnp.asarray(x)))
    got = np.asarray(
        jax.jit(lambda v: _tansig_g(v[None], None)[0])(jnp.asarray(x))
    )
    delta = np.abs(got - want).max()
    print(f"kernel tansig vs table: max |delta| {delta:.2e}")
    assert delta <= 5e-5, delta


def _fused_trace(model, frames) -> np.ndarray:
    """Per-frame pitch periods from the PRODUCTION fused kernel."""
    from nnnoiseless_tpu.chunk import precompute_chunk
    from nnnoiseless_tpu.ops.frame_kernel import run_fused_scan

    carry = init_batch_carry(model.meta, frames.shape[0])

    @jax.jit
    def go(c, fr):
        pre, _ = precompute_chunk(
            c.feat.input_mem, c.feat.hp_mem, fr, lag0=False
        )
        return run_fused_scan(
            model.params, model.meta, c, pre, return_trace=True
        )

    _, _, _, (periods, _g) = go(carry, jnp.asarray(frames))
    return np.asarray(periods)


def test_pitch_flip_budget_across_programs(testing_raw, default_model):
    """Lag decisions of the fused kernel must agree across compilation
    shapes (B=1 padded vs B=128 replicated — identical kernel program,
    different precompute tiling) and with the sequential native C++
    engine, within an explicit flip budget (<= 2 per 100 frames)."""
    from nnnoiseless_tpu.tools.trace import pitch_trace_native

    t = 100
    sig = testing_raw[: t * FRAME_SIZE]
    frames1 = sig.reshape(1, t, FRAME_SIZE)
    p1 = _fused_trace(default_model, frames1)[0]

    frames128 = np.broadcast_to(frames1, (128, t, FRAME_SIZE)).copy()
    p128 = _fused_trace(default_model, frames128)
    # every replicated stream must agree with itself
    assert (p128 == p128[0]).all(), "replicated streams diverged"

    flips_shape = int((p1 != p128[0]).sum())
    print(f"flips B=1 vs B=128: {flips_shape}/100")
    assert flips_shape <= 2

    pn, _ = pitch_trace_native(sig)
    flips_native = int((p1 != pn).sum())
    print(f"flips fused vs native: {flips_native}/100")
    assert flips_native <= 2
