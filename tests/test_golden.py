"""Golden end-to-end regression against the reference output.

Mirrors the reference's primary correctness oracle (src/lib.rs:184-213):
feed test_data/testing.raw frame-by-frame, drop the first output frame, cast
to i16, and require relative squared error diff/xx < 1e-4 against
test_data/reference_output.raw.
"""

import numpy as np

from nnnoiseless_tpu import FRAME_SIZE, denoise_audio


def relative_sq_error(output_f32: np.ndarray, reference_i16: np.ndarray) -> float:
    assert output_f32.shape == reference_i16.shape
    out = output_f32.astype(np.int16)  # same trunc-toward-zero cast as Rust `as i16`
    xx = np.sum(out.astype(np.float64) ** 2)
    diff = np.sum((reference_i16.astype(np.float64) - out.astype(np.float64)) ** 2)
    return diff / xx


def test_compare_to_reference(testing_raw, reference_output):
    out = denoise_audio(testing_raw, drop_first_frame=True)
    assert out.shape[0] == reference_output.shape[0]
    err = relative_sq_error(out, reference_output)
    print(f"golden relative squared error: {err:.3e}")
    assert err < 1e-4


def test_per_sample_parity(testing_raw, reference_output):
    """BASELINE.md north star: per-sample output within 1e-4 of the Rust
    reference.  In the i16 domain 1e-4 of full scale is 3.27 units; the
    measured max deviation is 1 unit on hardware (round 4: modal-basis
    biquad carry + sliced-tail pitch basis), 2 on CPU."""
    out = denoise_audio(testing_raw, drop_first_frame=True)
    o = out.astype(np.int16).astype(np.int32)
    delta = np.abs(reference_output.astype(np.int32) - o)
    print(f"max per-sample |delta|: {delta.max()} i16 units")
    assert delta.max() <= 2


def test_chunked_equals_oneshot(testing_raw, default_model):
    """Chunked/per-frame processing must match one scanned pass.

    Not bit-exact: the standalone frame_step and the scanned one compile to
    differently-fused XLA programs; tolerance is ~1e-3 in the i16 domain.
    """
    from nnnoiseless_tpu import DenoiseState

    n_frames = 20
    sig = testing_raw[: n_frames * FRAME_SIZE]
    one = denoise_audio(sig, drop_first_frame=False)

    st = DenoiseState(default_model)
    parts = []
    frames = sig.reshape(n_frames, FRAME_SIZE)
    out1, _ = st.process_chunk(frames[:7])
    out2, _ = st.process_chunk(frames[7:15])
    parts = [out1.reshape(-1), out2.reshape(-1)]
    for f in frames[15:]:
        o, _ = st.process_frame(f)
        parts.append(o)
    chunked = np.concatenate(parts)
    from conftest import assert_waveform_close

    assert_waveform_close(chunked, one, cpu_atol=1.0)


def test_internal_chunking_matches(testing_raw):
    """denoise_audio's internal chunking (bounded memory for long files,
    default 1000 frames) is exact: tiny chunks must reproduce the one-shot
    output.  The reference streams frame-by-frame with the same state
    handoff (src/nnnoiseless.rs:307-330)."""
    n_frames = 20
    sig = testing_raw[: n_frames * FRAME_SIZE]
    one = denoise_audio(sig, drop_first_frame=False, chunk_frames=10_000)
    small = denoise_audio(sig, drop_first_frame=False, chunk_frames=7)
    from conftest import assert_waveform_close

    assert_waveform_close(small, one, cpu_atol=1.0)


def test_golden_through_fused_batch(testing_raw, reference_output, default_model):
    """The production batched engine (B=128 -> the compiled Pallas kernel
    on TPU) must itself pass the reference oracle, not just the B=1 path.

    Skipped on CPU: B=128 through the XLA fallback is minutes of compile
    for a path test_fused_kernel already pins in interpret mode; on the
    TPU lane this is the end-to-end hardware check of the fused kernel.
    """
    import pytest
    from conftest import on_cpu_platform

    if on_cpu_platform():
        pytest.skip("TPU-lane test (CPU covered by test_fused_kernel)")

    from nnnoiseless_tpu import init_batch_carry, process_frames

    t = len(testing_raw) // FRAME_SIZE
    frames = np.broadcast_to(
        testing_raw[: t * FRAME_SIZE].reshape(1, t, FRAME_SIZE),
        (128, t, FRAME_SIZE),
    )
    carry = init_batch_carry(default_model.meta, 128)
    _, out, _ = process_frames(default_model, carry, np.ascontiguousarray(frames))
    got = np.asarray(out)[0].reshape(-1)[FRAME_SIZE:]
    want = reference_output[: len(got)].astype(np.float64)
    got_i = np.clip(np.rint(got), -32768, 32767)
    rel = np.sum((want - got_i) ** 2) / np.sum(got_i**2)
    assert rel < 1e-4, f"fused-batch golden rel err {rel}"
    # round-4 hardware envelope: 4.9e-08 rel / 1 unit; bar at 2 for slack
    assert np.abs(want - got_i).max() <= 2.0
