"""End-to-end training-path tests: data generator -> HDF5 -> fit -> export.

Mirrors the reference's L8/L9 flow (src/training.rs + train/rnn_train.py +
train/dump_rnn.py) at toy scale: synthetic speech/noise WAVs through the
87-column generator, a few optimizer steps, quantized .rnn export, and
inference with the resulting model.
"""

import wave

import numpy as np
import pytest

from nnnoiseless_tpu.constants import FRAME_SIZE, NB_BANDS, NB_FEATURES


def _write_wav(path, samples_f32):
    i16 = np.clip(np.round(samples_f32), -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(48_000)
        w.writeframes(i16.tobytes())


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Two tiny 'speech' files (tones) and two noise files."""
    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.RandomState(0)
    n = 48_000  # 1 s each
    t = np.arange(n) / 48_000.0
    _write_wav(d / "sig1.wav", np.sin(2 * np.pi * 220 * t) * 6000)
    _write_wav(d / "sig2.wav", np.sin(2 * np.pi * 550 * t) * 9000 * (t % 0.5 < 0.25))
    _write_wav(d / "noise1.wav", rng.randn(n) * 2000)
    _write_wav(d / "noise2.wav", rng.randn(n) * 500)
    return d


def test_data_generator_schema(corpus, tmp_path):
    """The generator emits the 87-column schema with valid ranges."""
    from nnnoiseless_tpu.training.data import generate

    count = 300
    data = generate(
        [str(corpus / "sig1.wav"), str(corpus / "sig2.wav")],
        [str(corpus / "noise1.wav"), str(corpus / "noise2.wav")],
        count,
        seed=1,
        chunk=128,
    )
    assert data.shape == (count, NB_FEATURES + 2 * NB_BANDS + 1)
    gains = data[:, NB_FEATURES : NB_FEATURES + NB_BANDS]
    # gains are in [0, 1] or the -1 sentinel
    assert np.all((gains >= -1.0) & (gains <= 1.0))
    vad = data[:, -1]
    assert set(np.unique(vad)).issubset({0.0, 0.5, 1.0})
    assert np.all(np.isfinite(data))

    # round-trip through the HDF5 writer/loader
    import h5py

    from nnnoiseless_tpu.training.train import load_h5

    path = tmp_path / "train.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
    feats, g, v = load_h5(str(path), window=100)
    assert feats.shape == (3, 100, NB_FEATURES)
    assert g.shape == (3, 100, NB_BANDS)
    assert v.shape == (3, 100, 1)


def test_data_generator_parallel_worlds(corpus):
    """workers>1 batches 3*W feature pipelines per dispatch; output rows
    stay world-contiguous and schema-valid."""
    from nnnoiseless_tpu.training.data import generate

    count = 120
    data = generate(
        [str(corpus / "sig1.wav"), str(corpus / "sig2.wav")],
        [str(corpus / "noise1.wav"), str(corpus / "noise2.wav")],
        count,
        seed=3,
        chunk=32,
        workers=4,
    )
    assert data.shape == (count, NB_FEATURES + 2 * NB_BANDS + 1)
    assert np.all(np.isfinite(data))
    gains = data[:, NB_FEATURES : NB_FEATURES + NB_BANDS]
    assert np.all((gains >= -1.0) & (gains <= 1.0))
    # world 0 is a deterministic continuous stream: its contiguous region
    # must reproduce a single-world run of the same length/seed
    solo = generate(
        [str(corpus / "sig1.wav"), str(corpus / "sig2.wav")],
        [str(corpus / "noise1.wav"), str(corpus / "noise2.wav")],
        30,
        seed=3,
        chunk=32,
        workers=1,
    )
    np.testing.assert_allclose(data[:30], solo, atol=1e-4, rtol=1e-4)


def test_next_frames_bit_identical_to_scalar_path(corpus):
    """The vectorized simulator batch (segment-wise biquads, bulk reads)
    must reproduce the per-frame path BIT FOR BIT — same shared-RNG draw
    order, same f32 recurrences — across randomization boundaries
    (GAIN_CHANGE_COUNT is deliberately spanned via monkeypatched spacing)."""
    import nnnoiseless_tpu.training.data as D

    paths_s = [str(corpus / "sig1.wav"), str(corpus / "sig2.wav")]
    paths_n = [str(corpus / "noise1.wav"), str(corpus / "noise2.wav")]

    def make_sim(seed):
        rng = np.random.RandomState(seed)
        return D.NoiseSimulator(
            D.SignalReader(paths_s, 600, rng),
            D.SignalReader(paths_n, 600, rng),
            rng,
        )

    old = D.GAIN_CHANGE_COUNT
    D.GAIN_CHANGE_COUNT = 37  # force several segment boundaries per batch
    try:
        a, b = make_sim(7), make_sim(7)
        for n in (1, 36, 37, 38, 200):
            want = [b.next_frame() for _ in range(n)]
            sig, noise, comb, cut, vad = a.next_frames(n)
            for t in range(n):
                np.testing.assert_array_equal(sig[t], want[t][0])
                np.testing.assert_array_equal(noise[t], want[t][1])
                np.testing.assert_array_equal(comb[t], want[t][2])
                assert cut[t] == want[t][3]
                assert vad[t] == want[t][4]
        # filter memories and RNG stay in lockstep too
        np.testing.assert_array_equal(a.sig_mem, b.sig_mem)
        np.testing.assert_array_equal(a.noise_mem, b.noise_mem)
        assert a.rng.randint(1 << 30) == b.rng.randint(1 << 30)
    finally:
        D.GAIN_CHANGE_COUNT = old


def test_fit_and_export_roundtrip(corpus):
    """A few SGD steps reduce the loss; the export loads and denoises."""
    from nnnoiseless_tpu import RnnModel, denoise_audio
    from nnnoiseless_tpu.training.data import generate
    from nnnoiseless_tpu.training.losses import total_loss
    from nnnoiseless_tpu.training.network import DEFAULT_META, export_model, sequence_forward
    from nnnoiseless_tpu.training.train import fit, init_train_state, train_step

    import jax
    import jax.numpy as jnp

    data = generate(
        [str(corpus / "sig1.wav")], [str(corpus / "noise1.wav")], 240, seed=2
    )
    window = 60
    n_seq = len(data) // window
    feats = data[:, :NB_FEATURES].reshape(n_seq, window, NB_FEATURES)
    gains = data[:, NB_FEATURES : NB_FEATURES + NB_BANDS].reshape(
        n_seq, window, NB_BANDS
    )
    vad = data[:, -1:].reshape(n_seq, window, 1)

    # loss must decrease over a handful of steps on this tiny batch
    state = init_train_state(jax.random.PRNGKey(0))
    batch = {
        "features": jnp.asarray(feats),
        "gains": jnp.asarray(gains),
        "vad": jnp.asarray(vad),
    }
    sw = jnp.ones(batch["vad"].shape[:2], jnp.float32)
    losses = []
    for _ in range(8):
        state, loss = train_step(state, batch, sw, DEFAULT_META, 1e-3)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # weight-clip constraint holds (rnn_train.py WeightClip(0.499))
    for layer in state.params.values():
        for name, arr in layer.items():
            assert np.max(np.abs(np.asarray(arr))) <= 0.499 + 1e-6, name

    # quantized export parses and runs inference
    model = export_model(jax.device_get(state.params))
    data_bytes = model.to_bytes()
    reloaded = RnnModel.from_bytes(data_bytes)
    sig = (np.random.RandomState(3).randn(5 * FRAME_SIZE) * 2000).astype(np.float32)
    out = denoise_audio(sig, reloaded, drop_first_frame=False)
    assert out.shape == sig.shape
    assert np.all(np.isfinite(out))


def test_losses_match_reference_formulas():
    """mycost/my_crossentropy semantics of rnn_train.py:33-46 by hand."""
    import jax.numpy as jnp

    from nnnoiseless_tpu.training.losses import gain_loss, vad_loss

    eps = 1e-7
    y_true = np.array([[0.25, -1.0, 1.0]])
    y_pred = np.array([[0.16, 0.5, 0.81]])
    mask = np.minimum(y_true + 1.0, 1.0)  # 0 on the -1 sentinel
    d = np.sqrt(np.maximum(y_pred, 0)) - np.sqrt(np.maximum(y_true, 0))
    p = np.clip(y_pred, eps, 1 - eps)
    t = np.clip(y_true, 0, 1)
    bce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    want = np.mean(mask * (10 * d**4 + d**2 + 0.01 * bce), axis=-1)
    got = np.asarray(gain_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # the sentinel band must contribute exactly zero
    y_pred2 = y_pred.copy()
    y_pred2[0, 1] = 0.99
    got2 = np.asarray(gain_loss(jnp.asarray(y_true), jnp.asarray(y_pred2)))
    np.testing.assert_allclose(got, got2, rtol=1e-6)

    vt = np.array([[1.0, 0.0, 0.5]])
    vp = np.array([[0.9, 0.2, 0.7]])
    p = np.clip(vp, eps, 1 - eps)
    bce = -(vt * np.log(p) + (1 - vt) * np.log(1 - p))
    want_v = np.mean(2 * np.abs(vt - 0.5) * bce, axis=-1)
    got_v = np.asarray(vad_loss(jnp.asarray(vt), jnp.asarray(vp)))
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5)
    # a 0.5 (uncertain) VAD label contributes zero weight
    assert got_v.shape == (1,)


def test_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of the full TrainState preserves every leaf."""
    import jax
    import numpy as np

    from nnnoiseless_tpu.training.train import (
        init_train_state,
        restore_checkpoint,
        save_checkpoint,
    )

    state = init_train_state(jax.random.PRNGKey(42))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, state)
    template = init_train_state(jax.random.PRNGKey(0))
    restored = restore_checkpoint(ckpt, template)
    flat1, _ = jax.tree_util.tree_flatten(jax.device_get(state))
    flat2, _ = jax.tree_util.tree_flatten(jax.device_get(restored))
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_never_deletes_unrelated_files(tmp_path):
    """Periodic saves must not touch other files in the checkpoint dir."""
    import jax

    from nnnoiseless_tpu.training.train import (
        init_train_state,
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    ckpt = tmp_path / "ckpts"
    ckpt.mkdir()
    precious = ckpt / "precious.txt"
    precious.write_text("do not delete")

    s0 = init_train_state(jax.random.PRNGKey(0))
    save_checkpoint(ckpt, s0)
    s1 = s0._replace(step=s0.step + 7)
    save_checkpoint(ckpt, s1)

    assert precious.read_text() == "do not delete"
    assert latest_checkpoint(ckpt).name == "step_00000007"
    restored = restore_checkpoint(ckpt, init_train_state(jax.random.PRNGKey(1)))
    assert int(restored.step) == 7


def test_native_augmentation_biquad_matches_python():
    """nnt_biquad_inplace must match the Python fallback exactly."""
    import nnnoiseless_tpu.training.data as data_mod

    rng = np.random.RandomState(4)
    x = (rng.randn(960) * 5000).astype(np.float32)
    a = np.array([0.3, -0.2], np.float32)
    b = np.array([-0.1, 0.25], np.float32)

    # force the Python path
    data_mod._NATIVE_BIQUAD = False
    mem_py = np.zeros(2, np.float32)
    want = data_mod._biquad_np(x, mem_py, a, b)

    # force (re)resolution of the native path
    data_mod._NATIVE_BIQUAD = None
    mem_nat = np.zeros(2, np.float32)
    got = data_mod._biquad_np(x, mem_nat, a, b)
    if data_mod._NATIVE_BIQUAD is False:
        import pytest

        pytest.skip("no native toolchain")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(mem_nat, mem_py, rtol=1e-6, atol=1e-3)


def test_synthetic_demo_model_denoises():
    """The committed synthetic-corpus model (examples/train_synthetic.py,
    docs/TRAINING_RUN.md) must measurably denoise the deterministic
    held-out mix — proof the training pipeline produces quality-bearing
    models, not just decreasing loss."""
    import importlib.util
    import pathlib

    import numpy as np

    from nnnoiseless_tpu import RnnModel, denoise_audio

    root = pathlib.Path(__file__).parent.parent
    spec = importlib.util.spec_from_file_location(
        "train_synthetic", root / "examples" / "train_synthetic.py"
    )
    ts = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ts)

    eval_rng = np.random.RandomState(12345)
    clean = ts.synth_voice(eval_rng, seconds=8.0)
    noise = ts.synth_noise(eval_rng, "pink", seconds=8.0)
    alpha = np.sqrt(np.dot(clean, clean) / (np.dot(noise, noise) * 10**0.5))
    noisy = clean + alpha * noise

    blob = (root / "tests" / "data" / "synthetic_demo.rnn").read_bytes()
    model = RnnModel.from_bytes(blob)
    out = denoise_audio(noisy, model=model, drop_first_frame=False)

    snr_noisy = ts.snr_db(clean, noisy)
    snr_out = ts.snr_db(clean, out)
    # measured +7.06 dB (docs/TRAINING_RUN.md round-3 run — beats the
    # shipped reference model's +6.82 dB on this mix); margin for
    # platform variation
    assert snr_out - snr_noisy > 5.5, (snr_noisy, snr_out)


def test_train_step_indexed_matches_train_step():
    """The on-device-dataset path (in-program gather, train_step_indexed)
    computes the same step as train_step on the gathered batch — the
    gather changes WHERE the batch is assembled, not any input value.
    (Bound: fusing the gather into the program lets XLA reorder f32
    reductions at the ulp level, and Adam's rsqrt amplifies that to
    ~1e-6 absolute on a handful of weights — measured 3/32,832 elements
    at 1.2e-6 on the CPU platform; 5e-6/1e-4 pins the behavior without
    chasing compiler scheduling.)"""
    import jax
    import jax.numpy as jnp

    from nnnoiseless_tpu.training.network import DEFAULT_META
    from nnnoiseless_tpu.training.train import (
        init_train_state,
        train_step,
        train_step_indexed,
    )

    rng = np.random.RandomState(0)
    n, t, b = 6, 30, 4
    data = {
        "features": jnp.asarray(rng.randn(n, t, NB_FEATURES).astype(np.float32)),
        "gains": jnp.asarray(rng.rand(n, t, NB_BANDS).astype(np.float32)),
        "vad": jnp.asarray((rng.rand(n, t, 1) > 0.5).astype(np.float32)),
    }
    seq_w = jnp.asarray(rng.rand(n).astype(np.float32))
    idx_np = np.asarray([4, 1, 3, 1])  # repeats allowed (shuffled sampling)

    batch = {k: v[idx_np] for k, v in data.items()}
    sw = jnp.broadcast_to(seq_w[idx_np][:, None], (b, t))
    s_ref, loss_ref = train_step(
        init_train_state(jax.random.PRNGKey(0)), batch, sw, DEFAULT_META, 1e-3
    )
    s_idx, loss_idx = train_step_indexed(
        init_train_state(jax.random.PRNGKey(0)),
        data,
        jnp.asarray(idx_np),
        seq_w,
        DEFAULT_META,
        1e-3,
    )
    np.testing.assert_allclose(float(loss_ref), float(loss_idx), rtol=1e-6)
    for (ka, va), (kb, vb) in zip(
        sorted(
            jax.tree_util.tree_leaves_with_path(s_ref.params),
            key=lambda kv: str(kv[0]),
        ),
        sorted(
            jax.tree_util.tree_leaves_with_path(s_idx.params),
            key=lambda kv: str(kv[0]),
        ),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-4, atol=5e-6, err_msg=str(ka)
        )


def test_fit_history_and_device_dataset():
    """fit() trains off the one-time-uploaded device dataset; the deferred
    history materializes every step's loss in order."""
    import jax

    from nnnoiseless_tpu.training.train import fit

    rng = np.random.RandomState(1)
    n, t = 8, 40
    feats = rng.randn(n, t, NB_FEATURES).astype(np.float32)
    gains = rng.rand(n, t, NB_BANDS).astype(np.float32)
    vad = (rng.rand(n, t, 1) > 0.5).astype(np.float32)

    history: list = []
    params = fit(
        feats, gains, vad, epochs=3, batch_size=4, log_every=100, history=history
    )
    assert [s for s, _ in history] == list(range(3 * (n // 4)))
    assert np.all(np.isfinite([l for _, l in history]))
    for layer in params.values():
        for arr in layer.values():
            assert np.all(np.isfinite(arr))


def test_fit_dp_mesh_indexed_gather():
    """The mesh path: dataset/weights replicated, per-step indices sharded
    over "dp" — each device gathers its own rows locally and the step
    trains (finite, decreasing-capable loss) on the 8-device mesh."""
    import jax

    from nnnoiseless_tpu.parallel.mesh import make_mesh
    from nnnoiseless_tpu.training.train import fit

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU platform")
    mesh = make_mesh(jax.devices()[:8])

    rng = np.random.RandomState(2)
    n, t = 16, 40
    feats = rng.randn(n, t, NB_FEATURES).astype(np.float32)
    gains = rng.rand(n, t, NB_BANDS).astype(np.float32)
    vad = (rng.rand(n, t, 1) > 0.5).astype(np.float32)

    history: list = []
    fit(
        feats,
        gains,
        vad,
        epochs=1,
        batch_size=8,
        log_every=100,
        mesh=mesh,
        history=history,
    )
    assert len(history) == 2
    assert np.all(np.isfinite([l for _, l in history]))


def test_fit_checkpoint_resume_roundtrip(tmp_path):
    """fit() with checkpoint_dir saves periodically; a second fit resuming
    from the directory continues at the saved step (the indexed-dataset
    loop preserves the orbax checkpoint/resume contract)."""
    from nnnoiseless_tpu.training.train import fit, latest_checkpoint

    rng = np.random.RandomState(3)
    n, t = 8, 40
    feats = rng.randn(n, t, NB_FEATURES).astype(np.float32)
    gains = rng.rand(n, t, NB_BANDS).astype(np.float32)
    vad = (rng.rand(n, t, 1) > 0.5).astype(np.float32)
    ckpt = tmp_path / "ckpt"

    fit(
        feats, gains, vad, epochs=2, batch_size=4, log_every=100,
        checkpoint_dir=str(ckpt), checkpoint_every=3,
    )
    # 2 epochs x 2 steps: periodic save at step 3 + final save at step 4
    names = sorted(p.name for p in ckpt.glob("step_*"))
    assert names == ["step_00000003", "step_00000004"]

    history: list = []
    fit(
        feats, gains, vad, epochs=3, batch_size=4, log_every=100,
        checkpoint_dir=str(ckpt), checkpoint_every=100,
        resume_from=str(ckpt), history=history,
    )
    # resumed state carries step=4; 6 more steps end at 10 (final save)
    assert latest_checkpoint(ckpt).name == "step_00000010"
    assert np.all(np.isfinite([l for _, l in history]))
