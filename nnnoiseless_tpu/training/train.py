"""Training loop: optax Adam + weight clipping, data-parallel over a mesh.

Equivalent of train/rnn_train.py (same topology, losses, loss weights,
sequence length 2000, batch 32, sample reweighting by mean gain tertile),
rebuilt for TPU: the train step is one jitted program whose batch axis is
sharded over the ``"dp"`` mesh axis; gradients are averaged by the psum XLA
inserts for the replicated-parameter/sharded-batch layout.

Usage::

    python -m nnnoiseless_tpu.training.train --data training.h5 \
        --epochs 20 --out weights.rnn
"""

from __future__ import annotations

import argparse
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import NB_BANDS, NB_FEATURES
from ..model import ModelMeta, RnnModel
from .losses import total_loss
from .network import (
    DEFAULT_META,
    clip_params,
    export_model,
    init_train_params,
    sequence_forward,
)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


@functools.lru_cache(maxsize=16)
def make_optimizer(learning_rate=1e-3) -> optax.GradientTransformation:
    """Adam with the learning rate held in ``opt_state.hyperparams`` (a
    float) or driven by an optax schedule (pass the schedule callable).

    ``inject_hyperparams`` puts the lr into the optimizer *state*, so it can
    be changed mid-run (``state.opt_state.hyperparams['learning_rate']``)
    without retracing the jitted train step.  Cached so the same spec maps
    to the same instance (jit treats the optimizer as a static argument).
    """
    if callable(learning_rate):  # an optax schedule
        return optax.adam(learning_rate)
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def init_train_state(
    key,
    meta: ModelMeta = DEFAULT_META,
    learning_rate=1e-3,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    params = init_train_params(key, meta)
    opt = optimizer if optimizer is not None else make_optimizer(learning_rate)
    return TrainState(params, opt.init(params), jnp.int32(0))


def _sgd_step(state, batch, sample_weight, meta, optimizer):
    """Shared SGD-step body for the two jitted entry points below."""
    from .losses import l2_regularization

    def loss_fn(params):
        gains_pred, vad_pred = sequence_forward(params, batch["features"], meta)
        data = total_loss(
            batch["gains"], gains_pred, batch["vad"], vad_pred, sample_weight
        )
        return data + l2_regularization(params)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    opt = (
        optimizer
        if isinstance(optimizer, optax.GradientTransformation)
        else make_optimizer(optimizer)
    )
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = clip_params(params)  # Keras WeightClip(0.499) constraint
    return TrainState(params, opt_state, state.step + 1), loss


@functools.partial(jax.jit, static_argnums=(3, 4), donate_argnums=(0,))
def train_step(
    state: TrainState,
    batch: dict,
    sample_weight: Optional[jnp.ndarray],
    meta: ModelMeta,
    optimizer=1e-3,
):
    """One SGD step on a batch {features (B,T,42), gains (B,T,22), vad (B,T,1)}.

    ``optimizer`` is static: either a GradientTransformation (whose state
    must match ``state.opt_state``) or a float learning rate resolved
    through the :func:`make_optimizer` cache.

    Pure and shardable: with the batch sharded over "dp" and params
    replicated, XLA inserts the gradient all-reduce automatically.
    """
    return _sgd_step(state, batch, sample_weight, meta, optimizer)


@functools.partial(jax.jit, static_argnums=(4, 5), donate_argnums=(0,))
def train_step_indexed(
    state: TrainState,
    data: dict,
    idx: jnp.ndarray,
    seq_weights: jnp.ndarray,
    meta: ModelMeta,
    optimizer=1e-3,
):
    """One SGD step on rows ``idx`` of an ON-DEVICE dataset.

    The batch gather happens inside the program, so the host transfers
    only the (B,) index vector per step instead of the ~17 MB batch the
    :func:`train_step` path re-uploads every call — on this backend's
    ~50-65 MB/s tunnel that upload dominated the step (measured 401 →
    104 ms/step at batch 32 x 2000, docs/TRAINING_RUN.md §round-5).
    ``data`` holds the full {features, gains, vad} arrays
    (sequence-major); ``seq_weights`` the per-sequence sample weights.

    Sharding: with ``data``/``seq_weights``/params replicated and ``idx``
    sharded over "dp", each device gathers its own batch rows from its
    local copy (zero communication) and XLA inserts the gradient
    all-reduce exactly as in :func:`train_step`.
    """
    batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
    sw = jnp.broadcast_to(
        jnp.take(seq_weights, idx)[:, None], batch["vad"].shape[:2]
    )
    return _sgd_step(state, batch, sw, meta, optimizer)


def compute_sample_weights(gains: np.ndarray) -> np.ndarray:
    """Tertile reweighting by per-sequence mean gain (rnn_train.py:108-118)."""
    y = gains.reshape(gains.shape[0], -1)
    masked = np.ma.masked_equal(y, -1.0)
    means = masked.mean(axis=1).filled(np.nan)
    hi = means > 2 / 3
    lo = means < 1 / 3
    med = ~hi & ~lo & ~np.isnan(means)
    total = np.sum(~np.isnan(means))
    w = np.zeros(len(means))
    for m in (hi, med, lo):
        n = max(m.sum(), 1)
        w += m * (total / n)
    return (w / 3.0).astype(np.float32)


def load_h5(path: str, window: int = 2000):
    """Load the 87-column HDF5 produced by the data generator.

    Layout per row: 42 features | 22 gains | 22 noise levels | 1 vad
    (reference src/training.rs:90-94, 155-159).
    """
    import h5py

    with h5py.File(path, "r") as f:
        data = np.asarray(f["data"], np.float32)
    n_seq = len(data) // window
    data = data[: n_seq * window]
    features = data[:, :NB_FEATURES].reshape(n_seq, window, NB_FEATURES)
    gains = data[:, NB_FEATURES : NB_FEATURES + NB_BANDS].reshape(n_seq, window, NB_BANDS)
    vad = data[:, NB_FEATURES + 2 * NB_BANDS :].reshape(n_seq, window, 1)
    return features, gains, vad


def save_checkpoint(path, state: TrainState) -> None:
    """Write an orbax checkpoint of the full training state (mid-training
    resume — the reference only saves final weights, rnn_train.py:131-135).

    Each save goes to its own ``step_<n>`` subdirectory; nothing else in the
    directory is ever touched or deleted, and an interrupted save cannot
    clobber the previous checkpoint.
    """
    import pathlib

    import orbax.checkpoint as ocp

    step_dir = pathlib.Path(path).resolve() / f"step_{int(state.step):08d}"
    with ocp.StandardCheckpointer() as ckptr:
        # force=True only replaces this step's own directory (e.g. the final
        # save landing on the same step as a periodic one).
        ckptr.save(step_dir, jax.device_get(state), force=True)


def latest_checkpoint(path):
    """The newest ``step_<n>`` checkpoint directory under ``path``, or None."""
    import pathlib

    steps = sorted(pathlib.Path(path).resolve().glob("step_*"))
    return steps[-1] if steps else None


def restore_checkpoint(path, template: TrainState) -> TrainState:
    """Restore from a checkpoint dir: either one ``step_<n>`` directory or a
    parent produced by :func:`save_checkpoint` (newest step wins).

    The optimizer-state pytree structure is part of the checkpoint
    contract: a checkpoint can only resume under the SAME optimizer
    configuration it was saved with (constant-lr ``inject_hyperparams``
    adam vs a schedule-driven adam have different ``opt_state`` trees).
    A mismatch raises a clear error instead of mis-restoring.
    """
    import pathlib

    import orbax.checkpoint as ocp

    p = pathlib.Path(path).resolve()
    if not p.name.startswith("step_"):
        newest = latest_checkpoint(p)
        if newest is None:
            raise FileNotFoundError(f"no step_* checkpoints under {p}")
        p = newest
    with ocp.StandardCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(p, jax.device_get(template))
        except Exception as e:
            raise ValueError(
                f"checkpoint {p} does not match the current training "
                f"configuration (optimizer/lr-schedule choice changes the "
                f"opt_state structure; resume with the settings the "
                f"checkpoint was written under): {e}"
            ) from e
    want = jax.tree_util.tree_structure(template)
    got = jax.tree_util.tree_structure(restored)
    if want != got:
        raise ValueError(
            f"checkpoint {p} has a different training-state structure than "
            f"the current optimizer configuration (saved {got}, expected "
            f"{want}); resume with the original optimizer/lr-schedule"
        )
    return jax.tree_util.tree_map(jnp.asarray, restored)


def fit(
    features: np.ndarray,
    gains: np.ndarray,
    vad: np.ndarray,
    *,
    epochs: int = 20,
    batch_size: int = 32,
    learning_rate: float = 1e-3,
    seed: int = 0,
    meta: ModelMeta = DEFAULT_META,
    mesh: Optional[Mesh] = None,
    log_every: int = 10,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 500,
    resume_from: Optional[str] = None,
    lr_schedule: Optional[str] = None,
    total_steps: Optional[int] = None,
    history: Optional[list] = None,
) -> dict:
    """Train and return float params.

    ``lr_schedule``: None (constant) or "cosine" (cosine decay to 0 over
    the run).  ``history`` (if given) collects (step, loss) pairs.
    """
    key = jax.random.PRNGKey(seed)
    if lr_schedule == "cosine":
        n_batches = max(len(features) // batch_size, 1)
        steps = total_steps or epochs * n_batches
        optimizer = make_optimizer(
            optax.cosine_decay_schedule(learning_rate, steps)
        )
    elif lr_schedule is None:
        optimizer = make_optimizer(learning_rate)
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
    state = init_train_state(key, meta, optimizer=optimizer)
    if resume_from:
        state = restore_checkpoint(resume_from, state)
        print(f"resumed from {resume_from} at step {int(state.step)}")
    weights = compute_sample_weights(gains)
    n = len(features)
    rng = np.random.RandomState(seed)

    # The dataset lives ON DEVICE for the whole run (a reference-scale 10M
    # frames is ~3.5 GB — well inside HBM); each step uploads only its (B,)
    # index vector and gathers the batch inside the jitted program
    # (train_step_indexed).  Re-uploading every batch was ~75% of the
    # per-step wall on this backend's tunnel.
    data = {
        "features": jnp.asarray(features),
        "gains": jnp.asarray(gains),
        "vad": jnp.asarray(vad),
    }
    seq_w = jnp.asarray(weights, jnp.float32)

    if mesh is not None:
        idx_sharding = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        state = jax.device_put(state, rep)
        data = jax.device_put(data, rep)
        seq_w = jax.device_put(seq_w, rep)
    else:
        idx_sharding = None

    # Loss readbacks are deferred: float(loss) is a host round-trip that
    # would serialize every step (and on this backend gates execution
    # itself); keeping device scalars lets log_every steps chain
    # back-to-back.  ``history`` is materialized in one transfer at the end.
    pending: list = []
    step = 0
    for epoch in range(epochs):
        perm = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = jnp.asarray(perm[i : i + batch_size])
            if idx_sharding is not None:
                idx = jax.device_put(idx, idx_sharding)
            state, loss = train_step_indexed(
                state, data, idx, seq_w, meta, optimizer
            )
            if step % log_every == 0:
                print(f"epoch {epoch} step {step} loss {float(loss):.5f}")
            if history is not None:
                pending.append((step, loss))
            step += 1
            if checkpoint_dir and step % checkpoint_every == 0:
                save_checkpoint(checkpoint_dir, state)
    if history is not None and pending:
        ls = [l for _, l in pending]
        # bounded stacks: one readback per 512 steps, no single huge concat
        losses = np.concatenate(
            [np.asarray(jnp.stack(ls[j : j + 512])) for j in range(0, len(ls), 512)]
        )
        history.extend((s, float(l)) for (s, _), l in zip(pending, losses))
    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, state)
    return jax.device_get(state.params)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train a denoise model")
    ap.add_argument("--data", required=True, help="training.h5 (87-col schema)")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--window", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="weights.rnn")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default=None, help="orbax checkpoint dir")
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    ap.add_argument(
        "--lr-schedule", default=None, choices=["cosine"],
        help="cosine-decay the lr to 0 over the run (default: constant)",
    )
    args = ap.parse_args(argv)

    features, gains, vad = load_h5(args.data, args.window)
    print(f"{len(features)} sequences of {args.window} frames")
    params = fit(
        features,
        gains,
        vad,
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume_from=args.resume,
        lr_schedule=args.lr_schedule,
    )
    model = export_model(params)
    with open(args.out, "wb") as f:
        f.write(model.to_bytes())
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
