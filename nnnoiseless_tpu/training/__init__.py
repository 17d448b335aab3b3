"""Training: float network, losses, data generation, and the train loop.

Mirrors the reference training path (src/training.rs + train/rnn_train.py +
train/dump_rnn.py) with a JAX/optax implementation: same topology, same
losses, same 87-column HDF5 feature schema, and the same int8 quantizer so
trained models load back into the inference engine (and into the reference).
"""

from .network import TrainableModel, init_train_params, sequence_forward  # noqa: F401
from .losses import gain_loss, total_loss, vad_loss  # noqa: F401
