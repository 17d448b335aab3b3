"""RNN model container, binary parser, serializer, and format converters.

The model file format (produced by the reference training scripts, consumed
here; reference src/rnn.rs:96-232) is a flat stream of signed bytes:

* dense layer:  ``<nb_inputs> <nb_neurons> <activation>`` then
  ``weights[nb_inputs * nb_neurons]`` (laid out input-major, i.e. the weight
  feeding neuron ``j`` from input ``i`` is at ``i * nb_neurons + j``) then
  ``bias[nb_neurons]``.
* GRU layer: same header, then ``input_weights[nb_inputs * 3*nb_neurons]``,
  ``recurrent_weights[nb_neurons * 3*nb_neurons]``, ``bias[3*nb_neurons]``.
  The three gate blocks (update z, reset r, candidate h) are interleaved
  along the output axis with stride ``3*nb_neurons`` and offsets 0/n/2n.

Six layers are concatenated: input_dense, vad_gru, noise_gru, denoise_gru,
denoise_output, vad_output — with strict topology validation
(rnn.rs:196-222).

TPU-side representation: weights stay in their *raw int8 integer values* but
as float32 arrays shaped for right-multiplication (``x @ W``); the 1/256
dequantization scale is applied to pre-activations, matching the reference's
arithmetic exactly.  Activations are static Python ints carried in a hashable
``ModelMeta`` so the compute graph can specialize on them at trace time.
"""

from __future__ import annotations

import dataclasses
import importlib.resources
from typing import Tuple

import numpy as np

TANH = 0
SIGMOID = 1
RELU = 2

_ACTIVATION_NAMES = {TANH: "tanh", SIGMOID: "sigmoid", RELU: "relu"}


class ModelParseError(ValueError):
    """Raised when model bytes are malformed, truncated, or topologically invalid."""


@dataclasses.dataclass(frozen=True)
class LayerMeta:
    nb_inputs: int
    nb_neurons: int
    activation: int


@dataclasses.dataclass(frozen=True)
class ModelMeta:
    """Hashable static description of a model (shapes + activations)."""

    input_dense: LayerMeta
    vad_gru: LayerMeta
    noise_gru: LayerMeta
    denoise_gru: LayerMeta
    denoise_output: LayerMeta
    vad_output: LayerMeta


class RnnModel:
    """A parsed model: ``params`` pytree of float32 arrays + static ``meta``.

    ``params`` layout::

        {
          "input_dense":    {"w": (in, n),  "b": (n,)},
          "vad_gru":        {"wi": (in, 3n), "wr": (n, 3n), "b": (3n,)},
          "noise_gru":      {...},
          "denoise_gru":    {...},
          "denoise_output": {"w": (in, n), "b": (n,)},
          "vad_output":     {"w": (in, n), "b": (n,)},
        }
    """

    def __init__(self, params: dict, meta: ModelMeta):
        self.params = params
        self.meta = meta

    # ---- constructors -------------------------------------------------

    @classmethod
    def from_bytes(cls, data: bytes) -> "RnnModel":
        """Parse a ``.rnn`` binary; raises ModelParseError on invalid input."""
        return _parse(np.frombuffer(data, dtype=np.int8))

    @classmethod
    def try_from_bytes(cls, data: bytes):
        """Like :meth:`from_bytes` but returns ``None`` on invalid input,
        mirroring the reference's ``Option``-returning API (rnn.rs:75)."""
        try:
            return cls.from_bytes(data)
        except ModelParseError:
            return None

    # In Python there is no owned-vs-borrowed distinction; the reference's
    # zero-copy constructor (rnn.rs:92, from_static_bytes) maps to the same
    # parse.
    from_static_bytes = from_bytes

    @classmethod
    def from_file(cls, path) -> "RnnModel":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    @classmethod
    def default(cls) -> "RnnModel":
        """The built-in 87,521-byte model shipped with the package."""
        data = (
            importlib.resources.files("nnnoiseless_tpu")
            .joinpath("assets/weights.rnn")
            .read_bytes()
        )
        return cls.from_bytes(data)

    # ---- serialization -------------------------------------------------

    def to_bytes(self) -> bytes:
        """Serialize back to the ``.rnn`` binary format (round-trip exact)."""
        out = []

        def emit_header(m: LayerMeta):
            out.append(
                np.array([m.nb_inputs, m.nb_neurons, m.activation], dtype=np.int8)
            )

        def emit(arr: np.ndarray):
            a = np.asarray(arr, dtype=np.float32).reshape(-1)
            ints = a.astype(np.int64)
            if not np.array_equal(ints.astype(np.float32), a):
                raise ValueError("model weights are not integer-valued int8")
            out.append(ints.astype(np.int8))

        p, m = self.params, self.meta
        for name in ("input_dense",):
            emit_header(getattr(m, name))
            emit(p[name]["w"])
            emit(p[name]["b"])
        for name in ("vad_gru", "noise_gru", "denoise_gru"):
            emit_header(getattr(m, name))
            emit(p[name]["wi"])
            emit(p[name]["wr"])
            emit(p[name]["b"])
        for name in ("denoise_output", "vad_output"):
            emit_header(getattr(m, name))
            emit(p[name]["w"])
            emit(p[name]["b"])
        return b"".join(a.tobytes() for a in out)


def _parse(data: np.ndarray) -> RnnModel:
    pos = 0

    def take(n: int) -> np.ndarray:
        nonlocal pos
        if data.size - pos < n:
            raise ModelParseError("truncated model file")
        out = data[pos : pos + n]
        pos += n
        return out

    def header() -> Tuple[int, int, int]:
        h = take(3)
        nb_inputs, nb_neurons, activation = int(h[0]), int(h[1]), int(h[2])
        if nb_inputs < 0 or nb_neurons < 0:
            raise ModelParseError("negative layer size")
        if activation not in _ACTIVATION_NAMES:
            raise ModelParseError(f"unknown activation {activation}")
        return nb_inputs, nb_neurons, activation

    def dense():
        nb_inputs, nb_neurons, act = header()
        w = take(nb_inputs * nb_neurons).astype(np.float32).reshape(nb_inputs, nb_neurons)
        b = take(nb_neurons).astype(np.float32)
        return {"w": w, "b": b}, LayerMeta(nb_inputs, nb_neurons, act)

    def gru():
        nb_inputs, nb_neurons, act = header()
        wi = (
            take(3 * nb_inputs * nb_neurons)
            .astype(np.float32)
            .reshape(nb_inputs, 3 * nb_neurons)
        )
        wr = (
            take(3 * nb_neurons * nb_neurons)
            .astype(np.float32)
            .reshape(nb_neurons, 3 * nb_neurons)
        )
        b = take(3 * nb_neurons).astype(np.float32)
        return {"wi": wi, "wr": wr, "b": b}, LayerMeta(nb_inputs, nb_neurons, act)

    input_dense, m_id = dense()
    vad_gru, m_vg = gru()
    noise_gru, m_ng = gru()
    denoise_gru, m_dg = gru()
    denoise_output, m_do = dense()
    vad_output, m_vo = dense()

    if pos != data.size:
        raise ModelParseError("trailing bytes after model")

    # Topology validation, identical rules to rnn.rs:196-222.
    if m_id.nb_inputs != 42 or m_do.nb_neurons != 22 or m_vo.nb_neurons != 1:
        raise ModelParseError("bad input/output sizes")
    if m_id.nb_neurons != m_vg.nb_inputs or m_vg.nb_neurons != m_vo.nb_inputs:
        raise ModelParseError("input_dense/vad_gru/vad_output size mismatch")
    if 42 + m_id.nb_neurons + m_vg.nb_neurons != m_ng.nb_inputs:
        raise ModelParseError("noise_gru input size mismatch")
    if 42 + m_vg.nb_neurons + m_ng.nb_neurons != m_dg.nb_inputs:
        raise ModelParseError("denoise_gru input size mismatch")
    if m_dg.nb_neurons != m_do.nb_inputs:
        raise ModelParseError("denoise_output input size mismatch")

    params = {
        "input_dense": input_dense,
        "vad_gru": vad_gru,
        "noise_gru": noise_gru,
        "denoise_gru": denoise_gru,
        "denoise_output": denoise_output,
        "vad_output": vad_output,
    }
    meta = ModelMeta(m_id, m_vg, m_ng, m_dg, m_do, m_vo)
    return RnnModel(params, meta)


def convert_rnnoise(text: str) -> bytes:
    """Convert the 'rnnoise-nu model file version 1' text format to binary.

    Mirrors train/convert_rnnoise.py: integers are taken mod 256 as raw bytes.
    """
    lines = text.split("\n", 1)
    if lines[0].strip() != "rnnoise-nu model file version 1":
        raise ModelParseError("unexpected rnnoise text model header")
    nums = bytearray(int(s) % 256 for s in lines[1].split())
    return bytes(nums)


def quantize_weights(w: np.ndarray) -> np.ndarray:
    """float weights -> int8 values, the dump_rnn.py rule:
    clip(round(256*w), -128, 127)."""
    # np.round is round-half-even; the reference uses Python round() which is
    # also half-even on floats, so this matches.
    return np.clip(np.round(256.0 * np.asarray(w, dtype=np.float64)), -128, 127).astype(
        np.int8
    )
