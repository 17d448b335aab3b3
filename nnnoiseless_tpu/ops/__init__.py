"""TPU-native DSP/NN primitive ops (JAX/XLA; Pallas kernels in kernels/)."""

from .activations import relu, sigmoid_approx, tansig_approx  # noqa: F401
from .bands import band_corr, dct22, interp_band_gain  # noqa: F401
from .biquad import biquad_filter  # noqa: F401
from .fft import forward_transform, inverse_transform  # noqa: F401
