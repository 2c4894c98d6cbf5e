"""TPU-native primitive ops: convs, norms, activations, STFT, recurrences."""
from . import activations, normalizations, conv, stft  # noqa: F401
