"""Speech feature processors (reference nm/processors/speech.py):
module-path parity re-exports; the feature extraction itself lives in
readers/audio_reader.py (pure-numpy log-mel/MFCC)."""

from ..readers.audio_reader import (audio_reader, log_mel_features,
                                    mfcc_features)

__all__ = ["audio_reader", "log_mel_features", "mfcc_features"]
