from tacotron2_subword_tpu.ops.stft import (
    dynamic_range_compression,
    dynamic_range_decompression,
    griffin_lim,
    inverse_stft,
    mel_filterbank,
    mel_spectrogram,
    stft_magnitude,
)

__all__ = [
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "griffin_lim",
    "inverse_stft",
    "mel_filterbank",
    "mel_spectrogram",
    "stft_magnitude",
]
