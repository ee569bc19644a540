"""Vocoder bias removal (denoiser).

Re-implements the reference's hifiganBiasRemover / waveglowBiasRemover
(reference bias_remover.py:6-74, waveglow/denoiser.py): synthesize audio
from an all-zero (or random) mel, take its STFT magnitude at hop
filter_length/4, keep the first frame as the "bias spectrum", and at
denoise time subtract ``strength * bias`` from the magnitude (clamped at 0)
before inverting the STFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu.ops import stft as S

FILTER_LENGTH = 1024
N_OVERLAP = 4
WIN_LENGTH = 1024
HOP = FILTER_LENGTH // N_OVERLAP


def compute_bias_spec(vocoder_fn, *, mode: str = "zeros",
                      n_mel_channels: int = 80, n_frames: int = 88,
                      key=None) -> jnp.ndarray:
    """vocoder_fn: mel [1, n_mels, T] → audio [1, T'] (or [1, 1, T']).
    Returns bias spectrum [1, cutoff, 1]."""
    if mode == "zeros":
        mel = jnp.zeros((1, n_mel_channels, n_frames))
    elif mode == "normal":
        mel = jax.random.normal(key or jax.random.PRNGKey(0),
                                (1, n_mel_channels, n_frames))
    else:
        raise ValueError(f"mode {mode!r} not supported")
    audio = vocoder_fn(mel)
    if audio.ndim == 3:
        audio = audio[:, 0, :]
    bias_spec = S.stft_magnitude(audio, FILTER_LENGTH, HOP, WIN_LENGTH)
    return bias_spec[:, :, 0][:, :, None]


def denoise(audio: jnp.ndarray, bias_spec: jnp.ndarray,
            strength: float = 0.1) -> jnp.ndarray:
    """audio [B, T] → denoised [B, T] (reference bias_remover.py:31-36;
    strength 0.9 for HiFi-GAN, 0.01 for WaveGlow at inference,
    reference inference.py:202)."""
    spec, angles = S.stft_magnitude(audio, FILTER_LENGTH, HOP, WIN_LENGTH,
                                    return_phase=True)
    spec = jnp.maximum(spec - bias_spec * strength, 0.0)
    return S.inverse_stft(spec, angles, FILTER_LENGTH, HOP, WIN_LENGTH)
