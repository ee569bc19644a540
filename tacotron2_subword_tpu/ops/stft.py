"""STFT / inverse STFT / mel spectrogram as TPU-native JAX ops.

The reference computes its STFT as a strided conv1d against a precomputed
windowed Fourier basis (reference stft.py:42-141) and the mel transform as a
matmul against a librosa (slaney-normalised) mel filterbank followed by a
log dynamic-range compression (reference layers.py:42-80,
audio_processing.py:78-93).  On TPU the natural formulation of the same math
is: frame the padded signal, then run ONE large matmul of the frame matrix
against the windowed Fourier basis — this lands directly on the MXU and XLA
fuses the magnitude/mel/log epilogue into it.  The inverse STFT is the
transposed form, expressed with ``lax.conv_transpose`` (overlap-add), with
the librosa-0.6 window-sum-square correction (reference
audio_processing.py:7-56).

All host-side constant precomputation (bases, filterbanks, window envelopes)
is numpy and cached; everything on the hot path is jit-able jnp with static
shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side constant precomputation (numpy, cached)
# ---------------------------------------------------------------------------

def hann_window(win_length: int, dtype=np.float64) -> np.ndarray:
    """Periodic Hann window, identical to scipy.signal.get_window('hann', n,
    fftbins=True) used by the reference (stft.py:66)."""
    n = np.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def _padded_window(filter_length: int, win_length: int) -> np.ndarray:
    """Hann window zero-center-padded to filter_length (librosa pad_center)."""
    assert filter_length >= win_length
    w = hann_window(win_length)
    lpad = (filter_length - win_length) // 2
    out = np.zeros(filter_length)
    out[lpad:lpad + win_length] = w
    return out


@functools.lru_cache(maxsize=None)
def stft_bases(filter_length: int, hop_length: int, win_length: int,
               window: str = "hann"):
    """Windowed forward/inverse Fourier bases.

    Matches reference stft.py:52-75: forward basis rows are
    [Re(F); Im(F)] of the DFT matrix (cutoff = n//2+1 rows each), times the
    padded window; the inverse basis is the windowed pseudo-inverse of
    ``scale * fourier_basis``.

    Returns (forward_basis [2*cutoff, filter_length],
             inverse_basis [2*cutoff, filter_length]) as float32.
    """
    scale = filter_length / hop_length
    fourier = np.fft.fft(np.eye(filter_length))
    cutoff = filter_length // 2 + 1
    basis = np.vstack([np.real(fourier[:cutoff]), np.imag(fourier[:cutoff])])
    inverse = np.linalg.pinv(scale * basis).T  # [2*cutoff, filter_length]
    if window is not None:
        if window != "hann":
            raise NotImplementedError(f"window={window!r}")
        w = _padded_window(filter_length, win_length)
        fwd = basis * w[None, :]
        inv = inverse * w[None, :]
    else:
        fwd, inv = basis, inverse
    return fwd.astype(np.float32), inv.astype(np.float32)


@functools.lru_cache(maxsize=None)
def window_sumsquare(n_frames: int, filter_length: int, hop_length: int,
                     win_length: int) -> np.ndarray:
    """Sum-square Hann envelope at the given hop (librosa 0.6 semantics,
    reference audio_processing.py:7-56).  Shape [filter_length + hop*(n-1)]."""
    n = filter_length + hop_length * (n_frames - 1)
    x = np.zeros(n)
    win_sq = hann_window(win_length)
    win_sq = (win_sq / np.max(np.abs(win_sq))) ** 2  # librosa normalize(inf-norm)
    lpad = (filter_length - win_length) // 2
    padded = np.zeros(filter_length)
    padded[lpad:lpad + win_length] = win_sq
    for i in range(n_frames):
        s = i * hop_length
        x[s:min(n, s + filter_length)] += padded[:max(0, min(filter_length, n - s))]
    return x.astype(np.float32)


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    """Slaney mel→Hz (librosa default, htk=False)."""
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                     freqs)
    return freqs


def hz_to_mel(freqs: np.ndarray) -> np.ndarray:
    """Slaney Hz→mel (librosa default, htk=False)."""
    freqs = np.asarray(freqs, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freqs / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freqs >= min_log_hz
    with np.errstate(divide="ignore"):
        mels = np.where(log_t,
                        min_log_mel + np.log(np.maximum(freqs, 1e-10) / min_log_hz) / logstep,
                        mels)
    return mels


@functools.lru_cache(maxsize=None)
def mel_filterbank(sampling_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: float) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank [n_mels, n_fft//2+1],
    numerically identical to librosa.filters.mel(sr, n_fft, n_mels, fmin,
    fmax) as used by the reference (layers.py:50-51)."""
    fftfreqs = np.linspace(0, sampling_rate / 2, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Device-side ops (jit-able, static shapes)
# ---------------------------------------------------------------------------

def frame_signal(y: jnp.ndarray, filter_length: int, hop_length: int) -> jnp.ndarray:
    """Reflect-pad by filter_length//2 on both sides (librosa/reference
    stft.py:84-89) and cut into hop-strided frames.

    y: [B, T] → frames [B, n_frames, filter_length] where
    n_frames = T // hop + 1.
    """
    pad = filter_length // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (y.shape[1] - filter_length) // hop_length + 1
    # Gather-free framing: as_strided is unavailable in JAX; use a reshape
    # trick via dynamic slices is O(n_frames) — instead build index matrix
    # once (static) and use a single take along axis.
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(filter_length)[None, :])
    return y[:, idx]


def stft_magnitude(y: jnp.ndarray, filter_length: int, hop_length: int,
                   win_length: int, return_phase: bool = False):
    """Forward STFT magnitude (and optionally phase) of [B, T] → [B, cutoff,
    n_frames].  One MXU matmul: frames @ forward_basis^T."""
    fwd, _ = stft_bases(filter_length, hop_length, win_length)
    frames = frame_signal(y, filter_length, hop_length)  # [B, F, N]
    basis = jnp.asarray(fwd)  # [2*cutoff, N]
    spec = jnp.einsum("bfn,kn->bkf", frames, basis,
                      preferred_element_type=jnp.float32)
    cutoff = filter_length // 2 + 1
    real, imag = spec[:, :cutoff], spec[:, cutoff:]
    mag = jnp.sqrt(real * real + imag * imag)
    if return_phase:
        return mag, jnp.arctan2(imag, real)
    return mag


def inverse_stft(magnitude: jnp.ndarray, phase: jnp.ndarray,
                 filter_length: int, hop_length: int,
                 win_length: int) -> jnp.ndarray:
    """Inverse STFT via transposed conv (overlap-add), matching reference
    stft.py:107-136 including the window-sum-square correction and edge
    trimming.  magnitude/phase: [B, cutoff, n_frames] → [B, T]."""
    _, inv = stft_bases(filter_length, hop_length, win_length)
    n_frames = magnitude.shape[-1]
    recomb = jnp.concatenate([magnitude * jnp.cos(phase),
                              magnitude * jnp.sin(phase)], axis=1)
    # conv_transpose over the frame axis: treat [B, n_frames, 2*cutoff] as
    # NHC with spatial=frames, and the basis as [kernel=filter_length taps?]
    # — express overlap-add directly instead: out[t*hop + n] += sum_k
    # recomb[k, t] * inv[k, n].
    contrib = jnp.einsum("bkf,kn->bfn", recomb, jnp.asarray(inv),
                         preferred_element_type=jnp.float32)
    out_len = filter_length + hop_length * (n_frames - 1)
    # Overlap-add as a transposed conv: lax.conv_transpose with stride hop.
    # [B, F, N] -> treat N as channels? Simplest robust path: scatter-add.
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(filter_length)[None, :]).reshape(-1)
    sig = jnp.zeros((contrib.shape[0], out_len), contrib.dtype)
    sig = sig.at[:, idx].add(contrib.reshape(contrib.shape[0], -1))

    wss = window_sumsquare(n_frames, filter_length, hop_length, win_length)
    tiny = np.finfo(np.float32).tiny
    correction = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0)
    sig = sig * jnp.asarray(correction)[None, :]
    sig = sig * (float(filter_length) / hop_length)
    pad = filter_length // 2
    return sig[:, pad:-pad]


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0,
                              clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, clip_val) * C) — reference audio_processing.py:78-84."""
    return jnp.log(jnp.maximum(x, clip_val) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0) -> jnp.ndarray:
    return jnp.exp(x) / C


def mel_spectrogram(y: jnp.ndarray, sampling_rate: int = 22050,
                    filter_length: int = 1024, hop_length: int = 256,
                    win_length: int = 1024, n_mel_channels: int = 80,
                    mel_fmin: float = 0.0, mel_fmax: float = 8000.0) -> jnp.ndarray:
    """[B, T] waveform in [-1, 1] → [B, n_mels, n_frames] log-mel, matching
    reference layers.py:63-80 (TacotronSTFT.mel_spectrogram)."""
    mag = stft_magnitude(y, filter_length, hop_length, win_length)
    mel_fb = jnp.asarray(mel_filterbank(sampling_rate, filter_length,
                                        n_mel_channels, mel_fmin, mel_fmax))
    mel = jnp.einsum("mk,bkf->bmf", mel_fb, mag,
                     preferred_element_type=jnp.float32)
    return dynamic_range_compression(mel)


def inv_mel_spec(mel: jnp.ndarray, sampling_rate: int = 22050,
                 filter_length: int = 1024, hop_length: int = 256,
                 win_length: int = 1024, mel_fmin: float = 0.0,
                 mel_fmax: float = 8000.0, griffin_iters: int = 60,
                 scaling: float = 1000.0, key=None) -> jnp.ndarray:
    """log-mel [B, n_mels, T] → waveform via filterbank pseudo-inverse +
    Griffin-Lim (the reference's Audio.tools.inv_mel_spec, Audio/
    tools.py:45-61, including the spec_from_mel_scaling=1000 factor)."""
    n_mels = mel.shape[1]
    fb = mel_filterbank(sampling_rate, filter_length, n_mels, mel_fmin,
                        mel_fmax)
    inv_fb = jnp.asarray(np.linalg.pinv(fb))
    spec = jnp.einsum("km,bmt->bkt", inv_fb,
                      dynamic_range_decompression(mel),
                      preferred_element_type=jnp.float32)
    spec = jnp.maximum(spec, 1e-8) * scaling
    wav = griffin_lim(spec, filter_length, hop_length, win_length,
                      n_iters=griffin_iters, key=key)
    return wav / scaling


def hifigan_mel_spectrogram(y: jnp.ndarray, n_fft: int = 1024,
                            num_mels: int = 80, sampling_rate: int = 22050,
                            hop_size: int = 256, win_size: int = 1024,
                            fmin: float = 0.0, fmax: float = 8000.0,
                            peak_normalize: bool = True) -> jnp.ndarray:
    """The reference's alternative HiFi-GAN-style mel path (reference
    utils.py:55-80): peak-normalize * 0.95, reflect pad (n_fft-hop)/2,
    center=False torch.stft, sqrt(|.|^2 + 1e-9) magnitude, mel + log clip.

    Differs from ``mel_spectrogram`` (the TacotronSTFT path) in padding
    amount, frame count, and the +1e-9 magnitude floor.  y: [B, T]."""
    if peak_normalize:
        peak = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        y = y / jnp.maximum(peak, 1e-9) * 0.95
    pad = (n_fft - hop_size) // 2
    ypad = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (ypad.shape[1] - n_fft) // hop_size + 1
    idx = (np.arange(n_frames)[:, None] * hop_size
           + np.arange(n_fft)[None, :])
    frames = ypad[:, idx]
    fwd, _ = stft_bases(n_fft, hop_size, win_size)
    spec = jnp.einsum("bfn,kn->bkf", frames, jnp.asarray(fwd),
                      preferred_element_type=jnp.float32)
    cutoff = n_fft // 2 + 1
    real, imag = spec[:, :cutoff], spec[:, cutoff:]
    mag = jnp.sqrt(real * real + imag * imag + 1e-9)
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin,
                                    fmax))
    return dynamic_range_compression(
        jnp.einsum("mk,bkf->bmf", fb, mag,
                   preferred_element_type=jnp.float32))


def griffin_lim(magnitudes: jnp.ndarray, filter_length: int, hop_length: int,
                win_length: int, n_iters: int = 30,
                key: jax.Array | None = None) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction (reference audio_processing.py:59-75).
    magnitudes: [B, cutoff, n_frames] linear magnitude → [B, T] signal."""
    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, magnitudes.shape, minval=-np.pi,
                                maxval=np.pi, dtype=jnp.float32)

    def body(_, carry):
        signal = inverse_stft(magnitudes, carry, filter_length, hop_length,
                              win_length)
        _, ang = stft_magnitude(signal, filter_length, hop_length, win_length,
                                return_phase=True)
        return ang

    angles = jax.lax.fori_loop(0, n_iters, body, angles)
    return inverse_stft(magnitudes, angles, filter_length, hop_length,
                        win_length)
