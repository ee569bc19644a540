"""Parity tests for the TPU STFT/mel pipeline against independent references:

- a direct numpy windowed-DFT implementation (exact math of reference
  stft.py:77-105), and
- a torch conv1d replication of the reference's conv-based STFT, built from
  the published formulas (reference stft.py:42-105, layers.py:42-80).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tacotron2_subword_tpu.ops import stft as tstft


def _np_stft_mag(y, n_fft=1024, hop=256, win=1024):
    """Direct numpy STFT magnitude with reflect pad + periodic hann."""
    pad = n_fft // 2
    ypad = np.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    w = tstft.hann_window(n_fft)
    n_frames = (ypad.shape[1] - n_fft) // hop + 1
    mags = np.empty((y.shape[0], n_fft // 2 + 1, n_frames))
    for b in range(y.shape[0]):
        for t in range(n_frames):
            fr = ypad[b, t * hop:t * hop + n_fft] * w
            spec = np.fft.rfft(fr)
            mags[b, :, t] = np.abs(spec)
    return mags


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(0)
    t = np.arange(22050, dtype=np.float32) / 22050.0
    y = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.randn(22050)
    y = np.clip(y, -1, 1).astype(np.float32)
    return np.stack([y, np.roll(y, 1000)])


def test_stft_magnitude_matches_numpy_dft(wave):
    mag = np.asarray(tstft.stft_magnitude(jnp.asarray(wave), 1024, 256, 1024))
    ref = _np_stft_mag(wave)
    np.testing.assert_allclose(mag, ref, rtol=1e-4, atol=2e-3)


def test_stft_matches_torch_conv_reference(wave):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    # Reference-style conv STFT built from its published formulas.
    n_fft, hop = 1024, 256
    fourier = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    basis = np.vstack([np.real(fourier[:cutoff]), np.imag(fourier[:cutoff])])
    basis = basis * tstft.hann_window(n_fft)[None, :]
    fb = torch.from_numpy(basis[:, None, :].astype(np.float32))
    x = torch.from_numpy(wave).unsqueeze(1)
    x = F.pad(x.unsqueeze(1), (n_fft // 2, n_fft // 2, 0, 0), mode="reflect").squeeze(1)
    out = F.conv1d(x, fb, stride=hop)
    re, im = out[:, :cutoff], out[:, cutoff:]
    ref_mag = torch.sqrt(re ** 2 + im ** 2).numpy()

    mag = np.asarray(tstft.stft_magnitude(jnp.asarray(wave), n_fft, hop, n_fft))
    np.testing.assert_allclose(mag, ref_mag, rtol=1e-3, atol=2e-3)


def test_mel_spectrogram_shape_and_range(wave):
    mel = np.asarray(tstft.mel_spectrogram(jnp.asarray(wave)))
    assert mel.shape == (2, 80, 22050 // 256 + 1)
    # log-compressed with clip 1e-5 → lower bound log(1e-5)
    assert mel.min() >= np.log(1e-5) - 1e-6
    assert np.isfinite(mel).all()


def test_mel_filterbank_properties():
    fb = tstft.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # Each filter has nonzero support and peaks within the 0-8kHz band.
    assert (fb.sum(axis=1) > 0).all()
    freqs = np.linspace(0, 22050 / 2, 513)
    peak_freqs = freqs[fb.argmax(axis=1)]
    assert peak_freqs[0] < 100 and peak_freqs[-1] <= 8000.0
    assert (np.diff(peak_freqs) > 0).all()  # monotone center frequencies


def test_mel_filterbank_matches_slaney_formula():
    """Independent check of a few filter values against the analytic
    triangular form."""
    fb = tstft.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    mel_pts = tstft.mel_to_hz(
        np.linspace(tstft.hz_to_mel(0.0), tstft.hz_to_mel(8000.0), 82))
    freqs = np.linspace(0, 22050 / 2, 513)
    m = 40  # arbitrary middle filter
    lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
    enorm = 2.0 / (hi - lo)
    for k in range(513):
        f = freqs[k]
        if lo < f < ctr:
            expect = (f - lo) / (ctr - lo) * enorm
        elif ctr <= f < hi:
            expect = (hi - f) / (hi - ctr) * enorm
        else:
            expect = 0.0
        np.testing.assert_allclose(fb[m, k], expect, atol=1e-6)


def test_istft_round_trip(wave):
    """transform → inverse should reconstruct the interior of the signal."""
    mag, phase = tstft.stft_magnitude(jnp.asarray(wave), 1024, 256, 1024,
                                      return_phase=True)
    rec = np.asarray(tstft.inverse_stft(mag, phase, 1024, 256, 1024))
    n = min(rec.shape[1], wave.shape[1])
    # Ignore edges where reflect-pad + window taper distort reconstruction.
    sl = slice(1024, n - 1024)
    np.testing.assert_allclose(rec[:, sl], wave[:, sl], atol=5e-3)


def test_griffin_lim_reduces_spectral_error(wave):
    import jax
    mag = tstft.stft_magnitude(jnp.asarray(wave[:1]), 1024, 256, 1024)
    sig = tstft.griffin_lim(mag, 1024, 256, 1024, n_iters=8,
                            key=jax.random.PRNGKey(3))
    mag2 = tstft.stft_magnitude(sig, 1024, 256, 1024)
    m1, m2 = np.asarray(mag), np.asarray(mag2)
    n = min(m1.shape[-1], m2.shape[-1])
    rel = np.abs(m1[..., 2:n - 2] - m2[..., 2:n - 2]).mean() / m1.mean()
    assert rel < 0.35  # phase-recovered spectrum close to target


def test_hifigan_mel_matches_torch_stft(wave):
    """The alternative HiFi-GAN-style mel path must match the reference's
    torch.stft formulation (reference utils.py:55-80)."""
    torch = pytest.importorskip("torch")
    y = wave[:1] / np.abs(wave[:1]).max() * 0.95
    yt = torch.from_numpy(y)
    n_fft, hop, win = 1024, 256, 1024
    pad = (n_fft - hop) // 2
    ypad = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad),
                                   mode="reflect").squeeze(1)
    spec = torch.stft(ypad, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      normalized=False, onesided=True, return_complex=True)
    mag = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    fb = torch.from_numpy(tstft.mel_filterbank(22050, n_fft, 80, 0.0,
                                               8000.0))
    ref = torch.log(torch.clamp(fb @ mag, min=1e-5)).numpy()

    out = np.asarray(tstft.hifigan_mel_spectrogram(
        jnp.asarray(wave[:1]), peak_normalize=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


def test_inv_mel_spec_roundtrip(wave):
    """mel → inv_mel_spec → audio whose mel is close to the input mel
    (the reference's Audio.tools.inv_mel_spec path)."""
    import jax
    mel = tstft.mel_spectrogram(jnp.asarray(wave[:1, :8192]))
    wav = tstft.inv_mel_spec(mel, griffin_iters=8,
                             key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(wav)).all()
    mel2 = tstft.mel_spectrogram(jnp.clip(wav, -1, 1))
    n = min(mel.shape[-1], mel2.shape[-1])
    corr = np.corrcoef(np.asarray(mel)[0, :, 2:n - 2].ravel(),
                       np.asarray(mel2)[0, :, 2:n - 2].ravel())[0, 1]
    assert corr > 0.85
