"""Evaluation metric tests: DTW, F0, MCD, silence trim, SSIM."""

import numpy as np
import pytest

from tacotron2_subword_tpu.eval import metrics as E


def test_dtw_identity():
    x = np.random.RandomState(0).randn(10, 3)
    d, px, py = E.dtw_path(x, x)
    assert d < 1e-6
    np.testing.assert_array_equal(px, py)


def test_dtw_known_alignment():
    # y is x with one repeated frame: DTW should absorb it at zero cost
    x = np.asarray([[0.0], [1.0], [2.0], [3.0]])
    y = np.asarray([[0.0], [1.0], [1.0], [2.0], [3.0]])
    d, px, py = E.dtw_path(x, y)
    assert d < 1e-6
    assert len(px) == len(py) >= 5


def test_dtw_monotone_path():
    rng = np.random.RandomState(1)
    d, px, py = E.dtw_path(rng.randn(8, 2), rng.randn(12, 2))
    assert (np.diff(px) >= 0).all() and (np.diff(py) >= 0).all()
    assert px[0] == 0 and py[0] == 0
    assert px[-1] == 7 and py[-1] == 11


def test_f0_on_sine():
    fs = 16000
    t = np.arange(fs) / fs
    for freq in [110.0, 220.0, 440.0]:
        wav = np.sin(2 * np.pi * freq * t).astype(np.float32)
        f0 = E.estimate_f0(wav, fs)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        assert abs(np.median(voiced) - freq) / freq < 0.05


def test_f0_silence_is_unvoiced():
    f0 = E.estimate_f0(np.zeros(16000, np.float32), 16000)
    assert (f0 == 0).all()


def test_mcd_identical_is_zero():
    fs = 16000
    t = np.arange(fs) / fs
    wav = (np.sin(2 * np.pi * 200 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
           ).astype(np.float32)
    mcd = E.mcd_between_wavs(wav, wav, fs)
    assert mcd is not None and mcd < 1e-6


def test_mcd_orders_similarity():
    """MCD must rank a lightly-perturbed copy closer than a spectrally
    different signal.  Harmonic-rich signals (log spectra of pure tones are
    dominated by near-zero bins and rank unreliably)."""
    fs = 16000
    t = np.arange(fs) / fs

    def harmonics(f0, tilt):
        sig = sum((1.0 / (k ** tilt)) * np.sin(2 * np.pi * f0 * k * t)
                  for k in range(1, 20))
        return (sig / np.abs(sig).max()).astype(np.float32)

    a = harmonics(150, 1.0)
    a_similar = 0.9 * harmonics(150, 1.1)
    b = harmonics(260, 2.5)
    mcd_close = E.mcd_between_wavs(a, a_similar, fs)
    mcd_far = E.mcd_between_wavs(a, b, fs)
    assert mcd_close < mcd_far


def test_trim_silence():
    fs = 22050
    sig = np.concatenate([
        np.zeros(fs // 2, np.float32),
        0.5 * np.sin(2 * np.pi * 220 * np.arange(fs) / fs).astype(np.float32),
        np.zeros(fs // 4, np.float32)])
    trimmed, start, end = E.trim_silence(sig, fs=fs)
    assert abs(start - fs // 2) < fs * 0.02
    assert abs((len(sig) - end) - fs // 4) < fs * 0.02
    # all-silence input
    empty, s, e = E.trim_silence(np.zeros(fs, np.float32), fs=fs)
    assert len(empty) == 0


def test_ssim_basics():
    import jax.numpy as jnp
    from tacotron2_subword_tpu.ops.ssim import ssim
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 1, 32, 32).astype(np.float32))
    assert float(ssim(img, img)) > 0.99
    other = jnp.asarray(rng.rand(2, 1, 32, 32).astype(np.float32))
    assert float(ssim(img, other)) < 0.5


def _harmonics(f0, tilt, fs=16000, n=20):
    t = np.arange(fs) / fs
    sig = sum((1.0 / (k ** tilt)) * np.sin(2 * np.pi * f0 * k * t)
              for k in range(1, n))
    return (sig / np.abs(sig).max()).astype(np.float32)


def test_mcd_monotone_in_noise():
    """Known-degraded pairs must score strictly worse as degradation grows —
    the property the checkpoint-sweep quality ledger relies on (the
    reference's acceptance metric, best_checkpoint.py:386-420)."""
    fs = 16000
    a = _harmonics(150, 1.0)
    noise = np.random.RandomState(7).randn(len(a)).astype(np.float32)
    mcds = [E.mcd_between_wavs(a, (a + lvl * noise) / (1 + lvl), fs)
            for lvl in (0.003, 0.01, 0.03, 0.1)]
    assert all(m is not None for m in mcds)
    assert all(b > a_ for a_, b in zip(mcds, mcds[1:])), mcds


def test_mcd_time_shift_worse_than_identical():
    fs = 16000
    a = _harmonics(150, 1.0)
    shift = int(0.013 * fs)  # 13 ms — off the 5 ms frame grid
    shifted = np.concatenate([np.zeros(shift, np.float32), a])[:len(a)]
    assert E.mcd_between_wavs(a, a, fs) < 1e-6
    assert E.mcd_between_wavs(a, shifted, fs) > 1.0


def test_metric_golden_values():
    """Pinned outputs of the native F0/MCEP/MCD path on deterministic
    signals: any numerical change to the pipeline (window, warp, lifter,
    floor, DCT, voicing) trips this before it can silently skew a quality
    ledger.  Values re-pinned in round 4 when the envelope gained
    CheapTrick-style liftering + the -60 dB floor."""
    fs = 16000
    a = _harmonics(150, 1.0)
    b = _harmonics(260, 2.5)
    mcep, f0 = E.mel_cepstrum(a, fs)
    assert mcep.shape == (188, 24)
    np.testing.assert_allclose(float(np.median(f0[f0 > 0])), 149.533,
                               rtol=1e-2)
    np.testing.assert_allclose(
        mcep[0, :4], [-16.4593, 21.6002, -1.9289, 1.2117], rtol=1e-2)
    np.testing.assert_allclose(E.mcd_between_wavs(a, b, fs), 102.433,
                               rtol=1e-2)


def test_mcd_perturbation_far_below_random_pair():
    """The round-3 verdict's metric sanity check: MCD(x, x+eps) must be
    FAR smaller than MCD(random pair).  Before the -60 dB envelope floor
    this FAILED (588 vs 388): digitally-silent bands contributed a huge
    constant offset as soon as any noise floor filled them, which is what
    flattened the round-3 wav-level checkpoint ledger."""
    fs = 16000
    a = _harmonics(150, 1.0)
    b = _harmonics(260, 2.5)
    eps = a + 0.002 * np.random.RandomState(11).randn(len(a)) \
        .astype(np.float32)
    mcd_eps = E.mcd_between_wavs(a, eps, fs)
    mcd_pair = E.mcd_between_wavs(a, b, fs)
    assert mcd_eps < 0.1 * mcd_pair, (mcd_eps, mcd_pair)


def test_mcd_evaluates_at_16k_regardless_of_input_rate():
    """The reference always evaluates MCD at 16 kHz (librosa.load(
    sr=16000), evaluation.py:75-76); inputs at the 22.05 kHz synthesis
    rate must be resampled, not analyzed at their native rate."""
    fs = 16000
    a = _harmonics(150, 1.0)
    b = _harmonics(260, 2.5)
    ref = E.mcd_between_wavs(a, b, fs)
    a22 = E.resample_to(a, 16000, 22050)
    b22 = E.resample_to(b, 16000, 22050)
    got = E.mcd_between_wavs(a22, b22, fs=22050)
    np.testing.assert_allclose(got, ref, rtol=2e-2)
