"""Standalone MCD / soft-DTW evaluation CLIs (reference evaluation.py:
106-117 and softdtw.py:75-97): compare synthesized wavs in a benchmark dir
against ground-truth wavs of the same basename.

    python -m tacotron2_subword_tpu.apps.evaluation mcd \
        --benchmark benchmark --gt-dir data/vi_dataset/wav
    python -m tacotron2_subword_tpu.apps.evaluation softdtw \
        --benchmark benchmark --gt-dir data/vi_dataset/wav
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def _load_wav(path: str, target_sr: int = None):
    from scipy.io.wavfile import read
    sr, data = read(path)
    wav = data.astype(np.float32)
    if data.dtype == np.int16:
        wav = wav / 32768.0
    if target_sr and sr != target_sr:
        from tacotron2_subword_tpu.eval.metrics import resample_to
        wav = resample_to(wav, sr, target_sr).astype(np.float32)
        sr = target_sr
    return wav, sr


def eval_mcd(args) -> float:
    from tacotron2_subword_tpu.eval import mcd_between_wavs
    mcds = []
    for infer_path in sorted(glob.glob(os.path.join(args.benchmark,
                                                    "*.wav"))):
        gt_path = os.path.join(args.gt_dir, os.path.basename(infer_path))
        if not os.path.exists(gt_path):
            continue
        src, _ = _load_wav(gt_path, 16000)   # reference evaluates at 16 kHz
        trg, _ = _load_wav(infer_path, 16000)
        mcd = mcd_between_wavs(src, trg, fs=16000)
        if mcd is not None:
            mcds.append(float(mcd))
            print(f"{os.path.basename(infer_path)}: {mcd:.3f}")
    mean = float(np.mean(mcds)) if mcds else float("nan")
    print("Process MCD for GroundTruth and testset")
    print(mean)
    return mean


def eval_softdtw(args) -> float:
    import jax.numpy as jnp
    from tacotron2_subword_tpu.ops import softdtw as SD
    from tacotron2_subword_tpu.ops import stft as S
    vals = []
    for infer_path in sorted(glob.glob(os.path.join(args.benchmark,
                                                    "*.wav"))):
        gt_path = os.path.join(args.gt_dir, os.path.basename(infer_path))
        if not os.path.exists(gt_path):
            continue
        gt, _ = _load_wav(gt_path, 22050)
        syn, _ = _load_wav(infer_path, 22050)
        mel_gt = S.mel_spectrogram(jnp.asarray(np.clip(gt, -1, 1)[None]))
        mel_syn = S.mel_spectrogram(jnp.asarray(np.clip(syn, -1, 1)[None]))
        d = SD.softdtw_distance(jnp.swapaxes(mel_syn, 1, 2),
                                jnp.swapaxes(mel_gt, 1, 2))
        vals.append(float(d[0]))
        print(f"{os.path.basename(infer_path)}: {vals[-1]:.3f}")
    mean = float(np.mean(vals)) if vals else float("nan")
    print("Mean soft-DTW:", mean)
    return mean


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("metric", choices=["mcd", "softdtw"])
    p.add_argument("--benchmark", default="benchmark")
    p.add_argument("--gt-dir", required=True)
    args = p.parse_args()
    if args.metric == "mcd":
        eval_mcd(args)
    else:
        eval_softdtw(args)


if __name__ == "__main__":
    main()
