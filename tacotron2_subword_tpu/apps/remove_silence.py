"""Leading/trailing silence trimming CLI (reference remove_silence.py:7-35,
pydub-free).

    python -m tacotron2_subword_tpu.apps.remove_silence \
        --in-dir Outdir/demo/audio --out-dir benchmark
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--threshold-dbfs", type=float, default=-50.0)
    args = p.parse_args()

    from scipy.io.wavfile import read, write
    from tacotron2_subword_tpu.eval import trim_silence
    os.makedirs(args.out_dir, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.in_dir, "*.wav"))):
        sr, data = read(path)
        wav = data.astype(np.float32)
        if data.dtype == np.int16:
            wav = wav / 32768.0
        trimmed, start, end = trim_silence(wav, args.threshold_dbfs, fs=sr)
        out = os.path.join(args.out_dir, os.path.basename(path))
        write(out, sr, (np.clip(trimmed, -1, 1) * 32767).astype(np.int16))
        print(f"{os.path.basename(path)}: trimmed "
              f"{start / sr:.2f}s head, {(len(wav) - end) / sr:.2f}s tail")


if __name__ == "__main__":
    main()
