"""Generate a synthetic-but-LEARNABLE TTS dataset in the reference's exact
on-disk format, for end-to-end training/eval runs without real speech data.

Format produced (matches reference data_utils.py:48-86 and our
data/dataset.py BertTacotron2Dataset):
  {out}/mels/ljspeech-mel-%05d.npy      [80, T] log-mel  (index+1)
  {out}/sub/{i}.npy                     subword token IDs
  {out}/cls/{i}.npy                     768-d "CLS" vector
  {out}/durations/{i}.npy               [T_text, 2]: col 0 phone IDs,
                                        col 1 per-phone durations
  {out}/train.txt, {out}/val.txt        rows "wav_placeholder|{durations}"

The mapping is deterministic text→mel so a correct model can actually learn
it: each phone ID has a fixed spectral template (a Gaussian bump over mel
channels at a phone-specific center, with a phone-specific duration); an
utterance's mel is the concatenation of its phones' templates plus a small
amount of noise; the "CLS" vector encodes a per-utterance global offset
(pitch-like shift) so the model must use the conditioning path; subword IDs
are a deterministic function of phone bigrams (so the second stream carries
real information).

Usage: python tools/make_synthetic_dataset.py --out /tmp/synth_data \
          --n-train 256 --n-val 32 [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

N_PHONES = 64          # phone IDs drawn from [3, 3+N_PHONES)
SUB_VOCAB = 512        # subword IDs from phone bigram hash
MEL_CHANNELS = 80
CLS_DIM = 768


def phone_template(p: int, shift: float) -> np.ndarray:
    """[80, dur] spectral template for phone p, shifted by the utterance's
    global CLS-encoded offset."""
    rng = np.random.RandomState(1000 + p)
    center = 6.0 + (p * 1.13 % 1.0) * 60.0 + shift
    width = 2.0 + (p % 7)
    dur = 2 + (p % 5)
    ch = np.arange(MEL_CHANNELS)[:, None]
    envelope = np.exp(-0.5 * ((ch - center) / width) ** 2)
    # slight within-phone time structure
    t = np.linspace(0, 1, dur)[None, :]
    tex = 1.0 + 0.2 * np.sin(2 * np.pi * (1 + p % 3) * t)
    level = 0.5 + 0.5 * rng.rand()
    return np.log(np.maximum(level * envelope * tex, 1e-5)), dur


def make_utterance(rng: np.random.RandomState):
    n = rng.randint(8, 24)
    phones = rng.randint(3, 3 + N_PHONES, n).astype(np.int32)
    # CLS encodes a global spectral shift in [-6, 6] channels
    shift = float(rng.uniform(-6, 6))
    cls = np.zeros(CLS_DIM, np.float32)
    cls[: 64] = shift / 6.0
    cls[64:128] = rng.randn(64) * 0.01  # distractor noise
    segs, durs = [], []
    for p in phones:
        tpl, d = phone_template(int(p), shift)
        segs.append(tpl)
        durs.append(d)
    mel = np.concatenate(segs, axis=1)
    mel = mel + rng.randn(*mel.shape).astype(np.float32) * 0.02
    durations = np.stack([phones, np.asarray(durs, np.int32)], axis=1)
    # subword IDs: phone-bigram hash, one per non-overlapping pair
    pairs = phones[: (n // 2) * 2].reshape(-1, 2)
    sub = ((pairs[:, 0] * 131 + pairs[:, 1] * 7) % (SUB_VOCAB - 3) + 3
           ).astype(np.int32)
    return phones, durations, sub, cls, mel.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    for split, n, off in (("train", args.n_train, 0),
                          ("val", args.n_val, args.n_train)):
        base = os.path.join(args.out, split)
        for d in ("mels", "sub", "cls", "durations"):
            os.makedirs(os.path.join(base, d), exist_ok=True)
        rows = []
        for i in range(n):
            rng = np.random.RandomState(args.seed * 999983 + off + i)
            phones, durations, sub, cls, mel = make_utterance(rng)
            np.save(os.path.join(base, "mels", f"ljspeech-mel-{i+1:05d}.npy"),
                    mel)
            np.save(os.path.join(base, "sub", f"{i}.npy"), sub)
            np.save(os.path.join(base, "cls", f"{i}.npy"), cls)
            dur_path = os.path.join(base, "durations", f"{i}.npy")
            np.save(dur_path, durations)
            rows.append(f"placeholder_{i}.wav|{dur_path}")
        with open(os.path.join(args.out, f"{split}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
        print(f"{split}: {n} utterances under {base}")


if __name__ == "__main__":
    main()
