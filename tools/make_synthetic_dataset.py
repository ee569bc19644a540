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

--from-text mode: instead of random phone IDs, each utterance is a real
(randomly composed) Vietnamese sentence run through the ACTUAL text
front-end — NFKC-lowercase → G2P (native/g2p_fst over the reference
lexicon) → phone IDs, subword IDs via the same deterministic crc32 fallback
apps/inference.py uses, zero CLS — so a model trained on this corpus is
in-distribution for raw-text inference through apps/inference.py /
apps/best_checkpoint.py (the reference's inference.py:342-375 path).
Writes {split}_text.txt ("id|sentence") next to train.txt, and with
--write-val-wavs renders the val ground-truth mels to 22050 Hz wavs via
Griffin-Lim for the audio-domain checkpoint sweep.
"""

from __future__ import annotations

import argparse
import os
import sys
import unicodedata

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def load_syllables(lexicon_path: str, limit: int = 4000):
    """First column of the reference lexicon — the Vietnamese syllable
    inventory the sentences are composed from."""
    sylls = []
    with open(lexicon_path, encoding="utf-8") as f:
        for line in f:
            w = line.split()[0] if line.strip() else ""
            if w and all(not c.isdigit() for c in w):
                sylls.append(w)
            if len(sylls) >= limit:
                break
    return sylls


def make_text_utterance(rng, sylls, t2s, sub_vocab: int):
    """Real text → real front-end → synthetic-template mel."""
    from tacotron2_subword_tpu.text.bert import hashed_subword_ids

    n_words = rng.randint(4, 11)
    text = " ".join(sylls[rng.randint(len(sylls))] for _ in range(n_words))
    norm = unicodedata.normalize("NFKC", text).lower()
    phones = np.asarray(t2s.grapheme_to_sequence(norm), np.int32)
    sub = hashed_subword_ids(norm, sub_vocab)
    cls = np.zeros(CLS_DIM, np.float32)  # = the inference-time fallback
    segs, durs = [], []
    for p in phones:
        tpl, d = phone_template(int(p), 0.0)
        segs.append(tpl)
        durs.append(d)
    mel = np.concatenate(segs, axis=1)
    mel = mel + rng.randn(*mel.shape).astype(np.float32) * 0.02
    durations = np.stack([phones, np.asarray(durs, np.int32)], axis=1)
    return text, phones, durations, sub, cls, mel.astype(np.float32)


def griffin_lim_wav(mel: np.ndarray) -> np.ndarray:
    """Ground-truth mel → 22050 Hz float wav via the same Griffin-Lim
    pipeline apps/inference.py uses without a vocoder checkpoint."""
    import jax
    import jax.numpy as jnp
    from tacotron2_subword_tpu.ops import stft as S

    fb = S.mel_filterbank(22050, 1024, mel.shape[0], 0.0, 8000.0)
    inv_fb = jnp.asarray(np.linalg.pinv(fb))
    spec = jnp.einsum("km,mt->kt", inv_fb,
                      S.dynamic_range_decompression(jnp.asarray(mel)))
    spec = jnp.maximum(spec, 1e-8) * 1000.0
    wav = S.griffin_lim(spec[None], 1024, 256, 1024, n_iters=30,
                        key=jax.random.PRNGKey(0)) / 1000.0
    return np.asarray(wav[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--from-text", action="store_true",
                    help="compose real Vietnamese sentences and run the "
                         "actual G2P front-end for phone IDs")
    ap.add_argument("--lexicon", default=(
        "/root/reference/resources/"
        "all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt"))
    ap.add_argument("--sub-vocab", type=int, default=SUB_VOCAB,
                    help="must match the sub_n_symbols the model will be "
                         "trained/infered with (crc32 fallback IDs)")
    ap.add_argument("--write-val-wavs", action="store_true",
                    help="render val ground-truth mels to wav (Griffin-Lim) "
                         "for the audio-domain checkpoint sweep")
    args = ap.parse_args()

    t2s, sylls = None, None
    if args.from_text:
        from tacotron2_subword_tpu.text import Text2Seq
        t2s = Text2Seq(args.lexicon)
        sylls = load_syllables(args.lexicon)
        print(f"front-end ready: {len(sylls)} syllables")

    for split, n, off in (("train", args.n_train, 0),
                          ("val", args.n_val, args.n_train)):
        base = os.path.join(args.out, split)
        for d in ("mels", "sub", "cls", "durations"):
            os.makedirs(os.path.join(base, d), exist_ok=True)
        if args.write_val_wavs and split == "val":
            os.makedirs(os.path.join(base, "wav"), exist_ok=True)
        rows, text_rows = [], []
        for i in range(n):
            rng = np.random.RandomState(args.seed * 999983 + off + i)
            if args.from_text:
                text, phones, durations, sub, cls, mel = make_text_utterance(
                    rng, sylls, t2s, args.sub_vocab)
                text_rows.append(f"{i}|{text}")
            else:
                phones, durations, sub, cls, mel = make_utterance(rng)
            np.save(os.path.join(base, "mels", f"ljspeech-mel-{i+1:05d}.npy"),
                    mel)
            np.save(os.path.join(base, "sub", f"{i}.npy"), sub)
            np.save(os.path.join(base, "cls", f"{i}.npy"), cls)
            dur_path = os.path.join(base, "durations", f"{i}.npy")
            np.save(dur_path, durations)
            rows.append(f"placeholder_{i}.wav|{dur_path}")
            if args.write_val_wavs and split == "val":
                wav = griffin_lim_wav(mel)
                from scipy.io.wavfile import write as wavwrite
                wavwrite(os.path.join(base, "wav", f"{i}.wav"), 22050,
                         np.clip(wav * 32768.0, -32768, 32767
                                 ).astype(np.int16))
        with open(os.path.join(args.out, f"{split}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
        if text_rows:
            with open(os.path.join(args.out, f"{split}_text.txt"), "w",
                      encoding="utf-8") as f:
                f.write("\n".join(text_rows) + "\n")
        print(f"{split}: {n} utterances under {base}")


if __name__ == "__main__":
    main()
