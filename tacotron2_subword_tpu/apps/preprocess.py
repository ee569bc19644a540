"""Offline preprocessing CLI (the reference's preprocess.py +
preprocess/get{Phone,Mel}.py + check_data.py drivers).

Subcommands:
  mels       wav dir → per-utterance mel npys (preprocess/getMel.py role)
  phones     transcript file → phone-ID npys via Text2Seq
             (preprocess/getPhone.py role)
  subwords   transcript file → subword-ID npys + [CLS] npys
             (the reference preprocess.py:27-98 writes these per utterance)
  lists      build train/val list files (test_preprocess.py role)
  check      validate that every path in a list exists (check_data.py role)

The reference's text normalization calls an external HTTP API
(preprocess/getNorm.py) — zero-egress here, so normalization is limited to
NFKC + lowercase; plug a normalizer in with --norm-cmd if one exists
locally.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import unicodedata

import numpy as np


def cmd_mels(args):
    import jax.numpy as jnp
    from tacotron2_subword_tpu.ops import stft as S
    from scipy.io.wavfile import read
    os.makedirs(args.out_dir, exist_ok=True)
    wavs = sorted(glob.glob(os.path.join(args.wav_dir, "*.wav")))
    for i, path in enumerate(wavs):
        sr, data = read(path)
        wav = np.clip(data.astype(np.float32) / 32768.0, -1, 1)
        mel = np.asarray(S.mel_spectrogram(jnp.asarray(wav[None])))[0]
        np.save(os.path.join(args.out_dir,
                             f"ljspeech-mel-{i + 1:05d}.npy"), mel)
    print(f"wrote {len(wavs)} mels to {args.out_dir}")


def _normalize(text: str, norm_cmd: str | None) -> str:
    if norm_cmd:
        out = subprocess.run(norm_cmd.split() + [text],
                             capture_output=True, text=True)
        if out.returncode == 0 and out.stdout.strip():
            text = out.stdout.strip()
    return unicodedata.normalize("NFKC", text).lower()


def cmd_phones(args):
    from tacotron2_subword_tpu.text import Text2Seq
    t2s = Text2Seq(args.g2p_lexicon)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(args.transcript, encoding="utf-8") as f:
        lines = [l.strip().split("|", 1) for l in f if l.strip()]
    for i, (utt_id, text) in enumerate(lines):
        seq = t2s.grapheme_to_sequence(_normalize(text, args.norm_cmd))
        np.save(os.path.join(args.out_dir, f"{i}.npy"),
                np.asarray(seq, np.int32))
    print(f"wrote {len(lines)} phone sequences to {args.out_dir}")


def cmd_subwords(args):
    os.makedirs(args.sub_dir, exist_ok=True)
    os.makedirs(args.cls_dir, exist_ok=True)
    tokenizer = embedder = None
    if args.tokenizer_json and os.path.exists(args.tokenizer_json):
        from tacotron2_subword_tpu.text.bert import SubwordTokenizer
        tokenizer = SubwordTokenizer(args.tokenizer_json)
    if args.bert_model and os.path.exists(args.bert_model):
        from tacotron2_subword_tpu.text.bert import ClsEmbedder
        embedder = ClsEmbedder(args.bert_model)
    with open(args.transcript, encoding="utf-8") as f:
        lines = [l.strip().split("|", 1) for l in f if l.strip()]
    for i, (utt_id, text) in enumerate(lines):
        text = _normalize(text, args.norm_cmd)
        if tokenizer is not None:
            # same convention as apps/inference.py and the corpus
            # generator: IDs folded into the embedding table — a tokenizer
            # larger than --vocab would otherwise train in-range and then
            # index out of range (or differently) at inference time
            ids = tokenizer.encode(text) % args.vocab
        else:
            from tacotron2_subword_tpu.text.bert import hashed_subword_ids
            ids = hashed_subword_ids(text, args.vocab)
        np.save(os.path.join(args.sub_dir, f"{i}.npy"), ids)
        cls = (embedder.embed_cls(text) if embedder is not None
               else np.zeros(768, np.float32))
        np.save(os.path.join(args.cls_dir, f"{i}.npy"), cls)
    print(f"wrote {len(lines)} subword/cls pairs")


def cmd_lists(args):
    rows = []
    for dur in sorted(glob.glob(os.path.join(args.dur_dir, "*.npy"))):
        base = os.path.splitext(os.path.basename(dur))[0]
        wav = os.path.join(args.wav_dir, base + ".wav")
        rows.append(f"{wav}|{dur}")
    n_val = max(1, int(len(rows) * args.val_fraction))
    os.makedirs(os.path.dirname(os.path.abspath(args.train_out)),
                exist_ok=True)
    with open(args.train_out, "w") as f:
        f.write("\n".join(rows[n_val:]) + "\n")
    with open(args.val_out, "w") as f:
        f.write("\n".join(rows[:n_val]) + "\n")
    print(f"{len(rows) - n_val} train / {n_val} val rows")


def cmd_check(args):
    missing = 0
    with open(args.list_file, encoding="utf-8") as f:
        for line in f:
            for p in line.strip().split("|"):
                if p and not os.path.exists(p):
                    print("MISSING:", p)
                    missing += 1
    print(f"{missing} missing paths")
    return missing


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("mels")
    m.add_argument("--wav-dir", required=True)
    m.add_argument("--out-dir", required=True)

    ph = sub.add_parser("phones")
    ph.add_argument("--transcript", required=True, help="id|text lines")
    ph.add_argument("--out-dir", required=True)
    ph.add_argument("--g2p-lexicon", default=(
        "/root/reference/resources/"
        "all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt"))
    ph.add_argument("--norm-cmd", default=None)

    sw = sub.add_parser("subwords")
    sw.add_argument("--transcript", required=True)
    sw.add_argument("--sub-dir", required=True)
    sw.add_argument("--cls-dir", required=True)
    sw.add_argument("--tokenizer-json", default=None)
    sw.add_argument("--bert-model", default=None)
    sw.add_argument("--vocab", type=int, default=5500)
    sw.add_argument("--norm-cmd", default=None)

    ls = sub.add_parser("lists")
    ls.add_argument("--wav-dir", required=True)
    ls.add_argument("--dur-dir", required=True)
    ls.add_argument("--train-out", required=True)
    ls.add_argument("--val-out", required=True)
    ls.add_argument("--val-fraction", type=float, default=0.02)

    ck = sub.add_parser("check")
    ck.add_argument("list_file")

    args = p.parse_args()
    {"mels": cmd_mels, "phones": cmd_phones, "subwords": cmd_subwords,
     "lists": cmd_lists, "check": cmd_check}[args.cmd](args)


if __name__ == "__main__":
    main()
