"""Checkpoint-sweep evaluation CLI (the reference's best_checkpoint.py:
436-597): for every checkpoint in a directory, synthesize a validation
script, trim silence, compute MCD + soft-DTW against ground truth, and
append a row to a resumable CSV ledger.

    python -m tacotron2_subword_tpu.apps.best_checkpoint \
        --checkpoint-dir Outdir --script val.txt --gt-dir data/wav \
        --out-csv logging.csv [--g2p-lexicon ...]

Ledger columns mirror the reference (best_checkpoint.py:551-556): per
checkpoint the mean MCD, mean soft-DTW, silence statistics, and the count
of failed utterances (gate overflow, the reference's INFER_FLAG abort,
model.py:463-465).  Rows already present are skipped (resumable, reference
best_checkpoint.py:444-456).
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import re
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def list_checkpoints(dir_path: str, pattern: str = "checkpoint_*"):
    out = []
    for p in glob.glob(os.path.join(dir_path, pattern)):
        m = re.search(r"(\d+)$", p)
        if m:
            out.append((int(m.group(1)), p))
    return [p for _, p in sorted(out)]


def read_ledger(path: str) -> Dict[str, Dict]:
    if not os.path.exists(path):
        return {}
    with open(path, newline="") as f:
        return {row["checkpoint"]: row for row in csv.DictReader(f)}


def append_ledger(path: str, row: Dict) -> None:
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            w.writeheader()
        w.writerow(row)


def sweep(args) -> List[Dict]:
    from tacotron2_subword_tpu.config import create_config
    from tacotron2_subword_tpu.models import tacotron2 as M
    from tacotron2_subword_tpu.apps.inference import (load_acoustic_model,
                                                      load_vocoder)
    from tacotron2_subword_tpu.eval import (mcd_between_wavs, trim_silence)
    from tacotron2_subword_tpu.ops import softdtw as SD
    from tacotron2_subword_tpu.ops import stft as S
    from tacotron2_subword_tpu.text import Text2Seq

    cfg = create_config(hparams_string=args.hparams)
    cfg = cfg.replace(max_decoder_steps=args.max_decoder_steps)
    t2s = Text2Seq(args.g2p_lexicon)
    vocode, vocoder_name = load_vocoder(args.hifigan_checkpoint,
                                        args.hifigan_config)
    with open(args.script, encoding="utf-8") as f:
        lines = [l.strip().split("|", 1) for l in f if l.strip()]

    ledger = read_ledger(args.out_csv)
    results = []
    for ckpt in list_checkpoints(args.checkpoint_dir):
        name = os.path.basename(ckpt)
        if name in ledger:
            print(f"{name}: already in ledger, skipping")
            continue
        params, bn_state = load_acoustic_model(ckpt, cfg)
        infer_fn = jax.jit(lambda p, b, t, s_, cp, cs, k: M.infer(
            p, b, cfg, t, s_, cp, cs, rng=k))

        mcds, sdtws, silences, failed = [], [], [], 0
        for utt_id, text in lines[:args.max_utts]:
            import unicodedata
            seq = t2s.grapheme_to_sequence(
                unicodedata.normalize("NFKC", text).lower())
            sub = np.asarray([hash(w) % cfg.sub_n_symbols
                              for w in text.split()], np.int32)
            cls = np.zeros(cfg.bert_embedding_dim, np.float32)
            out = infer_fn(params, bn_state,
                           jnp.asarray(np.asarray(seq)[None]),
                           jnp.asarray(sub[None]), jnp.asarray(cls[None]),
                           jnp.asarray(cls[None]), jax.random.PRNGKey(0))
            if not bool(out["infer_ok"][0]):
                failed += 1
                continue
            n = int(out["mel_lengths"][0])
            # min 8 frames: 1-frame mels break the iSTFT edge trim
            mel = out["mel_postnet"][:, :, :max(n, 8)]
            wav = np.asarray(vocode(mel))[0]

            trimmed, start, _ = trim_silence(wav, fs=cfg.sampling_rate)
            silences.append(start / cfg.sampling_rate)

            gt_path = os.path.join(args.gt_dir, f"{utt_id}.wav")
            if os.path.exists(gt_path):
                from scipy.io.wavfile import read as wavread
                _, gt = wavread(gt_path)
                gt = gt.astype(np.float32) / 32768.0
                mcd = mcd_between_wavs(trimmed, gt, fs=cfg.sampling_rate)
                if mcd is not None:
                    mcds.append(mcd)
                gt_mel = S.mel_spectrogram(
                    jnp.asarray(np.clip(gt, -1, 1)[None]))
                d = SD.softdtw_distance(
                    jnp.swapaxes(mel, 1, 2).astype(jnp.float32),
                    jnp.swapaxes(gt_mel, 1, 2))
                sdtws.append(float(d[0]))

        row = {
            "checkpoint": name,
            "mcd_mean": round(float(np.mean(mcds)), 4) if mcds else "",
            "softdtw_mean": round(float(np.mean(sdtws)), 4) if sdtws else "",
            "silence_mean_s": round(float(np.mean(silences)), 4)
                               if silences else "",
            "failed": failed,
            "n_utts": len(lines[:args.max_utts]),
        }
        append_ledger(args.out_csv, row)
        results.append(row)
        print(row, flush=True)
    return results


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--script", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--out-csv", default="logging.csv")
    p.add_argument("--g2p-lexicon", default=(
        "/root/reference/resources/"
        "all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt"))
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--hifigan-config", default=None)
    p.add_argument("--max-decoder-steps", type=int, default=2000)
    p.add_argument("--max-utts", type=int, default=100)
    p.add_argument("--hparams", default=None)
    return p


def main():
    from tacotron2_subword_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    sweep(build_argparser().parse_args())


if __name__ == "__main__":
    main()
