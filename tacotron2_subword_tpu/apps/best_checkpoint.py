"""Checkpoint-sweep evaluation CLI (the reference's best_checkpoint.py:
436-597): for every checkpoint in a directory, synthesize a validation
script, vocode to AUDIO, trim silence, compute MCD + soft-DTW against
ground-truth wavs, and append a row to a resumable CSV ledger.

    python -m tacotron2_subword_tpu.apps.best_checkpoint \
        --checkpoint-dir Outdir --script val.txt --gt-dir data/wav \
        --out-csv logging.csv [--g2p-lexicon ...] [--gate-threshold 0.5]

Ledger columns mirror the reference (best_checkpoint.py:551-556): per
checkpoint the mean MCD, mean soft-DTW, silence statistics, and the count
of failed utterances (gate overflow, the reference's INFER_FLAG abort,
model.py:463-465).  Rows already present are skipped (resumable, reference
best_checkpoint.py:444-456).

TPU-shaped divergences from the reference's per-utterance loop:
 - the text front-end runs ONCE for the whole script, padded into a single
   batch, and ONE jitted decode (shared across all checkpoints, gate
   threshold traced) synthesizes every utterance per checkpoint — B=1 calls
   through the dispatch tunnel are ~6x slower and a fresh jit per
   checkpoint would serialize 45-250 s compiles;
 - ``--gate-threshold`` defaults to 0.5: the reference's 0.001
   (hparams.py:80) is a hair trigger below a healthy gate's sigmoid noise
   floor (~3e-3) and stops decode after a few frames.
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


def _prepare_batch(lines, t2s, cfg, pad_to: int = 32):
    """Front-end once for the whole script → one padded batch."""
    import unicodedata
    from tacotron2_subword_tpu.text.bert import hashed_subword_ids

    seqs, subs = [], []
    for _utt_id, text in lines:
        text = unicodedata.normalize("NFKC", text).lower()
        seqs.append(np.asarray(t2s.grapheme_to_sequence(text), np.int32))
        subs.append(hashed_subword_ids(text, cfg.sub_n_symbols))
    T_text = -(-max(len(s) for s in seqs) // pad_to) * pad_to
    T_sub = -(-max(len(s) for s in subs) // pad_to) * pad_to
    batch = dict(
        text=jnp.asarray(np.stack(
            [np.pad(s, (0, T_text - len(s))) for s in seqs])),
        sub=jnp.asarray(np.stack(
            [np.pad(s, (0, T_sub - len(s))) for s in subs])),
        cls=jnp.zeros((len(seqs), cfg.bert_embedding_dim), jnp.float32),
        t_lens=jnp.asarray([len(s) for s in seqs]),
        s_lens=jnp.asarray([len(s) for s in subs]))
    return batch


def mel_bucketed(mel_fn, wav: np.ndarray, hop: int = 256,
                 bucket: int = 16384) -> np.ndarray:
    """log-mel of a variable-length wav through ONE jitted STFT per sample
    bucket: every distinct wav length would otherwise remote-compile a
    fresh XLA program (minutes each through the serialized axon compile
    endpoint).  Pad to the bucket, slice the frames back to the true
    length — synthesized and ground-truth wavs go through the identical
    path so the soft-DTW comparison stays consistent."""
    n = len(wav)
    pad = -(-n // bucket) * bucket
    w = np.clip(wav, -1, 1).astype(np.float32)
    extra = pad - n
    # REFLECT-pad the tail up to the bucket edge: zero-padding made the
    # final 1-2 retained frames differ from an unbucketed reflect-pad-only
    # STFT; with reflection the shared frames agree
    if 0 < extra <= n - 1:
        w = np.pad(w, (0, extra), mode="reflect")
    else:
        w = np.pad(w, (0, extra))
    m = np.asarray(mel_fn(jnp.asarray(w[None])))[0]
    return m[:, : n // hop + 1]


def sweep(args) -> List[Dict]:
    from tacotron2_subword_tpu.config import create_config
    from tacotron2_subword_tpu.models import tacotron2 as M
    from tacotron2_subword_tpu.apps.inference import (load_acoustic_model,
                                                      load_vocoder,
                                                      vocode_bucketed)
    from tacotron2_subword_tpu.eval import (mcd_between_wavs, trim_silence)
    from tacotron2_subword_tpu.eval import metrics as EM
    from tacotron2_subword_tpu.ops import stft as S
    from tacotron2_subword_tpu.text import Text2Seq

    cfg = create_config(hparams_string=args.hparams)
    cfg = cfg.replace(max_decoder_steps=args.max_decoder_steps)
    t2s = Text2Seq(args.g2p_lexicon)
    vocode, vocoder_name = load_vocoder(args.hifigan_checkpoint,
                                        args.hifigan_config)
    with open(args.script, encoding="utf-8") as f:
        lines = [l.strip().split("|", 1) for l in f if l.strip()]
    lines = lines[:args.max_utts]
    batch = _prepare_batch(lines, t2s, cfg)

    # ONE jitted decode shared across every checkpoint; the gate threshold
    # is traced so sweeping it never recompiles
    @jax.jit
    def infer_fn(params, bn, thresh):
        return M.infer(params, bn, cfg, batch["text"], batch["sub"],
                       batch["cls"], batch["cls"],
                       rng=jax.random.PRNGKey(0),
                       gate_threshold=thresh,
                       text_lengths=batch["t_lens"],
                       sub_lengths=batch["s_lens"])

    # ground-truth wavs/mels are fixed across checkpoints: load + mel them
    # ONCE (bucketed), not per checkpoint row
    mel_fn = jax.jit(S.mel_spectrogram)
    gt_cache: Dict[str, tuple] = {}
    for utt_id, _text in lines:
        gt_path = os.path.join(args.gt_dir, f"{utt_id}.wav")
        if os.path.exists(gt_path):
            from scipy.io.wavfile import read as wavread
            _, gt = wavread(gt_path)
            gt = gt.astype(np.float32) / 32768.0
            gt_cache[utt_id] = (gt, mel_bucketed(mel_fn, gt))

    ledger = read_ledger(args.out_csv)
    results = []
    for ckpt in list_checkpoints(args.checkpoint_dir):
        name = os.path.basename(ckpt)
        if name in ledger:
            print(f"{name}: already in ledger, skipping")
            continue
        params, bn_state = load_acoustic_model(ckpt, cfg)
        out = infer_fn(params, bn_state, jnp.float32(args.gate_threshold))
        mel_b = np.asarray(out["mel_postnet"], np.float32)
        lens_b = np.asarray(out["mel_lengths"])
        ok_b = np.asarray(out["infer_ok"])

        mcds, sdtws, silences, failed = [], [], [], 0
        for i, (utt_id, _text) in enumerate(lines):
            if not bool(ok_b[i]):
                failed += 1
                continue
            n = int(lens_b[i])
            # bucketed vocode: one jit compile per mel-length bucket
            wav = vocode_bucketed(vocode, jnp.asarray(mel_b[i:i + 1]), n)[0]

            trimmed, start, _ = trim_silence(wav, fs=cfg.sampling_rate)
            silences.append(start / cfg.sampling_rate)

            if utt_id in gt_cache:
                gt, gt_mel = gt_cache[utt_id]
                mcd = mcd_between_wavs(trimmed, gt, fs=cfg.sampling_rate)
                if mcd is not None:
                    mcds.append(mcd)
                # audio-domain soft-DTW: mels recomputed from BOTH wavs
                # (reference best_checkpoint.py:422-433 via Audio.tools
                # get_mel on the synthesized + ground-truth audio)
                syn_mel = mel_bucketed(mel_fn, trimmed)
                D = ((syn_mel.T[:, None, :]
                      - gt_mel.T[None, :, :]) ** 2).sum(-1)
                sdtws.append(EM.softdtw_np(D, gamma=1.0)
                             / (D.shape[0] + D.shape[1]))

        row = {
            "checkpoint": name,
            "mcd_mean": round(float(np.mean(mcds)), 4) if mcds else "",
            "softdtw_mean": round(float(np.mean(sdtws)), 4) if sdtws else "",
            "silence_mean_s": round(float(np.mean(silences)), 4)
                               if silences else "",
            "failed": failed,
            "n_utts": len(lines),
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
    p.add_argument("--gate-threshold", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (metric sweeps are "
                        "latency-bound through the TPU dispatch tunnel)")
    p.add_argument("--hparams", default=None)
    return p


def main():
    args = build_argparser().parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from tacotron2_subword_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    sweep(args)


if __name__ == "__main__":
    main()
