"""GTA (ground-truth-aligned) mel extraction CLI — batch teacher-forced
synthesis over a training list (the reference's GTA.py:13-70 workload,
repaired and TPU-batched).

    python -m tacotron2_subword_tpu.apps.gta train.txt CHECKPOINT MEL_OUT \
        [--sub-dir ... --cls-dir ...] [--batch-size 16]

Per training-list row ``wav_path|durations.npy``: phone IDs come from
column 0 of the durations npy (reference GTA.py:42), the target mel is
recomputed from the wav via the TacotronSTFT-equivalent pipeline
(ops.stft.mel_spectrogram), and the teacher-forced decoder output is saved
as ``{mel_out}/{wav_basename}.npy``.

Repairs vs the reference (documented): GTA.py as committed instantiates the
single-stream ``Tacotron2`` and calls the 5-tuple API that the shipped
model.py no longer has (GTA.py:6,21,59) — it cannot run.  This version
drives the dual-stream model (subword IDs + CLS vectors from --sub-dir /
--cls-dir, zeros when absent) and pads utterances into length-bucketed
batches so the scan decoder runs wide on the MXU instead of one utterance
at a time.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu.config import create_config
from tacotron2_subword_tpu.models import tacotron2 as M
from tacotron2_subword_tpu.ops import stft as S
from tacotron2_subword_tpu.apps.inference import load_acoustic_model


def load_wav(path: str) -> np.ndarray:
    from scipy.io.wavfile import read
    sr, data = read(path)
    return data.astype(np.float32) / 32768.0


def gta_synthesis(args) -> int:
    cfg = create_config(hparams_string=args.hparams)
    params, bn_state = load_acoustic_model(args.checkpoint, cfg)
    os.makedirs(args.mel_out, exist_ok=True)

    with open(args.train_list, encoding="utf-8") as f:
        rows = [l.strip().split("|") for l in f if l.strip()]

    # gather utterances (phone IDs from durations col 0, mel from wav)
    utts = []
    for i, row in enumerate(rows):
        wav_path, dur_path = row[0], row[-1]
        out_path = os.path.join(
            args.mel_out,
            os.path.splitext(os.path.basename(wav_path))[0] + ".npy")
        if os.path.exists(out_path) and not args.overwrite:
            continue
        dur = np.load(dur_path)
        text = dur[:, 0].astype(np.int32)
        if args.mel_dir:
            # precomputed-mel mode: read the dataset's mel instead of
            # recomputing from the wav (reference GTA.py always re-mels)
            mel = np.load(os.path.join(
                args.mel_dir, f"ljspeech-mel-{i + 1:05d}.npy")).astype(
                np.float32)
            if mel.shape[0] != cfg.n_mel_channels and \
                    mel.shape[1] == cfg.n_mel_channels:
                mel = mel.T
        else:
            wav = load_wav(wav_path)
            mel = np.asarray(S.mel_spectrogram(
                jnp.asarray(np.clip(wav, -1, 1)[None]),
                cfg.sampling_rate, cfg.filter_length, cfg.hop_length,
                cfg.win_length, cfg.n_mel_channels, cfg.mel_fmin,
                cfg.mel_fmax))[0]
        sub = (np.load(os.path.join(args.sub_dir, f"{i}.npy")).astype(
            np.int32) if args.sub_dir else np.zeros(4, np.int32))
        cls = (np.load(os.path.join(args.cls_dir, f"{i}.npy")).astype(
            np.float32).reshape(-1) if args.cls_dir
            else np.zeros(cfg.bert_embedding_dim, np.float32))
        utts.append(dict(text=text, mel=mel, sub=sub, cls=cls,
                         out_path=out_path))

    if not utts:
        print("nothing to do")
        return 0

    fwd = jax.jit(lambda p, b, batch, key: M.forward(
        p, b, cfg, batch, training=False, rng=key)[0])

    # sort by mel length and emit padded batches (bounded compile count via
    # power-of-two-ish padding)
    utts.sort(key=lambda u: u["mel"].shape[1])
    B = args.batch_size
    n_done = 0
    for s in range(0, len(utts), B):
        chunk = utts[s:s + B]
        T_text = _round_up(max(len(u["text"]) for u in chunk), 16)
        T_sub = _round_up(max(len(u["sub"]) for u in chunk), 8)
        T_mel = _round_up(max(u["mel"].shape[1] for u in chunk), 64)
        batch = {
            "text": _stack([_pad(u["text"], T_text) for u in chunk]),
            "text_lengths": jnp.asarray([len(u["text"]) for u in chunk]),
            "sub": _stack([_pad(u["sub"], T_sub) for u in chunk]),
            "sub_lengths": jnp.asarray([len(u["sub"]) for u in chunk]),
            "mels": _stack([np.pad(u["mel"],
                                   ((0, 0),
                                    (0, T_mel - u["mel"].shape[1])))
                            for u in chunk]),
            "output_lengths": jnp.asarray([u["mel"].shape[1]
                                           for u in chunk]),
            "cls_phone": _stack([u["cls"] for u in chunk]),
            "cls_sub": _stack([u["cls"] for u in chunk]),
        }
        out = fwd(params, bn_state, batch, jax.random.PRNGKey(0))
        mel_pred = np.asarray(out["mel_postnet"])
        for k, u in enumerate(chunk):
            np.save(u["out_path"], mel_pred[k, :, :u["mel"].shape[1]])
            n_done += 1
        print(f"GTA batch {s // B}: {len(chunk)} utts "
              f"(T_mel={T_mel}) done", flush=True)
    return n_done


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad(x: np.ndarray, n: int) -> np.ndarray:
    return np.pad(x, (0, n - len(x)))


def _stack(xs: List[np.ndarray]) -> jnp.ndarray:
    return jnp.asarray(np.stack(xs))


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("train_list")
    p.add_argument("checkpoint")
    p.add_argument("mel_out")
    p.add_argument("--sub-dir", default=None)
    p.add_argument("--cls-dir", default=None)
    p.add_argument("--mel-dir", default=None,
                   help="read precomputed mels from this dir instead of "
                        "re-computing from wavs")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--hparams", default=None)
    return p


def main():
    from tacotron2_subword_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    gta_synthesis(build_argparser().parse_args())


if __name__ == "__main__":
    main()
