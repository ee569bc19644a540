"""Inference CLI — text → mel → waveform (the reference's inference.py:
342-375 pipeline, TPU-native).

    python -m tacotron2_subword_tpu.apps.inference \
        --script script.txt --checkpoint-dir Outdir --out-dir Outdir/demo \
        --g2p-lexicon <lexicon-or-.g2pfst> \
        [--hifigan-checkpoint g_0... --hifigan-config config_v1.json] \
        [--tokenizer-json data/vibert_5500.json --bert-model <local dir>]

Per script line ``id|text``: NFKC-lowercase normalization, G2P → phone IDs,
subword IDs + BERT [CLS] conditioning, batched gate-stopped decoding
(max_decoder_steps 6000, reference inference.py:246), alignment/mel plots,
HiFi-GAN vocoding with bias removal (strength 0.9) — or Griffin-Lim when no
vocoder checkpoint is given (BASELINE config 1) — scaled by 32768*1.7 and
written as 22050 Hz int16 wav; already-rendered ids are skipped
(resumability, reference inference.py:365-366).

Checkpoints: both this framework's Orbax dirs and reference torch
``checkpoint_{iter}`` files load transparently.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import unicodedata
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu.config import TacotronConfig, create_config
from tacotron2_subword_tpu import train_lib as T
from tacotron2_subword_tpu.models import tacotron2 as M
from tacotron2_subword_tpu.models import hifigan as HG
from tacotron2_subword_tpu.models import denoiser as DN
from tacotron2_subword_tpu.ops import stft as S
from tacotron2_subword_tpu.utils import checkpoint as CK
from tacotron2_subword_tpu.utils.logging_utils import (plot_alignment,
                                                       plot_spectrogram)

MAX_WAV_VALUE = 32768.0 * 1.7  # reference inference.py:196


def latest_checkpoint_path(dir_path: str,
                           regex: str = "checkpoint_*") -> Optional[str]:
    """Newest checkpoint by trailing number (reference
    inference.py:284-292)."""
    f_list = glob.glob(os.path.join(dir_path, regex))
    f_list = [f for f in f_list if re.search(r"\d+$", f)]
    if not f_list:
        return None
    f_list.sort(key=lambda f: int(re.search(r"(\d+)$", f).group(1)))
    return f_list[-1]


def load_acoustic_model(checkpoint: str, cfg: TacotronConfig):
    """Returns (params, bn_state).  Accepts Orbax dirs and reference torch
    checkpoint files.

    The restore template is built on the HOST CPU backend: a full-size
    eager init through the serialized axon TPU tunnel costs minutes of
    ~30 ms dispatches, and the template values are immediately overwritten
    by the checkpoint anyway."""
    if os.path.isdir(checkpoint):
        import contextlib
        try:
            ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
        except RuntimeError:  # cpu backend disabled by platform config
            ctx = contextlib.nullcontext()
        with ctx:
            state, tx = T.create_train_state(jax.random.PRNGKey(0), cfg)
        state, _ = CK.load_checkpoint(checkpoint, state)
        return state.params, state.bn_state
    from tacotron2_subword_tpu.utils.import_torch import \
        load_torch_checkpoint
    params, bn_state, _ = load_torch_checkpoint(checkpoint, cfg)
    return params, bn_state


def load_vocoder(hifigan_checkpoint: Optional[str],
                 hifigan_config: Optional[str]):
    """Returns (vocode_fn mel[B,80,T]→wav[B,T'], name).  Falls back to
    Griffin-Lim (no checkpoint needed, BASELINE config 1).

    Accepts four checkpoint forms, mirroring the reference's vocoder
    backends: orbax dir (apps/train_hifigan), torch g_???????? file,
    ``.onnx`` (reference inference.py:208-223; onnxruntime when present,
    else the native numpy executor) and ``.tflite`` (reference
    best_checkpoint.py:230-260)."""
    if hifigan_checkpoint and hifigan_checkpoint.endswith(".onnx"):
        from tacotron2_subword_tpu.models.vocoder_runtimes import \
            load_onnx_vocoder
        run = load_onnx_vocoder(hifigan_checkpoint)
        return (lambda mel: run(np.asarray(mel, np.float32))), "hifigan-onnx"
    if hifigan_checkpoint and hifigan_checkpoint.endswith(".tflite"):
        from tacotron2_subword_tpu.models.vocoder_runtimes import \
            load_tflite_vocoder
        run = load_tflite_vocoder(hifigan_checkpoint)
        return (lambda mel: run(np.asarray(mel, np.float32))), \
            "hifigan-tflite"
    if hifigan_checkpoint:
        h = (HG.HifiganConfig.from_json(hifigan_config)
             if hifigan_config else HG.HifiganConfig())
        if os.path.isdir(hifigan_checkpoint):
            # orbax dir from apps/train_hifigan (e.g. a GTA fine-tuned
            # generator, g_NNNNNNNN) — weight-norm params, fused for
            # serving like the reference's remove_weight_norm()
            import orbax.checkpoint as ocp
            raw = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(hifigan_checkpoint))
            params = HG.fuse_generator(raw)
        else:
            import torch
            sd = torch.load(hifigan_checkpoint, map_location="cpu",
                            weights_only=False)
            sd = sd.get("generator", sd)
            sd = {k: v.numpy() for k, v in sd.items()}
            params = HG.fuse_generator(HG.import_torch_generator(sd, h))

        @jax.jit
        def vocode(mel):
            return HG.generator_apply(params, h, mel)[:, 0, :]
        return vocode, "hifigan"

    def vocode_gl(mel):
        # mel → linear magnitude via filterbank pseudo-inverse, then
        # Griffin-Lim (the reference's Audio.tools.inv_mel_spec path,
        # Audio/tools.py:45-61, with spec_from_mel_scaling=1000)
        fb = S.mel_filterbank(22050, 1024, mel.shape[1], 0.0, 8000.0)
        inv_fb = jnp.asarray(np.linalg.pinv(fb))
        spec = jnp.einsum("km,bmt->bkt", inv_fb,
                          S.dynamic_range_decompression(mel))
        spec = jnp.maximum(spec, 1e-8) * 1000.0
        return S.griffin_lim(spec, 1024, 256, 1024, n_iters=30,
                             key=jax.random.PRNGKey(0)) / 1000.0
    # jitted: EAGER Griffin-Lim through the axon tunnel compiles each of
    # its ~hundreds of ops per new shape on the serialized endpoint
    # (minutes per utterance); jitted it is one compile per mel bucket
    return jax.jit(vocode_gl), "griffin_lim"


MEL_FLOOR = float(np.log(1e-5))  # dynamic-range-compression silence floor


def vocode_bucketed(vocode, mel, n_frames: int, hop: int = 256,
                    bucket: int = 64) -> np.ndarray:
    """Pad the mel to a frame bucket (silence-floor fill) before vocoding
    so the jitted vocoder compiles once per bucket, then cut the waveform
    back to the true length.  (min 8 frames: a 1-frame mel — the
    reference's gate-fires-on-first-frame quirk, model.py:461-467 — would
    make the iSTFT output empty after edge trimming.)"""
    n = max(n_frames, 8)
    m = mel[:, :, :n]
    pad_f = -(-n // bucket) * bucket
    m = jnp.pad(m, ((0, 0), (0, 0), (0, pad_f - n)),
                constant_values=MEL_FLOOR)
    wav = np.asarray(vocode(m))
    return wav[:, :n * hop]


def write_wav(path: str, wav: np.ndarray, sr: int = 22050) -> None:
    from scipy.io.wavfile import write
    write(path, sr, wav.astype(np.int16))


def run_inference(args) -> int:
    cfg = create_config(hparams_string=args.hparams)
    cfg = cfg.replace(max_decoder_steps=args.max_decoder_steps)

    ckpt = args.checkpoint or latest_checkpoint_path(args.checkpoint_dir)
    if ckpt is None:
        raise FileNotFoundError(
            f"no checkpoint under {args.checkpoint_dir}")
    print("Load:", ckpt)
    params, bn_state = load_acoustic_model(ckpt, cfg)
    vocode, vocoder_name = load_vocoder(args.hifigan_checkpoint,
                                        args.hifigan_config)

    # text front-end
    from tacotron2_subword_tpu.text import Text2Seq
    t2s = Text2Seq(args.g2p_lexicon)

    tokenizer = None
    if args.tokenizer_json and os.path.exists(args.tokenizer_json):
        from tacotron2_subword_tpu.text.bert import SubwordTokenizer
        tokenizer = SubwordTokenizer(args.tokenizer_json)
    embedder = None
    if args.bert_model and os.path.exists(args.bert_model):
        from tacotron2_subword_tpu.text.bert import ClsEmbedder
        embedder = ClsEmbedder(args.bert_model)

    for sub in ("audio", "mels", "alignment", "alignment_bert"):
        os.makedirs(os.path.join(args.out_dir, sub), exist_ok=True)

    # bias remover built from the vocoder itself (reference
    # bias_remover.py:6-29, strength 0.9 at inference.py:202)
    bias_spec = None
    if vocoder_name == "hifigan" and args.bias_remove:
        bias_spec = DN.compute_bias_spec(
            lambda m: vocode(m)[:, None, :], n_mel_channels=cfg.n_mel_channels)

    infer_fn = jax.jit(
        lambda p, b, text, sub_ids, cp, cs, t_len, s_len, key: M.infer(
            p, b, cfg, text, sub_ids, cp, cs, rng=key,
            text_lengths=t_len, sub_lengths=s_len))

    n_done = 0
    with open(args.script, encoding="utf-8") as f:
        lines = [l.strip() for l in f if l.strip()]
    for line in lines:
        utt_id, text = line.split("|", 1)
        wav_path = os.path.join(args.out_dir, "audio", f"{utt_id}.wav")
        if os.path.exists(wav_path) and not args.overwrite:
            continue
        text = unicodedata.normalize("NFKC", text).lower()
        seq = t2s.grapheme_to_sequence(text)
        if tokenizer is not None:
            sub_ids = tokenizer.encode(text) % cfg.sub_n_symbols
        else:
            # deterministic (crc32, not process-salted hash()) fallback when
            # no tokenizer asset is present — must match the IDs any
            # tokenizer-less training corpus was built with
            from tacotron2_subword_tpu.text.bert import hashed_subword_ids
            sub_ids = hashed_subword_ids(text, cfg.sub_n_symbols)
        if embedder is not None:
            cls = embedder.embed_cls(text)
        else:
            cls = np.zeros(cfg.bert_embedding_dim, np.float32)

        # pad to bucket edges (multiples of 16/8) and pass true lengths:
        # one XLA compile per BUCKET, not per utterance length (a full-size
        # infer compile costs 45-250 s through the axon tunnel)
        seq = np.asarray(seq, np.int32)
        t_pad = -(-len(seq) // 16) * 16
        s_pad = -(-len(sub_ids) // 8) * 8
        out = infer_fn(params, bn_state,
                       jnp.asarray(np.pad(seq, (0, t_pad - len(seq)))[None]),
                       jnp.asarray(np.pad(sub_ids,
                                          (0, s_pad - len(sub_ids)))[None]),
                       jnp.asarray(cls[None]), jnp.asarray(cls[None]),
                       jnp.asarray([len(seq)]), jnp.asarray([len(sub_ids)]),
                       jax.random.PRNGKey(0))
        n = int(out["mel_lengths"][0])
        if not bool(out["infer_ok"][0]):
            print(f"{utt_id}: reached max decoder steps")
        mel = out["mel_postnet"][:, :, :max(n, 8)]

        align = np.asarray(out["alignments"][0, :n])
        _save_plot(plot_alignment(align),
                   os.path.join(args.out_dir, "alignment", f"{utt_id}.png"))
        _save_plot(plot_alignment(np.asarray(out["alignments_bert"][0, :n])),
                   os.path.join(args.out_dir, "alignment_bert",
                                f"{utt_id}.png"))
        _save_plot(plot_spectrogram(np.asarray(mel[0])),
                   os.path.join(args.out_dir, "mels", f"{utt_id}.png"))

        wav = vocode_bucketed(vocode, out["mel_postnet"], n)
        if vocoder_name == "hifigan":
            wav = wav * MAX_WAV_VALUE
            if bias_spec is not None:
                wav = np.asarray(DN.denoise(jnp.asarray(wav), bias_spec,
                                            strength=0.9))
            wav_np = wav[0]
        else:
            wav_np = wav[0] * 32768.0
        write_wav(wav_path, np.clip(wav_np, -32768, 32767))
        n_done += 1
        print(f"{utt_id}: {mel.shape[-1]} frames -> "
              f"{len(wav_np) / 22050:.2f}s audio ({vocoder_name})")
    return n_done


def _save_plot(img: np.ndarray, path: str) -> None:
    import matplotlib.pyplot as plt
    plt.imsave(path, img)


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--script", required=True, help="id|text lines")
    p.add_argument("--checkpoint-dir", default="Outdir")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out-dir", default="Outdir/demo")
    p.add_argument("--g2p-lexicon", default=(
        "/root/reference/resources/"
        "all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt"))
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--hifigan-config", default=None)
    p.add_argument("--tokenizer-json", default=None)
    p.add_argument("--bert-model", default=None)
    p.add_argument("--bias-remove", action="store_true", default=True)
    p.add_argument("--max-decoder-steps", type=int, default=6000)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--hparams", default=None)
    return p


def main():
    from tacotron2_subword_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    run_inference(build_argparser().parse_args())


if __name__ == "__main__":
    main()
