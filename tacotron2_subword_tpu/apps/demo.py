"""News-reader TTS demo (the reference's streamlitNews.py:118-199): long
text → sentence split → per-sentence synthesis → concatenated audio.

Runs as a CLI (text file or stdin → one wav); when streamlit is installed
(`streamlit run .../demo.py`) the same pipeline gets a text-box UI.  The
reference calls an external HTTP text-norm API per sentence
(streamlitNews.py:131-160) — zero-egress here, so normalization is
NFKC+lowercase (plug --norm-cmd for a local normalizer).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import unicodedata
from typing import List

import numpy as np


def split_sentences(text: str) -> List[str]:
    """Sentence split on terminal punctuation (the reference splits on
    '.', streamlitNews.py:184)."""
    parts = re.split(r"(?<=[.!?])\s+", text.replace("\n", " "))
    return [p.strip() for p in parts if p.strip()]


def synthesize_long_text(text: str, args) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    from tacotron2_subword_tpu.config import create_config
    from tacotron2_subword_tpu.models import tacotron2 as M
    from tacotron2_subword_tpu.apps.inference import (load_acoustic_model,
                                                      load_vocoder,
                                                      latest_checkpoint_path)
    from tacotron2_subword_tpu.text import Text2Seq

    cfg = create_config(hparams_string=getattr(args, "hparams", None))
    cfg = cfg.replace(max_decoder_steps=args.max_decoder_steps)
    ckpt = args.checkpoint or latest_checkpoint_path(args.checkpoint_dir)
    params, bn_state = load_acoustic_model(ckpt, cfg)
    vocode, _ = load_vocoder(args.hifigan_checkpoint, args.hifigan_config)
    t2s = Text2Seq(args.g2p_lexicon)

    infer_fn = jax.jit(lambda p, b, t, s, cp, cs, k: M.infer(
        p, b, cfg, t, s, cp, cs, rng=k))

    chunks = []
    for sent in split_sentences(text):
        sent = unicodedata.normalize("NFKC", sent).lower()
        seq = np.asarray(t2s.grapheme_to_sequence(sent))[None]
        sub = np.asarray([hash(w) % cfg.sub_n_symbols
                          for w in sent.split()], np.int32)[None]
        cls = np.zeros((1, cfg.bert_embedding_dim), np.float32)
        out = infer_fn(params, bn_state, jnp.asarray(seq),
                       jnp.asarray(sub), jnp.asarray(cls),
                       jnp.asarray(cls), jax.random.PRNGKey(0))
        n = int(out["mel_lengths"][0])
        wav = np.asarray(vocode(out["mel_postnet"][:, :, :max(n, 8)]))[0]
        chunks.append(wav)
        chunks.append(np.zeros(int(0.15 * 22050), np.float32))  # pause
    return np.concatenate(chunks) if chunks else np.zeros(1, np.float32)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--text-file", default=None, help="default: stdin")
    p.add_argument("--out", default="news.wav")
    p.add_argument("--checkpoint-dir", default="Outdir")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--g2p-lexicon", default=(
        "/root/reference/resources/"
        "all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt"))
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--hifigan-config", default=None)
    p.add_argument("--max-decoder-steps", type=int, default=2000)
    p.add_argument("--hparams", default=None)
    args = p.parse_args()

    text = (open(args.text_file, encoding="utf-8").read()
            if args.text_file else sys.stdin.read())
    wav = synthesize_long_text(text, args)
    from scipy.io.wavfile import write
    write(args.out, 22050, np.clip(wav * 32768.0, -32768, 32767
                                   ).astype(np.int16))
    print(f"wrote {args.out}: {len(wav) / 22050:.1f}s")


def streamlit_app():  # pragma: no cover — requires streamlit
    import streamlit as st
    st.title("TTS news reader")
    text = st.text_area("Text", "Xin chào. Đây là bản tin hôm nay.")
    if st.button("Synthesize"):
        args = build_default_args()
        wav = synthesize_long_text(text, args)
        st.audio((wav * 32768).astype(np.int16).tobytes(),
                 sample_rate=22050)


def build_default_args():
    return argparse.Namespace(
        checkpoint_dir="Outdir", checkpoint=None,
        g2p_lexicon=("/root/reference/resources/"
                     "all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt"),
        hifigan_checkpoint=None, hifigan_config=None,
        max_decoder_steps=2000, hparams=None)


if __name__ == "__main__":
    try:
        import streamlit  # noqa: F401
        import streamlit.runtime.scriptrunner as _sr
        if _sr.get_script_run_ctx() is not None:
            streamlit_app()
        else:
            main()
    except ImportError:
        main()
