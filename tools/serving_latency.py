"""B=1 serving latency: per-stage text→wav breakdown + real-time factor.

The reference's inference surface is per-utterance (reference
inference.py:363-375: one sentence → G2P → gate-stopped decode → vocoder →
wav); this tool publishes the number a serving user asks first — how long
one utterance takes end-to-end at B=1 — split into:

  front_end   host: NFKC normalize + G2P + subword IDs (pure Python/C++)
  acoustic    device+wall: encoder + gate-stopped while_loop decode
  vocoder     device+wall: HiFi-GAN (or Griffin-Lim) on the mel bucket
  total       wall text→wav, and RTF = audio_seconds / total_wall

Wall times through the axon tunnel include the ~30 ms per-call dispatch
overhead (documented in CLAUDE.md); device times are xprof 'XLA Modules'
spans, the on-chip cost a co-located server would see.  Compile/warmup is
excluded and reported separately.

    python tools/serving_latency.py --checkpoint _runs/run_r5/checkpoint_24000 \
        [--hifigan-checkpoint _runs/gta_r5/hifigan/g_00040000] \
        [--text "..."] [--repeats 20] [--out-md reports/serving_latency_r5.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import unicodedata

import numpy as np

if not __package__:
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:  # running from a source checkout
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))

DEFAULT_TEXT = ("con cò bé bé nó đậu cành tre đi không hỏi mẹ biết đi "
                "đường nào")


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--hifigan-config", default=None)
    p.add_argument("--text", default=DEFAULT_TEXT)
    p.add_argument("--g2p-lexicon", default=(
        "/root/reference/resources/"
        "all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt"))
    p.add_argument("--gate-threshold", type=float, default=0.5)
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--max-decoder-steps", type=int, default=2000)
    p.add_argument("--out-md", default=None)
    p.add_argument("--hparams", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from tacotron2_subword_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from tacotron2_subword_tpu.config import create_config
    from tacotron2_subword_tpu.models import tacotron2 as M
    from tacotron2_subword_tpu.apps.inference import (load_acoustic_model,
                                                      load_vocoder,
                                                      vocode_bucketed)
    from tacotron2_subword_tpu.text import Text2Seq
    from tacotron2_subword_tpu.text.bert import hashed_subword_ids
    from tacotron2_subword_tpu.utils.xprof import device_module_ms

    cfg = create_config(hparams_string=args.hparams)
    cfg = cfg.replace(max_decoder_steps=args.max_decoder_steps)
    params, bn = load_acoustic_model(args.checkpoint, cfg)
    vocode, voc_name = load_vocoder(args.hifigan_checkpoint,
                                    args.hifigan_config)
    t2s = Text2Seq(args.g2p_lexicon)

    # ---- stage 1: host front-end ---------------------------------------
    def front_end(text):
        norm = unicodedata.normalize("NFKC", text).lower()
        seq = np.asarray(t2s.grapheme_to_sequence(norm), np.int32)
        sub = hashed_subword_ids(norm, cfg.sub_n_symbols)
        return seq, sub

    fe_times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        seq, sub = front_end(args.text)
        fe_times.append(time.perf_counter() - t0)
    fe_ms = _median(fe_times) * 1e3

    # ---- stage 2: acoustic (encoder + gate-stopped decode) --------------
    t_pad = -(-len(seq) // 16) * 16
    s_pad = -(-len(sub) // 8) * 8
    text_d = jnp.asarray(np.pad(seq, (0, t_pad - len(seq)))[None])
    sub_d = jnp.asarray(np.pad(sub, (0, s_pad - len(sub)))[None])
    cls_d = jnp.asarray(np.zeros((1, cfg.bert_embedding_dim), np.float32))
    tl, sl = jnp.asarray([len(seq)]), jnp.asarray([len(sub)])

    infer_fn = jax.jit(lambda key: M.infer(
        params, bn, cfg, text_d, sub_d, cls_d, cls_d, rng=key,
        text_lengths=tl, sub_lengths=sl,
        gate_threshold=args.gate_threshold))

    t0 = time.perf_counter()
    out = infer_fn(jax.random.PRNGKey(0))
    n_frames = int(out["mel_lengths"][0])
    compile_acoustic_s = time.perf_counter() - t0
    mel = out["mel_postnet"]

    ac_times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        o = infer_fn(jax.random.PRNGKey(0))
        np.asarray(o["mel_lengths"])  # forces the gate-stopped decode
        np.asarray(o["mel_postnet"][0, :, 0])
        ac_times.append(time.perf_counter() - t0)
    ac_wall_ms = _median(ac_times) * 1e3
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            for i in range(4):
                o = infer_fn(jax.random.PRNGKey(0))
                np.asarray(o["mel_lengths"])
        ac_dev_ms = device_module_ms(d) / 4.0

    # ---- stage 3: vocoder ------------------------------------------------
    t0 = time.perf_counter()
    wav = vocode_bucketed(vocode, mel, n_frames)
    compile_vocoder_s = time.perf_counter() - t0
    vo_times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        wav = vocode_bucketed(vocode, mel, n_frames)
        vo_times.append(time.perf_counter() - t0)
    vo_wall_ms = _median(vo_times) * 1e3
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            for _ in range(4):
                vocode_bucketed(vocode, mel, n_frames)
        vo_dev_ms = device_module_ms(d) / 4.0

    # ---- end-to-end -------------------------------------------------------
    e2e_times = []
    for _ in range(max(args.repeats // 2, 5)):
        t0 = time.perf_counter()
        s2, sb2 = front_end(args.text)
        o = infer_fn(jax.random.PRNGKey(0))
        nf = int(o["mel_lengths"][0])
        w = vocode_bucketed(vocode, o["mel_postnet"], nf)
        e2e_times.append(time.perf_counter() - t0)
    e2e_wall_ms = _median(e2e_times) * 1e3

    audio_s = n_frames * cfg.hop_length / cfg.sampling_rate
    result = {
        "text_chars": len(args.text), "phones": int(len(seq)),
        "frames": n_frames, "audio_s": round(audio_s, 3),
        "vocoder": voc_name,
        "front_end_ms": round(fe_ms, 3),
        "acoustic_wall_ms": round(ac_wall_ms, 2),
        "acoustic_device_ms": round(ac_dev_ms, 2),
        "vocoder_wall_ms": round(vo_wall_ms, 2),
        "vocoder_device_ms": round(vo_dev_ms, 2),
        "e2e_wall_ms": round(e2e_wall_ms, 2),
        "rtf_wall": round(audio_s / (e2e_wall_ms / 1e3), 2),
        "rtf_device": round(
            audio_s / ((ac_dev_ms + vo_dev_ms) / 1e3), 2),
        "compile_acoustic_s": round(compile_acoustic_s, 1),
        "compile_vocoder_s": round(compile_vocoder_s, 1),
        "gate_threshold": args.gate_threshold,
        "repeats": args.repeats,
    }
    print(json.dumps(result))

    if args.out_md:
        md = [
            "# B=1 serving latency (text → wav, gate-stopped)",
            "",
            f"Checkpoint `{args.checkpoint}`, vocoder **{voc_name}**, "
            f"{len(seq)} phones → {n_frames} frames "
            f"({audio_s:.2f} s audio), gate threshold "
            f"{args.gate_threshold}, median of {args.repeats}.",
            "",
            "| stage | wall ms | device ms |",
            "|---|---|---|",
            f"| front-end (G2P + subwords, host) | {fe_ms:.2f} | – |",
            f"| acoustic (encoder + decode) | {ac_wall_ms:.1f} | "
            f"{ac_dev_ms:.1f} |",
            f"| vocoder ({voc_name}) | {vo_wall_ms:.1f} | {vo_dev_ms:.1f} |",
            f"| **end-to-end** | **{e2e_wall_ms:.1f}** | "
            f"{ac_dev_ms + vo_dev_ms:.1f} |",
            "",
            f"**RTF (wall) = {result['rtf_wall']}x** real-time; RTF on "
            f"device time alone = {result['rtf_device']}x.  Wall includes "
            "the axon tunnel's ~30 ms/call dispatch (CLAUDE.md); a "
            "co-located server sees the device column.  First-call "
            f"compiles: acoustic {compile_acoustic_s:.0f} s, vocoder "
            f"{compile_vocoder_s:.0f} s (cached thereafter).",
        ]
        with open(args.out_md, "w") as f:
            f.write("\n".join(md) + "\n")
        print(f"wrote {args.out_md}")


if __name__ == "__main__":
    main()
