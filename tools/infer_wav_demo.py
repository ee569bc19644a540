"""Gate-stopped inference → waveform demo on a trained checkpoint.

Demonstrates the VERDICT/BASELINE acceptance point that free-running
inference on a TRAINED model stops via the gate (not max_decoder_steps,
i.e. INFER_FLAG stays True — reference model.py:461-488) and produces a
waveform through the no-vocoder Griffin-Lim path (reference
Audio/tools.py:45-61 inv_mel_spec).

Usage: python tools/infer_wav_demo.py --data /tmp/synth_big \
           --checkpoint /tmp/run_big/checkpoint_best \
           --out reports/sample_gatestop.wav [--utt 0] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

if not __package__:
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:  # running from a source checkout
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--utt", type=int, default=0)
    ap.add_argument("--split", default="val")
    ap.add_argument("--max-steps", type=int, default=256)
    ap.add_argument("--gate-threshold", type=float, default=None)
    ap.add_argument("--hparams", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.io.wavfile import write as wav_write
    from tacotron2_subword_tpu.config import create_config
    from tacotron2_subword_tpu import train_lib as T
    from tacotron2_subword_tpu.models import tacotron2 as M
    from tacotron2_subword_tpu.ops import stft as S
    from tacotron2_subword_tpu.utils import checkpoint as CK

    cfg = create_config(hparams_string=args.hparams)
    skeleton, _ = T.create_train_state(jax.random.PRNGKey(0), cfg)
    state, _ = CK.load_checkpoint(args.checkpoint, skeleton)

    base = os.path.join(args.data, args.split)
    i = args.utt
    dur = np.load(os.path.join(base, "durations", f"{i}.npy"))
    phones = dur[:, 0].astype(np.int32)
    sub = np.load(os.path.join(base, "sub", f"{i}.npy")).astype(np.int32)
    cls = jnp.asarray(np.load(os.path.join(base, "cls", f"{i}.npy"))[None])
    gt = np.load(os.path.join(base, "mels", f"ljspeech-mel-{i+1:05d}.npy"))

    out = M.infer(state.params, state.bn_state, cfg,
                  jnp.asarray(phones[None]), jnp.asarray(sub[None]),
                  cls, cls, rng=jax.random.PRNGKey(7),
                  max_steps=args.max_steps,
                  gate_threshold=args.gate_threshold)
    ok = bool(np.asarray(out["infer_ok"])[0])
    n = int(np.asarray(out["mel_lengths"])[0])
    print(f"utt {i}: decoded {n} frames (gt {gt.shape[1]}), "
          f"gate_stopped={ok} (INFER_FLAG)")
    assert ok, "decode hit max_steps — gate did not stop (INFER_FLAG=False)"

    mel = jnp.asarray(np.asarray(out["mel_postnet"])[None, 0, :, :max(n, 8)])
    wav = np.asarray(S.inv_mel_spec(mel))[0]
    wav = wav / max(1e-6, np.abs(wav).max()) * 0.8
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    wav_write(args.out, cfg.sampling_rate, (wav * 32767).astype(np.int16))
    print(f"wrote {args.out}: {len(wav)} samples "
          f"({len(wav)/cfg.sampling_rate:.2f}s)")


if __name__ == "__main__":
    main()
