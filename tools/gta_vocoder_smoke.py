"""End-to-end GTA → vocoder fine-tune smoke: the reference's production
workflow (GTA mel extraction feeding a HiFi-GAN fine-tune, reference
GTA.py + the in-tree discriminator stack hifigan_infer/hifigan_model.py:
127-281), driven over the synthetic corpus with a trained checkpoint.

Steps:
 1. Griffin-Lim waveforms from the corpus ground-truth mels (the synthetic
    corpus ships no audio) → {work}/wavs/placeholder_{i}.wav
 2. apps.gta: teacher-forced mel extraction with the trained acoustic
    checkpoint → {work}/gta_mels/placeholder_{i}.npy
 3. apps.train_hifigan on (GTA mel, waveform) pairs for --iters steps
 4. vocode one GTA mel with the fine-tuned generator → {work}/vocoded.wav

Usage: python tools/gta_vocoder_smoke.py --data /tmp/synth_data \
           --checkpoint /tmp/run_full/checkpoint_best --work /tmp/gta_smoke \
           [--split val] [--iters 5] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    env = dict(os.environ)
    if args.cpu:
        env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""})
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from tacotron2_subword_tpu.ops import stft as S

    base = os.path.join(args.data, args.split)
    wav_dir = os.path.join(args.work, "wavs")
    gta_dir = os.path.join(args.work, "gta_mels")
    voc_dir = os.path.join(args.work, "hifigan")
    os.makedirs(wav_dir, exist_ok=True)

    # ---- 1. Griffin-Lim audio from ground-truth mels -------------------
    from scipy.io.wavfile import write as wav_write
    rows = []
    inv = jax.jit(lambda m: S.inv_mel_spec(m))
    for i in range(args.n):
        dur_path = os.path.join(base, "durations", f"{i}.npy")
        mel = np.load(os.path.join(base, "mels",
                                   f"ljspeech-mel-{i + 1:05d}.npy"))
        wav = np.asarray(inv(jnp.asarray(mel[None])))[0]
        wav = wav / max(1e-6, np.abs(wav).max()) * 0.8
        wav_path = os.path.join(wav_dir, f"placeholder_{i}.wav")
        wav_write(wav_path, 22050, (wav * 32767).astype(np.int16))
        rows.append(f"{wav_path}|{dur_path}")
    list_path = os.path.join(args.work, "list.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"[1/4] wrote {args.n} griffin-lim wavs", flush=True)

    # ---- 2. GTA extraction (subprocess keeps backend choice clean) -----
    cmd = [sys.executable, "-m", "tacotron2_subword_tpu.apps.gta",
           list_path, args.checkpoint, gta_dir,
           "--mel-dir", os.path.join(base, "mels"),
           "--sub-dir", os.path.join(base, "sub"),
           "--cls-dir", os.path.join(base, "cls"),
           "--batch-size", "8"]
    subprocess.run(cmd, check=True, env=env, cwd=REPO)
    n_gta = len([f for f in os.listdir(gta_dir) if f.endswith(".npy")])
    print(f"[2/4] GTA mels extracted: {n_gta}", flush=True)
    assert n_gta >= args.n

    # ---- 3. HiFi-GAN fine-tune on (GTA mel, audio) ---------------------
    cmd = [sys.executable, "-m", "tacotron2_subword_tpu.apps.train_hifigan",
           "-o", voc_dir, "--wav-dir", wav_dir, "--mel-dir", gta_dir,
           "--batch-size", "2", "--iters", str(args.iters),
           "--iters-per-checkpoint", str(args.iters)]
    subprocess.run(cmd, check=True, env=env, cwd=REPO)
    ckpts = sorted(f for f in os.listdir(voc_dir) if f.startswith("g_"))
    assert ckpts, "no fine-tuned generator checkpoint written"
    print(f"[3/4] fine-tuned generator: {ckpts[-1]}", flush=True)

    # ---- 4. vocode one GTA mel with the fine-tuned generator -----------
    import orbax.checkpoint as ocp
    from tacotron2_subword_tpu.models import hifigan as HG
    gen = ocp.PyTreeCheckpointer().restore(
        os.path.join(os.path.abspath(voc_dir), ckpts[-1]))
    h = HG.HifiganConfig()
    mel = np.load(os.path.join(gta_dir, "placeholder_0.npy"))
    y = np.asarray(HG.generator_apply(gen, h, jnp.asarray(mel[None])))[0, 0]
    assert np.isfinite(y).all()
    assert len(y) == mel.shape[1] * 256  # 8*8*2*2 upsampling
    out_wav = os.path.join(args.work, "vocoded.wav")
    wav_write(out_wav, 22050,
              (np.clip(y, -1, 1) * 32767).astype(np.int16))
    print(f"[4/4] vocoded {out_wav}: {len(y)} samples "
          f"({len(y) / 22050:.2f}s), rms {float(np.sqrt((y**2).mean())):.4f}")
    print("GTA -> HiFi-GAN fine-tune -> vocode: OK")


if __name__ == "__main__":
    main()
