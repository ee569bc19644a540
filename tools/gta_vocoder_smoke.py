"""End-to-end GTA → vocoder fine-tune smoke: the reference's production
workflow (GTA mel extraction feeding a HiFi-GAN fine-tune, reference
GTA.py + the in-tree discriminator stack hifigan_infer/hifigan_model.py:
127-281), driven over the synthetic corpus with a trained checkpoint.

Steps:
 1. Griffin-Lim waveforms from the corpus ground-truth mels (the synthetic
    corpus ships no audio) → {work}/wavs/placeholder_{i}.wav; the last
    --eval-n utterances are HELD OUT of the fine-tune
 2. apps.gta: teacher-forced mel extraction with the trained acoustic
    checkpoint → {work}/gta_mels/placeholder_{i}.npy
 3. apps.train_hifigan on (GTA mel, waveform) pairs for --iters steps
 4. held-out mel-L1 (|mel(G(gta_mel)) - gt_mel|, the standard HiFi-GAN
    validation metric) for the INIT generator vs the FINE-TUNED one, +
    vocode a held-out GTA mel → {work}/vocoded.wav; with --report, write
    the before/after table to {report}/gta_hifigan_finetune.md and copy
    the wav next to it

Usage: python tools/gta_vocoder_smoke.py --data /tmp/synth_data \
           --checkpoint /tmp/run_full/checkpoint_best --work /tmp/gta_smoke \
           [--split val] [--iters 500] [--eval-n 2] [--report reports/] \
           [--cpu]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not __package__:
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:  # running from a source checkout
        sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--eval-n", type=int, default=2,
                    help="trailing utterances held out of the fine-tune "
                         "for the before/after mel-L1 evaluation")
    ap.add_argument("--report", default=None,
                    help="directory to write gta_hifigan_finetune.md + the "
                         "fine-tuned-vocoder wav into")
    ap.add_argument("--hifigan-batch", type=int, default=2)
    ap.add_argument("--ckpt-every", type=int, default=0,
                    help="checkpoint interval for the fine-tune (default: "
                         "once at the end)")
    ap.add_argument("--log-interval", type=int, default=1)
    ap.add_argument("--resume", default=None,
                    help="pass through to train_hifigan --resume")
    ap.add_argument("--skip-wavs", action="store_true",
                    help="reuse {work}/wavs + gta_mels from a previous run "
                         "(steps 1-2 skipped)")
    ap.add_argument("--corpus-wavs", action="store_true",
                    help="use the corpus's PHASE-TRUE ground-truth audio "
                         "({split}/wav/{i}.wav from the round-5 audio-first "
                         "make_synthetic_dataset) instead of Griffin-Lim "
                         "renders — the fair setting for a neural-vocoder-"
                         "vs-GL comparison")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip the fine-tune too: evaluate the newest "
                         "g_* under {work}/hifigan against Griffin-Lim "
                         "(use with --skip-wavs)")
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
    eval_wav_dir = os.path.join(args.work, "eval_wavs")
    gta_dir = os.path.join(args.work, "gta_mels")
    voc_dir = os.path.join(args.work, "hifigan")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(eval_wav_dir, exist_ok=True)

    # ---- 1. Griffin-Lim audio from ground-truth mels -------------------
    # (held-out eval utterances land in a separate dir so the fine-tune
    # never sees them)
    from scipy.io.wavfile import write as wav_write
    rows = []
    n_train = args.n - args.eval_n
    list_path = os.path.join(args.work, "list.txt")
    MEL_FLOOR = float(np.log(1e-5))
    if args.skip_wavs:
        print("[1-2/4] --skip-wavs: reusing existing wavs + GTA mels",
              flush=True)
    elif args.corpus_wavs:
        # phase-true ground truth shipped by the corpus itself: copy into
        # the train/held-out split under the placeholder naming the GTA +
        # fine-tune steps key on
        import shutil
        for i in range(args.n):
            dur_path = os.path.join(base, "durations", f"{i}.npy")
            src = os.path.join(base, "wav", f"{i}.wav")
            out_dir = wav_dir if i < n_train else eval_wav_dir
            wav_path = os.path.join(out_dir, f"placeholder_{i}.wav")
            shutil.copy(src, wav_path)
            rows.append(f"{wav_path}|{dur_path}")
        with open(list_path, "w") as f:
            f.write("\n".join(rows) + "\n")
        print(f"[1/4] copied {args.n} phase-true corpus wavs "
              f"({args.eval_n} held out)", flush=True)
    else:
        # bucket the mel length before the jitted Griffin-Lim: each distinct
        # length would remote-compile a fresh program (minutes per shape on the
        # serialized axon endpoint); slice the wav back to the true length
        inv = jax.jit(lambda m: S.inv_mel_spec(m))
        for i in range(args.n):
            dur_path = os.path.join(base, "durations", f"{i}.npy")
            mel = np.load(os.path.join(base, "mels",
                                       f"ljspeech-mel-{i + 1:05d}.npy"))
            T = mel.shape[1]
            pad_f = -(-T // 64) * 64
            mel_p = np.pad(mel, ((0, 0), (0, pad_f - T)),
                           constant_values=MEL_FLOOR)
            wav = np.asarray(inv(jnp.asarray(mel_p[None])))[0][: T * 256]
            wav = wav / max(1e-6, np.abs(wav).max()) * 0.8
            out_dir = wav_dir if i < n_train else eval_wav_dir
            wav_path = os.path.join(out_dir, f"placeholder_{i}.wav")
            wav_write(wav_path, 22050, (wav * 32767).astype(np.int16))
            rows.append(f"{wav_path}|{dur_path}")
        with open(list_path, "w") as f:
            f.write("\n".join(rows) + "\n")
        print(f"[1/4] wrote {args.n} griffin-lim wavs "
              f"({args.eval_n} held out)", flush=True)

    if not args.skip_wavs:
        # ---- 2. GTA extraction (subprocess keeps backend choice clean) --
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
    if not args.eval_only:
        cmd = [sys.executable, "-m",
               "tacotron2_subword_tpu.apps.train_hifigan",
               "-o", voc_dir, "--wav-dir", wav_dir, "--mel-dir", gta_dir,
               "--batch-size", str(args.hifigan_batch),
               "--iters", str(args.iters),
               "--log-interval", str(args.log_interval),
               "--iters-per-checkpoint", str(args.ckpt_every or args.iters)]
        if args.resume:
            cmd += ["--resume", args.resume]
        subprocess.run(cmd, check=True, env=env, cwd=REPO)
    ckpts = sorted(f for f in os.listdir(voc_dir) if f.startswith("g_"))
    assert ckpts, "no fine-tuned generator checkpoint written"
    ft_iters = int(ckpts[-1].split("_")[1])
    print(f"[3/4] fine-tuned generator: {ckpts[-1]}", flush=True)

    # ---- 4. held-out mel-L1 before/after + vocode ----------------------
    import orbax.checkpoint as ocp
    from tacotron2_subword_tpu.models import hifigan as HG
    h = HG.HifiganConfig()
    gen_init = HG.init_generator(jax.random.PRNGKey(1234), h)
    gen_ft = ocp.PyTreeCheckpointer().restore(
        os.path.join(os.path.abspath(voc_dir), ckpts[-1]))

    apply_fn = jax.jit(lambda p, m: HG.generator_apply(p, h, m))
    mel_fn = jax.jit(lambda y: S.mel_spectrogram(y))

    def vocode_b(gen_params, gta: np.ndarray) -> np.ndarray:
        """Generator over a 64-frame-bucketed mel (one compile per bucket,
        not per utterance length), waveform cut to the true length."""
        T = gta.shape[1]
        pad_f = -(-T // 64) * 64
        m = np.pad(gta, ((0, 0), (0, pad_f - T)),
                   constant_values=MEL_FLOOR)
        y = np.asarray(apply_fn(gen_params, jnp.asarray(m[None])))[0, 0]
        # upsampling-factor check on the RAW generator output (8*8*2*2=256
        # samples per frame) — the post-slice length is true by construction
        assert len(y) == pad_f * 256, (len(y), pad_f)
        return y[: T * 256]

    from tacotron2_subword_tpu.apps.best_checkpoint import mel_bucketed

    from scipy.io.wavfile import read as wav_read

    def melL1(gen_params, idx: int):
        """Two held-out mel-L1s for G(gta_mel): vs the corpus ground-truth
        MEL, and vs mel(gt_wav) — the mel of the Griffin-Lim-rendered,
        amplitude-normalized AUDIO the fine-tune actually trains against
        (GL phase noise + the 0.8/max rescale shift the audio's mel away
        from the corpus mel, so the first metric carries a floor no
        vocoder can pass)."""
        gta = np.load(os.path.join(gta_dir, f"placeholder_{idx}.npy"))
        gt = np.load(os.path.join(base, "mels",
                                  f"ljspeech-mel-{idx + 1:05d}.npy"))
        _, gw = wav_read(os.path.join(eval_wav_dir,
                                      f"placeholder_{idx}.wav"))
        gt_wav_mel = mel_bucketed(mel_fn, gw.astype(np.float32) / 32768.0)
        y = vocode_b(gen_params, gta)
        m = mel_bucketed(mel_fn, np.clip(y, -1, 1))
        n = min(m.shape[-1], gt.shape[-1])
        n2 = min(m.shape[-1], gt_wav_mel.shape[-1])
        return (float(np.mean(np.abs(m[:, :n] - gt[:, :n]))),
                float(np.mean(np.abs(m[:, :n2] - gt_wav_mel[:, :n2]))))

    eval_ids = list(range(n_train, args.n))
    init_pairs = [melL1(gen_init, i) for i in eval_ids]
    ft_pairs = [melL1(gen_ft, i) for i in eval_ids]
    l1_init, l1_init_w = (float(np.mean([p[j] for p in init_pairs]))
                          for j in (0, 1))
    l1_ft, l1_ft_w = (float(np.mean([p[j] for p in ft_pairs]))
                      for j in (0, 1))
    print(f"[4/4] held-out mel-L1 vs gt_mel: init {l1_init:.4f} -> "
          f"fine-tuned {l1_ft:.4f}; vs mel(gt_wav): init {l1_init_w:.4f} "
          f"-> fine-tuned {l1_ft_w:.4f} ({ft_iters} iters, "
          f"{len(eval_ids)} utts)", flush=True)

    # wav-level MCD on held-out GTA mels: fine-tuned HiFi-GAN vs the
    # Griffin-Lim floor, both against the corpus ground-truth audio
    # (the reference's acceptance metric, evaluation.py:70-104)
    from scipy.io.wavfile import read as wav_read
    from tacotron2_subword_tpu.eval import mcd_between_wavs
    inv = jax.jit(lambda m: S.inv_mel_spec(m))

    def gl_b(gta: np.ndarray) -> np.ndarray:
        T = gta.shape[1]
        pad_f = -(-T // 64) * 64
        m = np.pad(gta, ((0, 0), (0, pad_f - T)), constant_values=MEL_FLOOR)
        y = np.asarray(inv(jnp.asarray(m[None])))[0][: T * 256]
        if args.corpus_wavs:
            return y  # RMS-matched to gt below, same as the HiFi-GAN arm
        # legacy GL-rendered-gt mode: same 0.8-peak normalization as the
        # ground-truth renders, so the MCD energy coefficient sees no
        # scale mismatch
        return y / max(1e-6, np.abs(y).max()) * 0.8

    def rms_match(y: np.ndarray, ref: np.ndarray) -> np.ndarray:
        """Loudness-equalize a vocoded output to the ground truth so the
        MCD level coefficient compares spectra, not gains — applied to
        BOTH arms identically."""
        r = np.sqrt(np.mean(ref ** 2)) / max(np.sqrt(np.mean(y ** 2)), 1e-9)
        return y * r

    mcd_hifi, mcd_gl = [], []
    for i in eval_ids:
        gta = np.load(os.path.join(gta_dir, f"placeholder_{i}.npy"))
        _, gt16 = wav_read(os.path.join(eval_wav_dir,
                                        f"placeholder_{i}.wav"))
        gt = gt16.astype(np.float32) / 32768.0
        y_hifi = vocode_b(gen_ft, gta)
        y_gl = gl_b(gta)
        if args.corpus_wavs:
            y_hifi = rms_match(y_hifi, gt)
            y_gl = rms_match(y_gl, gt)
        m1 = mcd_between_wavs(np.clip(y_hifi, -1, 1), gt, fs=22050)
        m2 = mcd_between_wavs(np.clip(y_gl, -1, 1), gt, fs=22050)
        if m1 is not None and m2 is not None:
            mcd_hifi.append(m1)
            mcd_gl.append(m2)
    mcd_hifi_m = float(np.mean(mcd_hifi)) if mcd_hifi else float("nan")
    mcd_gl_m = float(np.mean(mcd_gl)) if mcd_gl else float("nan")
    print(f"held-out wav-MCD vs ground truth: fine-tuned HiFi-GAN "
          f"{mcd_hifi_m:.3f} vs Griffin-Lim {mcd_gl_m:.3f} "
          f"({len(mcd_hifi)} utts)", flush=True)

    mel = np.load(os.path.join(gta_dir, f"placeholder_{eval_ids[0]}.npy"))
    y = vocode_b(gen_ft, mel)
    assert np.isfinite(y).all()
    out_wav = os.path.join(args.work, "vocoded.wav")
    wav_write(out_wav, 22050,
              (np.clip(y, -1, 1) * 32767).astype(np.int16))
    print(f"vocoded {out_wav}: {len(y)} samples "
          f"({len(y) / 22050:.2f}s), rms {float(np.sqrt((y**2).mean())):.4f}")

    if args.report:
        os.makedirs(args.report, exist_ok=True)
        import shutil
        shutil.copy(out_wav, os.path.join(args.report,
                                          "vocoded_gta_hifigan.wav"))
        if args.corpus_wavs:
            gt_note = (
                "Ground truth is the corpus's PHASE-TRUE audio (round-5 "
                "audio-first synthesis, tools/make_synthetic_dataset.py): "
                "the corpus mel IS mel(gt_wav), so neither vocoder shares "
                "an artifact family with the target and the comparison is "
                "fair.  Both arms are RMS-matched to the ground truth "
                "before MCD.\n\n")
            mel_note = ("(gt_mel here equals mel(gt_wav) up to the final "
                        "frame's padding — the two columns should agree)"
                        "\n\n")
        else:
            gt_note = (
                "(caveat: the corpus 'ground-truth' audio is itself a "
                "Griffin-Lim render — the GL row shares its artifact "
                "family with the target, an advantage no neural vocoder "
                "gets on this synthetic corpus)\n\n")
            mel_note = (
                "(the gt_mel column carries a floor no vocoder can pass: "
                "the training audio is a Griffin-Lim render normalized to "
                "0.8 peak, whose own mel differs from gt_mel by phase "
                "noise + a constant log-amplitude shift)\n\n")
        with open(os.path.join(args.report, "gta_hifigan_finetune.md"),
                  "w") as f:
            f.write(
                "# GTA -> HiFi-GAN fine-tune (reference production "
                "workflow)\n\n"
                f"Acoustic checkpoint: `{args.checkpoint}`; "
                f"{n_train} train / {len(eval_ids)} held-out utterances; "
                f"{ft_iters} GAN fine-tune iters (MPD+MSD+feature-"
                "matching+45x mel-L1, apps/train_hifigan.py), GTA mels "
                "from apps/gta.py.\n\n"
                "| generator | mel-L1 vs gt_mel | mel-L1 vs mel(gt_wav) "
                "(training target) |\n"
                "|---|---|---|\n"
                f"| random init | {l1_init:.4f} | {l1_init_w:.4f} |\n"
                f"| fine-tuned ({ft_iters} iters) | {l1_ft:.4f} | "
                f"{l1_ft_w:.4f} |\n\n"
                + mel_note +
                "Held-out wav-MCD vs corpus ground-truth audio "
                "(CheapTrick-style MCEP, 16 kHz eval):\n\n"
                "| vocoder | wav-MCD |\n"
                "|---|---|\n"
                f"| fine-tuned HiFi-GAN | {mcd_hifi_m:.3f} |\n"
                f"| Griffin-Lim (60 iters) | {mcd_gl_m:.3f} |\n\n"
                + gt_note +
                "G/D loss balance + mel-L1 curves: "
                f"`{os.path.join(voc_dir, 'loss_curve.csv')}`.\n\n"
                "`vocoded_gta_hifigan.wav` is a held-out GTA mel vocoded "
                "by the fine-tuned generator.\n")
        print(f"report -> {args.report}/gta_hifigan_finetune.md")
    print("GTA -> HiFi-GAN fine-tune -> vocode: OK")


if __name__ == "__main__":
    main()
