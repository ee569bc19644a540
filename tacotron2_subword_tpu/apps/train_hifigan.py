"""HiFi-GAN training / GTA fine-tuning CLI.

The reference ships HiFi-GAN inference-only but carries the full
discriminator + GAN loss stack in-tree (reference
hifigan_infer/hifigan_model.py:127-281) for fine-tuning elsewhere; this CLI
completes the loop: generator + MPD/MSD adversarial training with feature
matching and 45x mel L1 (the standard HiFi-GAN recipe) over (mel, audio)
segment pairs — either ground-truth mels or GTA mels from apps.gta (the
"WaveGlow vocoder fine-tune on GTA mels" north-star config, with HiFi-GAN
as the primary vocoder).

    python -m tacotron2_subword_tpu.apps.train_hifigan -o outdir \
        --wav-dir data/wav [--mel-dir gta_mels] [--config config_v1.json] \
        [--synthetic N]
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tacotron2_subword_tpu.models import hifigan as HG
from tacotron2_subword_tpu.ops import stft as S
from tacotron2_subword_tpu.parallel import mesh as PM

SEGMENT = 8192  # reference hifigan_infer/config_v1.json segment_size


class SegmentSampler:
    """(mel, audio) segment pairs; mel from --mel-dir (GTA) when given,
    otherwise computed from the wav."""

    def __init__(self, wav_paths: List[str], mel_dir: Optional[str],
                 hop: int = 256, segment: int = SEGMENT, seed: int = 0):
        from scipy.io.wavfile import read
        self.entries = []
        n_short = 0
        for p in wav_paths:
            _, data = read(p)
            wav = np.clip(data.astype(np.float32) / 32768.0, -1, 1)
            if len(wav) < segment + hop:
                continue
            mel = None
            if mel_dir:
                mp = os.path.join(
                    mel_dir,
                    os.path.splitext(os.path.basename(p))[0] + ".npy")
                if os.path.exists(mp):
                    mel = np.load(mp)
                    # a mel shorter than one segment window would make
                    # sample_batch's randint(low >= high) raise mid-training
                    if mel.shape[1] < segment // hop:
                        n_short += 1
                        continue
            self.entries.append((wav, mel))
        if n_short:
            print(f"SegmentSampler: skipped {n_short} clips whose mel is "
                  f"shorter than {segment // hop} frames")
        self.hop = hop
        self.segment = segment
        self.frames = segment // hop
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.entries)

    def sample_batch(self, batch_size: int):
        audio = np.empty((batch_size, self.segment), np.float32)
        mels = []
        for i in range(batch_size):
            wav, mel = self.entries[self.rng.randint(len(self.entries))]
            if mel is not None:
                # the mel may run one frame past the audio (the T//hop+1
                # framing convention); clamp the offset so BOTH the mel
                # window and the audio window fit
                max_f0 = min(mel.shape[1] - self.frames,
                             (len(wav) - self.segment) // self.hop)
                f0 = self.rng.randint(0, max_f0 + 1)
                mels.append(mel[:, f0:f0 + self.frames])
                audio[i] = wav[f0 * self.hop:f0 * self.hop + self.segment]
            else:
                s0 = self.rng.randint(0, len(wav) - self.segment + 1)
                audio[i] = wav[s0:s0 + self.segment]
                mels.append(None)
        if mels[0] is None:
            mel_batch = np.asarray(S.mel_spectrogram(
                jnp.asarray(audio)))[:, :, :self.frames]
        else:
            mel_batch = np.stack(mels)
        return mel_batch, audio


class SyntheticSegments:
    def __init__(self, n: int = 8, segment: int = SEGMENT, seed: int = 0):
        rng = np.random.RandomState(seed)
        t = np.arange(segment * 2) / 22050.0
        self.entries = [((0.3 * np.sin(2 * np.pi * rng.uniform(80, 500) * t)
                          + 0.02 * rng.randn(len(t))).astype(np.float32),
                         None) for _ in range(n)]
        self.hop, self.segment, self.frames = 256, segment, segment // 256
        self.rng = rng

    __len__ = SegmentSampler.__len__
    sample_batch = SegmentSampler.sample_batch


def make_optimizer(lr: float, lr_decay: float = 1.0,
                   decay_every: int = 1) -> "optax.GradientTransformation":
    """Adam(b1=0.8, b2=0.99) with the reference's per-epoch exponential lr
    decay (reference hifigan train.py ExponentialLR(gamma=h.lr_decay),
    lr_decay=0.999 in hifigan_infer/config_v1.json).

    ``lr_decay=1.0`` returns a plain constant-lr adam with the historical
    optimizer-state structure, so old ``state_NNNNNNNN`` checkpoints saved
    before the schedule existed still restore against the template."""
    if lr_decay >= 1.0:
        return optax.adam(lr, b1=0.8, b2=0.99)
    sched = optax.exponential_decay(init_value=lr,
                                    transition_steps=max(decay_every, 1),
                                    decay_rate=lr_decay, staircase=True)
    return optax.adam(sched, b1=0.8, b2=0.99)


def restore_gan_state(path: str, gen, disc, opt_g, opt_d):
    """Restore a ``state_NNNNNNNN`` dir against freshly-initialized
    templates so structure/type mismatches (e.g. an optax version changing
    optimizer-state fields or their ordering) fail loudly instead of
    leaves silently landing in the wrong slots."""
    import orbax.checkpoint as ocp
    template = {"gen": gen, "disc": disc, "opt_g": opt_g,
                "opt_d": opt_d, "it": 0}
    st = ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                          item=template)
    return (st["gen"], st["disc"], st["opt_g"], st["opt_d"],
            int(st["it"]))


def train(args) -> None:
    h = (HG.HifiganConfig.from_json(args.config) if args.config
         else HG.HifiganConfig())
    os.makedirs(args.output_directory, exist_ok=True)
    mesh = PM.make_mesh()
    n_dev = mesh.devices.size

    if args.synthetic:
        ds = SyntheticSegments(args.synthetic)
    else:
        ds = SegmentSampler(sorted(glob.glob(
            os.path.join(args.wav_dir, "*.wav"))), args.mel_dir)
    print(f"hifigan training: {len(ds)} clips, {n_dev} devices")

    kg, kd = jax.random.split(jax.random.PRNGKey(args.seed))
    gen = HG.init_generator(kg, h)
    disc = HG.init_discriminators(kd)
    # "epoch" for the per-epoch reference decay = one pass over the clips
    B_total = args.batch_size * n_dev
    decay_every = args.decay_every or max(len(ds) // max(B_total, 1), 1)
    if args.lr_decay < 1.0:
        print(f"lr decay {args.lr_decay} every {decay_every} iters "
              f"(reference ExponentialLR per epoch)")
    tx_g = make_optimizer(args.lr, args.lr_decay, decay_every)
    tx_d = make_optimizer(args.lr, args.lr_decay, decay_every)
    opt_g, opt_d = tx_g.init(gen), tx_d.init(disc)
    start_it = 0
    if args.resume:
        gen, disc, opt_g, opt_d, start_it = restore_gan_state(
            args.resume, gen, disc, opt_g, opt_d)
        print(f"resumed GAN state at iter {start_it} from {args.resume}")

    rep = PM.replicate_sharding(mesh)
    data = PM.batch_sharding(mesh)
    gen, disc = jax.device_put(gen, rep), jax.device_put(disc, rep)
    opt_g, opt_d = jax.device_put(opt_g, rep), jax.device_put(opt_d, rep)

    def d_loss_fn(disc_p, gen_p, mel, audio):
        y_hat = HG.generator_apply(gen_p, h, mel)
        y = audio[:, None, :]
        rs, gs, _, _ = HG.discriminators_apply(
            disc_p, y, jax.lax.stop_gradient(y_hat))
        return HG.discriminator_loss(rs, gs)

    def g_loss_fn(gen_p, disc_p, mel, audio):
        y_hat = HG.generator_apply(gen_p, h, mel)
        y = audio[:, None, :]
        rs, gs, fr, fg = HG.discriminators_apply(disc_p, y, y_hat)
        mel_hat = S.mel_spectrogram(y_hat[:, 0, :])
        mel_y = S.mel_spectrogram(audio)
        n = min(mel_hat.shape[-1], mel_y.shape[-1])
        loss_mel = jnp.mean(jnp.abs(mel_hat[..., :n] - mel_y[..., :n]))
        total = (HG.generator_adv_loss(gs) + HG.feature_loss(fr, fg)
                 + 45.0 * loss_mel)
        return total, loss_mel

    def mel_only_loss_fn(gen_p, mel, audio):
        y_hat = HG.generator_apply(gen_p, h, mel)
        mel_hat = S.mel_spectrogram(y_hat[:, 0, :])
        mel_y = S.mel_spectrogram(audio)
        n = min(mel_hat.shape[-1], mel_y.shape[-1])
        loss_mel = jnp.mean(jnp.abs(mel_hat[..., :n] - mel_y[..., :n]))
        total = 45.0 * loss_mel
        if args.stft_loss_weight:
            # full-resolution log-|STFT| L1 (the Parallel-WaveGAN spectral
            # term): constrains the 513-bin envelope detail an 80-bin mel
            # cannot see — inter-bin valleys/peaks that spectral-envelope
            # metrics (and ears) do register
            sm_hat = S.stft_magnitude(y_hat[:, 0, :], 1024, 256, 1024)
            sm_y = S.stft_magnitude(audio, 1024, 256, 1024)
            k = min(sm_hat.shape[-1], sm_y.shape[-1])
            loss_stft = jnp.mean(jnp.abs(
                jnp.log(jnp.maximum(sm_hat[..., :k], 1e-5))
                - jnp.log(jnp.maximum(sm_y[..., :k], 1e-5))))
            total = total + args.stft_loss_weight * loss_stft
        return total, loss_mel

    def step_impl(gen_p, disc_p, og, od, mel, audio):
        if args.mel_only:
            # regression polish: pure 45x mel-L1, discriminators frozen —
            # the standard post-GAN generator fine-tune that trades a
            # little texture sharpness for spectral-envelope accuracy
            (gl, lmel), ggrads = jax.value_and_grad(
                mel_only_loss_fn, has_aux=True)(gen_p, mel, audio)
            gupd, og = tx_g.update(ggrads, og, gen_p)
            gen_p = optax.apply_updates(gen_p, gupd)
            return gen_p, disc_p, og, od, jnp.float32(0.0), gl, lmel
        dl, dgrads = jax.value_and_grad(d_loss_fn)(disc_p, gen_p, mel,
                                                   audio)
        dupd, od = tx_d.update(dgrads, od, disc_p)
        disc_p = optax.apply_updates(disc_p, dupd)
        (gl, lmel), ggrads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gen_p, disc_p, mel, audio)
        gupd, og = tx_g.update(ggrads, og, gen_p)
        gen_p = optax.apply_updates(gen_p, gupd)
        return gen_p, disc_p, og, od, dl, gl, lmel

    step = jax.jit(step_impl,
                   in_shardings=(rep, rep, rep, rep, data, data),
                   out_shardings=(rep,) * 7,
                   donate_argnums=(0, 1, 2, 3))

    B = B_total
    curve_path = os.path.join(args.output_directory, "loss_curve.csv")
    curve_new = not (args.resume and os.path.exists(curve_path))
    curve = open(curve_path, "w" if curve_new else "a")
    if curve_new:
        curve.write("iter,d_loss,g_loss,mel_l1,s_per_it\n")
    t0 = time.perf_counter()
    for it in range(start_it + 1, start_it + args.iters + 1):
        mel, audio = ds.sample_batch(B)
        mel = jax.device_put(jnp.asarray(mel), data)
        audio = jax.device_put(jnp.asarray(audio), data)
        gen, disc, opt_g, opt_d, dl, gl, lmel = step(gen, disc, opt_g,
                                                     opt_d, mel, audio)
        # fetch losses only every --log-interval iters: a per-iteration
        # float() forces a round-trip through the axon tunnel (~30 ms
        # dispatch) and would dominate the step time
        if it % args.log_interval == 0:
            s_it = (time.perf_counter() - t0) / args.log_interval
            print(f"iter {it}: d {float(dl):.3f} g {float(gl):.3f} "
                  f"mel {float(lmel):.3f} {s_it:.2f}s/it", flush=True)
            curve.write(f"{it},{float(dl):.4f},{float(gl):.4f},"
                        f"{float(lmel):.4f},{s_it:.3f}\n")
            curve.flush()
            t0 = time.perf_counter()
        if it % args.iters_per_checkpoint == 0 and jax.process_index() == 0:
            import orbax.checkpoint as ocp
            out = os.path.abspath(args.output_directory)
            ocp.PyTreeCheckpointer().save(
                os.path.join(out, f"g_{it:08d}"),
                jax.tree_util.tree_map(np.asarray, gen), force=True)
            # full GAN state for --resume (disc + both optimizers)
            ocp.PyTreeCheckpointer().save(
                os.path.join(out, f"state_{it:08d}"),
                jax.tree_util.tree_map(
                    np.asarray,
                    {"gen": gen, "disc": disc, "opt_g": opt_g,
                     "opt_d": opt_d, "it": it}), force=True)
            print(f"saved g_{it:08d} + state_{it:08d}")
    curve.close()


def main():
    from tacotron2_subword_tpu.utils.platform import \
        enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output_directory", required=True)
    p.add_argument("--wav-dir", default=None)
    p.add_argument("--mel-dir", default=None,
                   help="GTA mels from apps.gta (else GT mels from wavs)")
    p.add_argument("--config", default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr-decay", type=float, default=0.999,
                   help="per-epoch exponential lr decay (reference "
                        "config_v1.json lr_decay; 1.0 = constant lr with "
                        "the pre-schedule optimizer-state layout — use "
                        "1.0 to --resume checkpoints saved before the "
                        "schedule existed)")
    p.add_argument("--decay-every", type=int, default=0,
                   help="iters per decay step (0 = one epoch = "
                        "len(dataset)/batch)")
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--iters-per-checkpoint", type=int, default=200)
    p.add_argument("--log-interval", type=int, default=1,
                   help="fetch/print losses every N iters (per-iter "
                        "fetches cost a ~30 ms tunnel round-trip each)")
    p.add_argument("--resume", default=None,
                   help="state_NNNNNNNN dir from a previous run (restores "
                        "gen+disc+optimizers+iteration)")
    p.add_argument("--stft-loss-weight", type=float, default=0.0,
                   help="add w * log-|STFT| L1 (513-bin) to the --mel-only "
                        "objective — full-resolution envelope detail")
    p.add_argument("--mel-only", action="store_true",
                   help="regression polish: update the generator with the "
                        "45x mel-L1 term only (no adversarial/feature "
                        "losses, discriminators frozen) — run a few k "
                        "iters after the GAN phase to sharpen the "
                        "spectral envelope")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--seed", type=int, default=1234)
    train(p.parse_args())


if __name__ == "__main__":
    main()
