"""WaveGlow vocoder training CLI (the reference's waveglow/train.py:62-152
rebuilt for TPU meshes).

    python -m tacotron2_subword_tpu.apps.train_waveglow -o outdir \
        --wav-dir data/wav [--config waveglow/config.json] [--synthetic N]

Workload: random 16000-sample segments per utterance (Mel2Samp, reference
waveglow/mel2samp.py), mel computed on the fly, flow NLL loss
(glow.py:43-59), Adam 1e-4, per-checkpoint saves.  Data parallel over the
mesh like the acoustic trainer; apex amp is replaced by native bf16 — no
loss scaler needed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tacotron2_subword_tpu.models import waveglow as WG
from tacotron2_subword_tpu.ops import stft as S
from tacotron2_subword_tpu.parallel import mesh as PM
from tacotron2_subword_tpu.utils import checkpoint as CKU

SEGMENT = 16000  # reference waveglow/config.json data_config


class Mel2SampDataset:
    """Random fixed-length segments + mels (reference waveglow/mel2samp.py)."""

    def __init__(self, wav_paths: List[str], segment: int = SEGMENT,
                 seed: int = 0):
        from scipy.io.wavfile import read
        self.wavs = []
        for p in wav_paths:
            _, data = read(p)
            wav = np.clip(data.astype(np.float32) / 32768.0, -1, 1)
            if len(wav) >= segment:
                self.wavs.append(wav)
        self.segment = segment
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.wavs)

    def sample_batch(self, batch_size: int) -> np.ndarray:
        out = np.empty((batch_size, self.segment), np.float32)
        for i in range(batch_size):
            wav = self.wavs[self.rng.randint(len(self.wavs))]
            start = self.rng.randint(0, len(wav) - self.segment + 1)
            out[i] = wav[start:start + self.segment]
        return out


class SyntheticWavs:
    def __init__(self, n: int = 8, segment: int = SEGMENT, seed: int = 0):
        self.segment = segment
        rng = np.random.RandomState(seed)
        t = np.arange(segment * 2) / 22050.0
        self.wavs = [
            (0.3 * np.sin(2 * np.pi * rng.uniform(80, 500) * t)
             + 0.05 * rng.randn(len(t))).astype(np.float32)
            for _ in range(n)]
        self.rng = rng

    def __len__(self):
        return len(self.wavs)

    sample_batch = Mel2SampDataset.sample_batch


def train(args) -> None:
    if args.config and os.path.exists(args.config):
        with open(args.config) as f:
            raw = json.load(f)
        wg_cfg = raw.get("waveglow_config", {})
        wn = wg_cfg.pop("WN_config", {})
        cfg = WG.WaveGlowConfig(
            n_mel_channels=wg_cfg.get("n_mel_channels", 80),
            n_flows=wg_cfg.get("n_flows", 12),
            n_group=wg_cfg.get("n_group", 8),
            n_early_every=wg_cfg.get("n_early_every", 4),
            n_early_size=wg_cfg.get("n_early_size", 2),
            wn_layers=wn.get("n_layers", 8),
            wn_channels=wn.get("n_channels", 256),
            wn_kernel_size=wn.get("kernel_size", 3))
        lr = raw.get("train_config", {}).get("learning_rate", 1e-4)
        sigma = raw.get("train_config", {}).get("sigma", 1.0)
    else:
        cfg, lr, sigma = WG.WaveGlowConfig(), 1e-4, 1.0
    if args.flows:
        cfg = WG.WaveGlowConfig(**{**cfg.__dict__, "n_flows": args.flows})

    os.makedirs(args.output_directory, exist_ok=True)
    mesh = PM.make_mesh()
    n_dev = mesh.devices.size

    if args.synthetic:
        ds = SyntheticWavs(args.synthetic)
    else:
        ds = Mel2SampDataset(sorted(glob.glob(
            os.path.join(args.wav_dir, "*.wav"))))
    print(f"waveglow training: {len(ds)} wavs, {n_dev} devices")

    params = WG.init_waveglow(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    rep = PM.replicate_sharding(mesh)
    data = PM.batch_sharding(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    def loss_fn(p, audio):
        mel = S.mel_spectrogram(audio)
        out = WG.forward(p, cfg, mel, audio)
        return WG.loss(out, sigma=sigma)

    def step_impl(p, o, audio):
        l, grads = jax.value_and_grad(loss_fn)(p, audio)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, l

    step = jax.jit(step_impl, in_shardings=(rep, rep, data),
                   out_shardings=(rep, rep, rep), donate_argnums=(0, 1))

    B = args.batch_size * n_dev
    for it in range(1, args.iters + 1):
        t0 = time.perf_counter()
        audio = jax.device_put(jnp.asarray(ds.sample_batch(B)), data)
        params, opt_state, loss = step(params, opt_state, audio)
        loss = float(loss)
        print(f"iter {it}: loss {loss:.4f} "
              f"{time.perf_counter() - t0:.2f}s/it", flush=True)
        if it % args.iters_per_checkpoint == 0 and jax.process_index() == 0:
            import orbax.checkpoint as ocp
            path = os.path.join(os.path.abspath(args.output_directory),
                                f"waveglow_{it}")
            ocp.PyTreeCheckpointer().save(
                path, jax.tree_util.tree_map(np.asarray, params),
                force=True)
            print(f"saved {path}")


def main():
    from tacotron2_subword_tpu.utils.platform import \
        enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output_directory", required=True)
    p.add_argument("--wav-dir", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--iters-per-checkpoint", type=int, default=200)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--flows", type=int, default=0)
    p.add_argument("--seed", type=int, default=1234)
    train(p.parse_args())


if __name__ == "__main__":
    main()
