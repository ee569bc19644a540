"""Benchmark: batched inference throughput + train-step throughput.

Workloads (PINNED — changing any constant changes the headline number):
 1. Inference: batched free-running decode on the full-size dual-stream
    BERT-Tacotron2 (the reference's inference.py hot path, reference
    model.py:467-488), B=128, steps=200, 6 back-to-back calls, bf16
    decoder, gate rigged to never fire so every sample decodes the full
    max_steps.  audio-seconds = B * steps * hop / sr.  Reported both as
    audio-sec/s/chip and wall us/step (amortized over the 6 enqueued
    calls — the serving pattern; per-call dispatch overlaps device work).
 2. Training: full bf16 train step (fwd+bwd+Adam, custom decoder VJP) at
    B=8 and B=64, T_out=128 — the reference logs per-iteration train time
    as a first-class metric (reference train.py:343-345, logger.py:48).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
``vs_baseline`` is the speedup over the SAME-BATCH inference workload on
the host CPU (B=128, 8 decode steps — the per-step rate is step-invariant
and 200 full-size CPU steps take hours on 2 vCPUs; batch efficiency is
what a scaled-down probe would misrepresent).  BASELINE.json north star
is >=5x.  ``extra`` carries the secondary
numbers (us/step, train ms/step + frames/s at both batch sizes, the
soft-DTW-loss train variant, vocoder synthesis rates).
"""

import json
import time

import numpy as np

INFER_BATCH = 128
INFER_STEPS = 200
INFER_REPEATS = 6
CPU_PROBE_STEPS = 8  # same batch, shorter window (see --cpu-probe)
TRAIN_T_OUT = 128
TRAIN_REPEATS = 6


def _fetch_time(fn_calls):
    """Enqueue all calls back-to-back (dispatch is async) and fetch at the
    end.  NOTE: time via host fetch (np.asarray), not block_until_ready —
    the axon TPU tunnel returns from block_until_ready before remote
    completion."""
    t0 = time.perf_counter()
    outs = [c() for c in fn_calls]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / len(fn_calls)


def run_infer(backend: str, batch: int, steps: int, repeats: int = 6):
    import jax
    jax.config.update("jax_platforms", backend)
    import jax.numpy as jnp
    from tacotron2_subword_tpu.config import TacotronConfig
    from tacotron2_subword_tpu.models import tacotron2 as M

    cfg = TacotronConfig()
    key = jax.random.PRNGKey(0)
    params, bn = M.init_tacotron2(key, cfg)
    rng = np.random.RandomState(0)
    T_text, T_sub = 64, 32
    text = jnp.asarray(rng.randint(0, cfg.n_symbols, (batch, T_text)))
    sub = jnp.asarray(rng.randint(0, cfg.sub_n_symbols, (batch, T_sub)))
    cls_p = jnp.asarray(rng.randn(batch, cfg.bert_embedding_dim)
                        .astype(np.float32))
    cls_s = jnp.asarray(rng.randn(batch, cfg.bert_embedding_dim)
                        .astype(np.float32))

    def fn(params, bn, text, sub, cls_p, cls_s, rngkey):
        out = M.infer(params, bn, cfg, text, sub, cls_p, cls_s, rng=rngkey,
                      max_steps=steps, gate_threshold=1.1)
        # Reduce ON DEVICE and fetch only the scalar: the mean depends on
        # every synthesized mel value, so fetching it proves the full decode
        # completed, without timing the host link.  (Fetching the full
        # [B, 80, steps] mel through the axon tunnel measured ~10x slower
        # than the device compute itself — xprof showed 83 us/step on-device
        # vs 1.3 ms/step wall at B=128.  Production serving feeds the mel
        # straight to the on-device vocoder, so device throughput is the
        # honest metric.)
        return jnp.float32(out["mel_postnet"].mean())

    jfn = jax.jit(fn)
    np.asarray(jfn(params, bn, text, sub, cls_p, cls_s,
                   jax.random.PRNGKey(1)))  # warmup/compile
    dt = _fetch_time([
        (lambda i=i: jfn(params, bn, text, sub, cls_p, cls_s,
                         jax.random.PRNGKey(2 + i)))
        for i in range(repeats)])
    audio_sec = batch * steps * cfg.hop_length / cfg.sampling_rate
    return audio_sec / dt, dt / steps * 1e6  # (audio_sec/s, us/step wall)


def run_train(batch: int, t_out: int = TRAIN_T_OUT,
              repeats: int = TRAIN_REPEATS, **cfg_overrides):
    """bf16 train-step throughput: ms/step (wall, amortized) and mel
    frames/s/chip.  The steps are chained through the carried state, so the
    final fetched loss forces the whole chain.  ``cfg_overrides`` lets the
    soft-DTW-loss variant reuse the pinned workload."""
    import jax
    import jax.numpy as jnp
    from tacotron2_subword_tpu.config import TacotronConfig
    from tacotron2_subword_tpu import train_lib as T

    cfg = TacotronConfig(**cfg_overrides)
    state, tx = T.create_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T_text, T_sub = batch, 64, 32
    lengths = lambda T: jnp.asarray(np.clip(
        rng.randint(T // 2, T + 1, B), 2, T))
    batch_d = {
        "text": jnp.asarray(rng.randint(0, cfg.n_symbols, (B, T_text))),
        "text_lengths": lengths(T_text),
        "sub": jnp.asarray(rng.randint(0, cfg.sub_n_symbols, (B, T_sub))),
        "sub_lengths": lengths(T_sub),
        "mels": jnp.asarray(rng.randn(B, cfg.n_mel_channels, t_out)
                            .astype(np.float32)),
        "output_lengths": lengths(t_out),
        "cls_phone": jnp.asarray(rng.randn(B, cfg.bert_embedding_dim)
                                 .astype(np.float32)),
        "cls_sub": jnp.asarray(rng.randn(B, cfg.bert_embedding_dim)
                               .astype(np.float32)),
    }
    batch_d["gate_target"] = T.make_gate_target(batch_d["output_lengths"],
                                                t_out)
    step = jax.jit(T.train_step, static_argnums=(3, 4), donate_argnums=(0,))
    state, m = step(state, batch_d, jax.random.PRNGKey(1), cfg, tx)
    np.asarray(m["total"])  # warmup/compile

    t0 = time.perf_counter()
    for i in range(repeats):
        state, m = step(state, batch_d, jax.random.PRNGKey(2 + i), cfg, tx)
    np.asarray(m["total"])  # forces the chained steps
    dt = (time.perf_counter() - t0) / repeats
    return dt * 1e3, batch * t_out / dt  # (ms/step, frames/s)


def run_vocoders(batch: int = 4, frames: int = 256, repeats: int = 6):
    """HiFi-GAN and WaveGlow synthesis rates in kHz of audio samples
    generated per second — comparable to the only hardware number in the
    reference chain, WaveGlow's ~1200 kHz on a V100
    (reference waveglow/README.md:17-18).  Returns f32 AND bf16 rates
    (bf16 params/activations, f32 conv accumulation — the production
    serving dtype)."""
    import jax
    import jax.numpy as jnp
    from tacotron2_subword_tpu.models import hifigan as HG
    from tacotron2_subword_tpu.models import waveglow as WG
    from tacotron2_subword_tpu.nn.layers import cast_floating

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(batch, 80, frames).astype(np.float32))
    khz = lambda dt: batch * frames * 256 / dt / 1e3

    h = HG.HifiganConfig()
    gen = HG.fuse_generator(HG.init_generator(jax.random.PRNGKey(0), h))
    hifi = jax.jit(lambda p, m: jnp.float32(
        HG.generator_apply(p, h, m).mean()))
    rates = {}
    for name, (g, m) in {
            "f32": (gen, mel),
            "bf16": (cast_floating(gen, jnp.bfloat16),
                     mel.astype(jnp.bfloat16))}.items():
        np.asarray(hifi(g, m))  # compile
        rates[f"hifi_{name}"] = khz(_fetch_time(
            [(lambda i=i: hifi(g, m)) for i in range(repeats)]))

    wcfg = WG.WaveGlowConfig()
    wg = WG.init_waveglow(jax.random.PRNGKey(1), wcfg)
    wg_infer = jax.jit(lambda p, m, k: jnp.float32(
        WG.infer(p, wcfg, m, sigma=0.6, key=k).mean()))
    for name, (g, m) in {
            "f32": (wg, mel),
            "bf16": (cast_floating(wg, jnp.bfloat16),
                     mel.astype(jnp.bfloat16))}.items():
        np.asarray(wg_infer(g, m, jax.random.PRNGKey(2)))  # compile
        rates[f"wg_{name}"] = khz(_fetch_time(
            [(lambda i=i: wg_infer(g, m, jax.random.PRNGKey(3 + i)))
             for i in range(repeats)]))
    return rates


def main():
    import subprocess
    import sys

    # CPU baseline in a subprocess (backend choice is process-global).
    cpu_out = subprocess.run(
        [sys.executable, __file__, "--cpu-probe"],
        capture_output=True, text=True, timeout=1800)
    try:
        cpu_rate = float(cpu_out.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        cpu_rate = float("nan")

    tpu_rate, us_per_step = run_infer("axon", INFER_BATCH, INFER_STEPS,
                                      INFER_REPEATS)
    train8_ms, train8_fps = run_train(8)
    train64_ms, train64_fps = run_train(64)
    # the same train step with the soft-DTW mel loss on (fused Pallas
    # fwd+bwd kernel; BASELINE config 3 names soft-DTW in the train-step
    # workload) — the delta vs train8_ms is the cost of the loss term
    sdtw8_ms, sdtw8_fps = run_train(8, softdtw_loss_weight=1.0)
    voc = run_vocoders()
    vs = tpu_rate / cpu_rate if np.isfinite(cpu_rate) else float("nan")
    print(json.dumps({
        "metric": ("mel audio-seconds synthesized/sec/chip "
                   f"(B={INFER_BATCH} steps={INFER_STEPS} "
                   f"x{INFER_REPEATS} batched inference, bf16 decoder)"),
        "value": round(tpu_rate, 3),
        "unit": "audio_sec/s",
        "vs_baseline": round(vs, 3) if np.isfinite(vs) else None,
        "extra": {
            "infer_us_per_step_wall": round(us_per_step, 2),
            "train_ms_per_step_B8": round(train8_ms, 2),
            "train_frames_per_s_B8": round(train8_fps, 1),
            "train_ms_per_step_B64": round(train64_ms, 2),
            "train_frames_per_s_B64": round(train64_fps, 1),
            "train_ms_per_step_B8_softdtw": round(sdtw8_ms, 2),
            "train_workload": f"bf16 fwd+bwd+Adam, T_out={TRAIN_T_OUT}, "
                              f"x{TRAIN_REPEATS} chained steps",
            "hifigan_synthesis_khz": round(voc["hifi_f32"], 1),
            "hifigan_synthesis_khz_bf16": round(voc["hifi_bf16"], 1),
            "waveglow_synthesis_khz": round(voc["wg_f32"], 1),
            "waveglow_synthesis_khz_bf16": round(voc["wg_bf16"], 1),
            "waveglow_vs_v100_1200khz": round(voc["wg_bf16"] / 1200.0, 2),
        },
    }))


if __name__ == "__main__":
    import sys
    if "--cpu-probe" in sys.argv:
        # SAME batch as the TPU run (CPU batch efficiency kept honest; a
        # scaled-down B=2 probe overstated the ratio) but 8 decode steps
        # instead of 200: per-step decode cost is step-invariant, and the
        # full 200-step workload is ~1.3 TFLOP of sequential LSTM — hours
        # on this 2-vCPU host (measured: the probe did not finish in 30
        # min).  audio-sec/s is a rate, so fewer steps changes only the
        # measurement window, not the number.
        print(run_infer("cpu", batch=INFER_BATCH, steps=CPU_PROBE_STEPS,
                        repeats=1)[0])
    else:
        main()
