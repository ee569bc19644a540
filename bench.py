"""Benchmark: batched inference throughput + train-step throughput.

Workloads (PINNED — changing any constant changes the headline number):
 1. Inference: batched free-running decode on the full-size dual-stream
    BERT-Tacotron2 (the reference's inference.py hot path, reference
    model.py:467-488), B=128, steps=200, 6 back-to-back calls, bf16
    decoder, gate rigged to never fire so every sample decodes the full
    max_steps.  audio-seconds = B * steps * hop / sr.
 2. Training: full bf16 train step (fwd+bwd+Adam, custom decoder VJP) at
    B=8 and B=64, T_out=128 — the reference logs per-iteration train time
    as a first-class metric (reference train.py:343-345, logger.py:48).

The HEADLINE value is the xprof DEVICE-time rate: one traced window of the
6-call workload, audio-seconds / (device 'XLA Modules' ms).  Wall clock
through the axon tunnel carries ~30 ms/call dispatch jitter and drifted
7% between otherwise-identical round-2/3 runs, so wall is demoted to
``extra`` as the median of WALL_WINDOWS windows (with min/max spread so
the variance is in the artifact, not hidden).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
``vs_baseline`` divides the headline by a SLOPE-CALIBRATED host-CPU rate
for the same-batch workload: interleaved (8, 72)-step window pairs, rate
from each pair's (t72 - t8) decode slope (cancels the per-call
encoder+dispatch fixed cost the round-3 advisor flagged — a single 8-step
window understated CPU per-step cost ~2x), median over 5 pairs per probe,
MAX over three probes spread across the bench (the VM's CPU throttles in
multi-minute periods; the max is its unthrottled sustained speed).
BASELINE.json north star is >=5x.
"""

import json
import time

import numpy as np

INFER_BATCH = 128
INFER_STEPS = 200
INFER_REPEATS = 6
WALL_WINDOWS = 3
CPU_PROBE_STEPS = (8, 72)  # slope calibration (see --cpu-probe)
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


def _build_infer(backend: str, batch: int):
    """Full-size model + pinned inputs; returns (cfg, make_jfn) where
    make_jfn(steps) jits the gate-rigged decode at that step count."""
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

    def make_jfn(steps):
        def fn(rngkey):
            out = M.infer(params, bn, cfg, text, sub, cls_p, cls_s,
                          rng=rngkey, max_steps=steps, gate_threshold=1.1)
            # Reduce ON DEVICE and fetch only the scalar: the mean depends
            # on every synthesized mel value, so fetching it proves the
            # full decode completed, without timing the host link.
            # (Fetching the full [B, 80, steps] mel through the axon tunnel
            # measured ~10x slower than the device compute itself.
            # Production serving feeds the mel straight to the on-device
            # vocoder, so device throughput is the honest metric.)
            return jnp.float32(out["mel_postnet"].mean())
        return jax.jit(fn)

    return cfg, make_jfn


def run_infer(backend: str, batch: int, steps: int, repeats: int = 6,
              profile: bool = False):
    import jax
    cfg, make_jfn = _build_infer(backend, batch)

    jfn = make_jfn(steps)
    np.asarray(jfn(jax.random.PRNGKey(1)))  # warmup/compile
    audio_sec = batch * steps * cfg.hop_length / cfg.sampling_rate

    def window(seed0):
        return _fetch_time([
            (lambda i=i: jfn(jax.random.PRNGKey(seed0 + i)))
            for i in range(repeats)])

    if not profile:
        dt = window(2)
        return {"audio_per_s_wall": audio_sec / dt,
                "us_per_step_wall": dt / steps * 1e6, "dt_wall": dt}

    # wall: median over WALL_WINDOWS back-to-back-enqueued windows
    walls = sorted(window(2 + 100 * w) for w in range(WALL_WINDOWS))
    dt_med = walls[len(walls) // 2]
    # device: ONE traced window, 'XLA Modules' span per call
    import tempfile
    from tacotron2_subword_tpu.utils.xprof import device_module_ms
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            window(1000)
        dev_ms = device_module_ms(d)
    dt_dev = dev_ms / 1e3 / repeats
    return {
        "audio_per_s_device": audio_sec / dt_dev,
        "us_per_step_device": dt_dev / steps * 1e6,
        "audio_per_s_wall": audio_sec / dt_med,
        "us_per_step_wall": dt_med / steps * 1e6,
        "wall_window_min_s": walls[0], "wall_window_max_s": walls[-1],
    }


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


def run_mel_extraction(batch: int = 64, seconds: float = 3.0,
                       repeats: int = 6):
    """BASELINE config 2 (batch GTA mel extraction): [B, T] waveform →
    log-mel via the framed-matmul STFT (ops/stft.py — one MXU einsum per
    stage).  Reports the xprof DEVICE-time rate alongside wall, in
    audio-seconds processed per second and µs per mel frame; the roofline
    argument lives in reports/tpu_kernel_evidence.md."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from tacotron2_subword_tpu.ops import stft as S
    from tacotron2_subword_tpu.utils.xprof import device_module_ms

    T = int(seconds * 22050) // 256 * 256
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(batch, T) * 0.1).astype(np.float32))
    fn = jax.jit(lambda y: jnp.float32(S.mel_spectrogram(y).mean()))
    np.asarray(fn(wav))  # warmup/compile
    audio_sec = batch * T / 22050.0
    n_frames = batch * (T // 256 + 1)
    wall = _fetch_time([(lambda: fn(wav)) for _ in range(repeats)])
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            _fetch_time([(lambda: fn(wav)) for _ in range(repeats)])
        dev_ms = device_module_ms(d)
    dt_dev = dev_ms / 1e3 / repeats
    return {
        "audio_per_s_device": audio_sec / dt_dev,
        "us_per_frame_device": dt_dev * 1e6 / n_frames,
        "audio_per_s_wall": audio_sec / wall,
        "batch": batch, "samples": T,
    }


def run_cpu_probe(batch: int = INFER_BATCH, pairs: int = 5):
    """Slope-calibrated host-CPU baseline: INTERLEAVED (t_lo, t_hi) window
    pairs, rate from each pair's time difference, median over pairs.
    The slope cancels the per-call fixed cost (encoder convs + BiLSTM +
    dispatch) a single short window mis-attributed to decode steps (the
    round-3 advisor's ~2x understatement); interleaving puts both windows
    of a pair under the same instantaneous host speed, so the VM's
    multi-minute CPU-performance drift (measured: ±15% between probe runs
    minutes apart) cancels within each pair.  Prints one JSON line.

    The persistent compilation cache is enabled (CPU-only process; the
    axon-tunnel breakage doesn't apply) — the two full-size while-loop
    compiles dominate the probe's 12-25 min cold wall time and are
    skipped on every later run."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tacotron2_subword_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    cfg, make_jfn = _build_infer("cpu", batch)
    s1, s2 = CPU_PROBE_STEPS
    jfn_lo, jfn_hi = make_jfn(s1), make_jfn(s2)
    np.asarray(jfn_lo(jax.random.PRNGKey(1)))  # warmup/compile
    np.asarray(jfn_hi(jax.random.PRNGKey(1)))
    audio_per_step = batch * cfg.hop_length / cfg.sampling_rate
    slopes, pair_times = [], []
    for k in range(pairs):
        t_lo = _fetch_time([lambda: jfn_lo(jax.random.PRNGKey(2 + k))])
        t_hi = _fetch_time([lambda: jfn_hi(jax.random.PRNGKey(2 + k))])
        slopes.append((s2 - s1) * audio_per_step / (t_hi - t_lo))
        pair_times.append((round(t_lo, 4), round(t_hi, 4)))
    slopes.sort()
    print(json.dumps({
        "cpu_audio_per_s_slope": slopes[len(slopes) // 2],
        "slope_spread": [round(slopes[0], 2), round(slopes[-1], 2)],
        "t_probe_s": pair_times,
        "cpu_audio_per_s_window8":
            s1 * audio_per_step / pair_times[0][0],
    }))


def main():
    import subprocess
    import sys

    # CPU baseline via subprocesses (backend choice is process-global).
    # The VM's CPU speed is bimodal (~52 vs ~59 audio-sec/s sustained;
    # multi-minute throttle periods), so THREE probe runs are SPREAD
    # across the whole bench (start / after-train / after-vocoders) and
    # the baseline is the MAX of their medians — the best sustained host
    # speed, i.e. the unthrottled capability of the baseline hardware,
    # robust to a dip swallowing consecutive probes.  A warm-cache probe
    # is ~30 s; only the first (possibly compile-heavy) run is long.
    probe_rates, cpu = [], {}

    def probe(timeout):
        nonlocal cpu
        try:
            cpu_out = subprocess.run(
                [sys.executable, __file__, "--cpu-probe"],
                capture_output=True, text=True, timeout=timeout)
            cpu = json.loads(cpu_out.stdout.strip().splitlines()[-1])
            probe_rates.append(float(cpu["cpu_audio_per_s_slope"]))
        except (subprocess.TimeoutExpired, ValueError, IndexError, KeyError):
            # a lost probe must not crash the bench after the expensive TPU
            # work: the max-of-medians baseline tolerates a missing sample
            pass

    probe(3600)
    infer = run_infer("axon", INFER_BATCH, INFER_STEPS, INFER_REPEATS,
                      profile=True)
    tpu_rate = infer["audio_per_s_device"]
    train8_ms, train8_fps = run_train(8)
    train64_ms, train64_fps = run_train(64)
    # the same train step with the soft-DTW mel loss on (fused Pallas
    # fwd+bwd kernel; BASELINE config 3 names soft-DTW in the train-step
    # workload) — the delta vs train8_ms is the cost of the loss term
    sdtw8_ms, sdtw8_fps = run_train(8, softdtw_loss_weight=1.0)
    melx = run_mel_extraction()
    probe(900)
    voc = run_vocoders()
    probe(900)
    cpu_rate = float(max(probe_rates)) if probe_rates else float("nan")
    vs = tpu_rate / cpu_rate if np.isfinite(cpu_rate) else float("nan")
    print(json.dumps({
        "metric": ("mel audio-seconds synthesized/sec/chip, xprof device "
                   f"time (B={INFER_BATCH} steps={INFER_STEPS} "
                   f"x{INFER_REPEATS} batched inference, bf16 decoder)"),
        "value": round(tpu_rate, 3),
        "unit": "audio_sec/s",
        "vs_baseline": round(vs, 3) if np.isfinite(vs) else None,
        "extra": {
            "infer_us_per_step_device": round(
                infer["us_per_step_device"], 2),
            "infer_audio_per_s_wall_median": round(
                infer["audio_per_s_wall"], 1),
            "infer_us_per_step_wall_median": round(
                infer["us_per_step_wall"], 2),
            "infer_wall_window_spread_s": [
                round(infer["wall_window_min_s"], 3),
                round(infer["wall_window_max_s"], 3)],
            "cpu_baseline_audio_per_s_slope": round(cpu_rate, 2)
                if np.isfinite(cpu_rate) else None,
            "cpu_probe_medians": [round(r, 2) for r in probe_rates],
            "cpu_probe_windows_s": cpu.get("t_probe_s"),
            "train_ms_per_step_B8": round(train8_ms, 2),
            "train_frames_per_s_B8": round(train8_fps, 1),
            "train_ms_per_step_B64": round(train64_ms, 2),
            "train_frames_per_s_B64": round(train64_fps, 1),
            "train_ms_per_step_B8_softdtw": round(sdtw8_ms, 2),
            "train_workload": f"bf16 fwd+bwd+Adam, T_out={TRAIN_T_OUT}, "
                              f"x{TRAIN_REPEATS} chained steps",
            "mel_extract_audio_per_s_device": round(
                melx["audio_per_s_device"], 1),
            "mel_extract_us_per_frame_device": round(
                melx["us_per_frame_device"], 3),
            "mel_extract_audio_per_s_wall": round(
                melx["audio_per_s_wall"], 1),
            "mel_extract_workload": (
                f"B={melx['batch']} x {melx['samples']} samples, "
                "mel_spectrogram (framed-matmul STFT)"),
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
        # scaled-down B=2 probe overstated the ratio) but short step
        # counts: the full 200-step workload is ~1.3 TFLOP of sequential
        # LSTM — hours on this 2-vCPU host (measured: it did not finish
        # in 30 min).  The (8, 72)-step SLOPE is the per-step decode
        # rate with the per-call fixed cost cancelled.
        run_cpu_probe()
    else:
        main()
