"""Benchmark: audio-seconds of mel synthesized per second per chip.

Workload: batched free-running decoder inference on the full-size
dual-stream BERT-Tacotron2 (the reference's inference.py hot path,
reference model.py:467-488), gate rigged to never fire so every sample
decodes the full max_steps — a fixed, comparable amount of work.
audio-seconds = B * steps * hop / sr.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the same workload on host CPU
(scaled-down CPU run; BASELINE.json north star is >=5x).
"""

import json
import time

import numpy as np


def run(backend: str, batch: int, steps: int, repeats: int = 6):
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
    # warmup/compile.  NOTE: time via host fetch (np.asarray), not
    # block_until_ready — the axon TPU tunnel returns from
    # block_until_ready before remote completion.
    np.asarray(jfn(params, bn, text, sub, cls_p, cls_s,
                   jax.random.PRNGKey(1)))
    # Steady-state throughput: enqueue all calls back-to-back (dispatch is
    # async) and fetch at the end, so the fixed per-call dispatch round-trip
    # overlaps device compute — exactly how a serving loop would run.
    t0 = time.perf_counter()
    outs = [jfn(params, bn, text, sub, cls_p, cls_s,
                jax.random.PRNGKey(2 + i)) for i in range(repeats)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / repeats
    audio_sec = batch * steps * cfg.hop_length / cfg.sampling_rate
    return audio_sec / dt


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

    tpu_rate = run("axon", batch=128, steps=200)
    vs = tpu_rate / cpu_rate if np.isfinite(cpu_rate) else float("nan")
    print(json.dumps({
        "metric": "mel audio-seconds synthesized/sec/chip (B=128 batched inference, bf16 decoder)",
        "value": round(tpu_rate, 3),
        "unit": "audio_sec/s",
        "vs_baseline": round(vs, 3) if np.isfinite(vs) else None,
    }))


if __name__ == "__main__":
    import sys
    if "--cpu-probe" in sys.argv:
        # smaller CPU workload, normalized per audio-second
        print(run("cpu", batch=2, steps=50, repeats=1))
    else:
        main()
