"""Run the Pallas kernels on the REAL TPU and record timing + parity vs the
scan/jnp reference paths — hardware evidence that the kernels compile and
match outside interpret mode (CI runs them interpret-only on CPU).

Covers:
 - softdtw_pallas           forward wavefront kernel
 - softdtw_pallas_grad      FUSED forward+backward wavefront kernel
                            (the reference ships this pair as numba CUDA
                            kernels, soft_dtw_cuda.py:33-111)
 - matmul_dequant_int8      weight-only int8 matmul kernel (ops/quant.py)

Usage: python tools/tpu_kernel_evidence.py [--out NOTE.md]
NOTE: the axon compile endpoint is serialized — do not run while training.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
import time

import numpy as np

if not __package__:
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:  # running from a source checkout
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the C++ protobuf runtime in this image cannot load the tsl xplane schema;
# must be set before any protobuf import (CLAUDE.md xprof recipe)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _parse_xplane_device_ms(trace_dir: str) -> dict:
    """{xla_module_name: [event_ms, ...]} from the device planes of the
    newest xplane.pb under ``trace_dir`` (pure-python protobuf fallback —
    see CLAUDE.md 'Wall-clock through the axon tunnel is NOT device time')."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        return {}
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    per_module: dict = {}
    for plane in space.planes:
        if "TPU" not in plane.name or "Host" in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Modules" not in line.name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_module.setdefault(name, []).append(
                    ev.duration_ps / 1e9)
    return per_module


def device_ms(fn, *args, repeats: int = 10):
    """Median on-DEVICE ms per call of the dominant XLA module, captured
    with the JAX profiler (wall time through the axon tunnel carries ~30 ms
    of dispatch overhead per call and cannot rank kernels)."""
    import jax
    import jax.numpy as jnp

    def fetch(o):
        np.asarray(jnp.asarray(o).sum() if not isinstance(o, tuple)
                   else sum(jnp.asarray(x).sum() for x in o))

    fetch(fn(*args))  # warm/compile outside the trace
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            outs = [fn(*args) for _ in range(repeats)]
            for o in outs:
                fetch(o)
        mods = _parse_xplane_device_ms(d)
    if not mods:
        return float("nan")
    # the measured fn dominates total device time; the fetch-reduction
    # modules are ~us noise
    name = max(mods, key=lambda k: sum(mods[k]))
    return float(np.median(mods[name]))


def fetch_ms(fn, *args, repeats=10):
    """Median wall ms over enqueued calls, timed by host fetch of a scalar
    reduction (block_until_ready returns early through the axon tunnel)."""
    import jax.numpy as jnp
    out = fn(*args)
    np.asarray(jnp.asarray(out).sum() if not isinstance(out, tuple)
               else sum(jnp.asarray(o).sum() for o in out))  # warm/compile
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(repeats)]
    for o in outs:
        np.asarray(jnp.asarray(o).sum() if not isinstance(o, tuple)
                   else sum(jnp.asarray(x).sum() for x in o))
    return (time.perf_counter() - t0) / repeats * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tacotron2_subword_tpu.ops import softdtw as SD
    from tacotron2_subword_tpu.ops import quant as Q

    platform = jax.devices()[0].platform
    lines = [f"TPU kernel evidence — platform={platform}, "
             f"device={jax.devices()[0].device_kind}"]
    ok = True

    # --- soft-DTW: the reference profile harness shapes
    # (soft_dtw_cuda.py:421-428) ---------------------------------------
    rng = np.random.default_rng(0)
    # 128/192 pin the auto_impl crossover boundary (ops/softdtw.py
    # PALLAS_LARGE_MIN) between the measured 64x64 scan win and the
    # 256x256 fused-kernel win
    for (B, L_a, L_b) in [(128, 17, 15), (512, 64, 64), (512, 128, 128),
                          (512, 192, 192), (512, 256, 256)]:
        x = jnp.asarray(rng.standard_normal((B, L_a, 2), dtype=np.float32))
        y = jnp.asarray(rng.standard_normal((B, L_b, 2), dtype=np.float32))
        D = SD.euclidean_dist_matrix(x, y)

        scan_fb = jax.jit(jax.value_and_grad(
            lambda d: jnp.sum(SD.softdtw(d, 1.0, 0.0))))
        pal_f = jax.jit(lambda d: SD.softdtw_pallas(d, 1.0, 0.0))
        pal_fb = jax.jit(lambda d: SD.softdtw_pallas_grad(d, 1.0, 0.0))

        v_scan, g_scan = scan_fb(D)
        v_pal = pal_f(D)
        v_pal2, E = pal_fb(D)
        # RELATIVE value tolerance: v_scan is a sum over B utterances
        # (~1e4-1e5), so f32 summation-order noise alone is ~1e-3 absolute
        vmag = max(float(jnp.abs(v_scan)), 1.0)
        dv = float(jnp.abs(jnp.sum(v_pal) - v_scan)) / vmag
        dv2 = float(jnp.abs(jnp.sum(v_pal2) - v_scan)) / vmag
        dg = float(jnp.abs(E - g_scan).max())
        t_scan = fetch_ms(scan_fb, D)
        t_f = fetch_ms(pal_f, D)
        t_fb = fetch_ms(pal_fb, D)
        d_scan = device_ms(scan_fb, D)
        d_f = device_ms(pal_f, D)
        d_fb = device_ms(pal_fb, D)
        good = dv < 1e-5 and dv2 < 1e-5 and dg < 1e-5
        ok &= good
        lines.append(
            f"softdtw B={B} {L_a}x{L_b}: scan fwd+bwd {t_scan:.2f} ms "
            f"(device {d_scan:.3f}) | pallas fwd {t_f:.2f} ms "
            f"(device {d_f:.3f}) | pallas FUSED fwd+bwd {t_fb:.2f} ms "
            f"(device {d_fb:.3f}) | "
            f"rel_dval={dv:.2e}/{dv2:.2e} |dgrad|max={dg:.2e} "
            f"{'OK' if good else 'MISMATCH'}")

    # --- int8 weight-only matmul kernel (stacked LSTM layout [S,B,K]) ---
    for (M, K, N) in [(8, 1792, 4096), (128, 1792, 4096)]:
        S_stack = 2
        xq = jnp.asarray(rng.standard_normal((S_stack, M, K),
                                             dtype=np.float32)
                         ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((S_stack, K, N),
                                            dtype=np.float32))
        w_q, scale = Q.quantize_int8(w, axis=1)
        ref = jax.jit(lambda x, wq, s: Q._ref_matmul(x, wq, s))
        ker = jax.jit(lambda x, wq, s: Q.matmul_dequant_int8(x, wq, s))
        r0 = np.asarray(ref(xq, w_q, scale), np.float32)
        r1 = np.asarray(ker(xq, w_q, scale), np.float32)
        rel = np.abs(r1 - r0).max() / max(np.abs(r0).max(), 1e-6)
        t_ref = fetch_ms(ref, xq, w_q, scale)
        t_ker = fetch_ms(ker, xq, w_q, scale)
        d_ref = device_ms(ref, xq, w_q, scale)
        d_ker = device_ms(ker, xq, w_q, scale)
        good = rel < 2e-2
        ok &= good
        lines.append(f"int8 matmul {M}x{K}x{N}: jnp-ref {t_ref:.2f} ms "
                     f"(device {d_ref:.3f}) | pallas {t_ker:.2f} ms "
                     f"(device {d_ker:.3f}) | rel_err {rel:.2e} "
                     f"{'OK' if good else 'MISMATCH'}")

    # --- mel-extraction pipeline: measured device time vs roofline ------
    # (BASELINE config 2 names batch GTA mel extraction; the north star
    # lists STFT/mel as a Pallas rFFT+filterbank candidate — this is the
    # measured verdict on whether the framed-matmul formulation already
    # sits at the hardware bound, ops/stft.py:1-19)
    from tacotron2_subword_tpu.ops import stft as S
    B_mel, T_mel = 64, 66304  # ~3 s per utterance
    wav = jnp.asarray((rng.standard_normal((B_mel, T_mel),
                                           dtype=np.float32) * 0.1))
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        y = wav.astype(dtype)
        mel_fn = jax.jit(lambda w: S.mel_spectrogram(w))
        d_mel = device_ms(mel_fn, y)
        t_mel_w = fetch_ms(mel_fn, y)
        F = T_mel // 256 + 1
        flops = 2 * B_mel * F * (1024 * 1026 + 513 * 80)
        # HBM bytes if every intermediate materializes: frames in+out of
        # the einsum, basis, spec, mel (upper bound; fusion reduces it)
        bytes_hi = 4 * (B_mel * T_mel + 2 * B_mel * F * 1024
                        + 1026 * 1024 + B_mel * 1026 * F + B_mel * 80 * F)
        achieved_tf = flops / (d_mel / 1e3) / 1e12
        achieved_gbs = bytes_hi / (d_mel / 1e3) / 1e9
        audio_rate = B_mel * T_mel / 22050.0 / (d_mel / 1e3)
        lines.append(
            f"mel_extract {name} B={B_mel} T={T_mel} (F={F}): device "
            f"{d_mel:.3f} ms (wall {t_mel_w:.1f}) = {audio_rate:,.0f} "
            f"audio-sec/s | {achieved_tf:.1f} TFLOP/s achieved "
            f"({flops / 1e9:.1f} GFLOP) | {achieved_gbs:.0f} GB/s vs "
            f"819 GB/s HBM if fully materialized ({bytes_hi / 1e6:.0f} MB)")

    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write("# Pallas kernels on real TPU\n\n```\n" + report
                    + "\n```\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
