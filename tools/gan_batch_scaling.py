#!/usr/bin/env python
"""Measure HiFi-GAN GAN-step throughput vs batch size on the real chip.

CLAUDE.md's remaining-work note conjectures that fine-tuning at B=16+
beats the r5 recipe's B=4 ("B=4 discriminator is noisy; faster GAN
convergence per wall-clock").  The convergence half needs a long run, but
the throughput half is measurable in minutes: if a B=16 step costs much
less than 4x a B=4 step, every GAN iteration averages 4x more segments
for little extra wall-clock — both a variance win (smoother discriminator
gradients) and an examples/s win.

Full-size v1 generator + MPD/MSD discriminators + both optimizer updates
(the exact step_impl shape of apps/train_hifigan, reference
hifigan_infer/hifigan_model.py:127-281), synthetic 8192-sample segments.
Timing is wall over a chained run with a single trailing scalar fetch
(never per-iter fetches: ~30 ms tunnel dispatch each; see CLAUDE.md).

    python tools/gan_batch_scaling.py [--batches 4 16] [--iters 20] \
        [--out reports/gan_batch_scaling_r5.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

if __package__ in (None, ""):
    try:
        import tacotron2_subword_tpu  # noqa: F401
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))


def measure(batch_sizes, iters: int, warmup: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tacotron2_subword_tpu.apps.train_hifigan import (SEGMENT,
                                                          SyntheticSegments,
                                                          make_optimizer)
    from tacotron2_subword_tpu.models import hifigan as HG
    from tacotron2_subword_tpu.ops import stft as S

    h = HG.HifiganConfig()  # full-size v1
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    gen = HG.init_generator(kg, h)
    disc = HG.init_discriminators(kd)
    tx = make_optimizer(2e-4, lr_decay=1.0)

    def d_loss_fn(disc_p, gen_p, mel, audio):
        y_hat = HG.generator_apply(gen_p, h, mel)
        rs, gs, _, _ = HG.discriminators_apply(
            disc_p, audio[:, None, :], jax.lax.stop_gradient(y_hat))
        return HG.discriminator_loss(rs, gs)

    def g_loss_fn(gen_p, disc_p, mel, audio):
        y_hat = HG.generator_apply(gen_p, h, mel)
        rs, gs, fr, fg = HG.discriminators_apply(
            disc_p, audio[:, None, :], y_hat)
        mel_hat = S.mel_spectrogram(y_hat[:, 0, :])
        mel_y = S.mel_spectrogram(audio)
        n = min(mel_hat.shape[-1], mel_y.shape[-1])
        loss_mel = jnp.mean(jnp.abs(mel_hat[..., :n] - mel_y[..., :n]))
        return (HG.generator_adv_loss(gs) + HG.feature_loss(fr, fg)
                + 45.0 * loss_mel)

    def step(gen_p, disc_p, og, od, mel, audio):
        dl, dgrads = jax.value_and_grad(d_loss_fn)(disc_p, gen_p, mel,
                                                   audio)
        dupd, od = tx.update(dgrads, od, disc_p)
        disc_p = optax.apply_updates(disc_p, dupd)
        gl, ggrads = jax.value_and_grad(g_loss_fn)(gen_p, disc_p, mel,
                                                   audio)
        gupd, og = tx.update(ggrads, og, gen_p)
        gen_p = optax.apply_updates(gen_p, gupd)
        return gen_p, disc_p, og, od, dl + gl

    jstep = jax.jit(step, donate_argnums=(0, 1, 2, 3))

    ds = SyntheticSegments(32)
    rows = []
    for B in batch_sizes:
        # deep-copy: jstep donates its param/opt inputs, and the originals
        # must survive for the next batch size
        g, d = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      (gen, disc))
        og, od = tx.init(g), tx.init(d)
        mel_np, audio_np = ds.sample_batch(B)
        mel = jnp.asarray(mel_np)
        audio = jnp.asarray(audio_np)
        t0 = time.perf_counter()
        g, d, og, od, loss = jstep(g, d, og, od, mel, audio)
        float(loss)  # force: compile + first step
        compile_s = time.perf_counter() - t0
        for _ in range(warmup):
            g, d, og, od, loss = jstep(g, d, og, od, mel, audio)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            g, d, og, od, loss = jstep(g, d, og, od, mel, audio)
        final = float(loss)  # one trailing fetch times the whole chain
        s_it = (time.perf_counter() - t0) / iters
        seg_s = B / s_it
        audio_s = seg_s * SEGMENT / 22050.0
        rows.append({"B": B, "s_per_it": s_it, "segments_per_s": seg_s,
                     "audio_s_per_s": audio_s, "compile_s": compile_s,
                     "loss": final})
        print(f"B={B}: {s_it*1e3:.1f} ms/it, {seg_s:.1f} segments/s "
              f"({audio_s:.0f} audio-sec/s), compile {compile_s:.0f}s, "
              f"loss {final:.2f}", flush=True)
        del g, d, og, od
    return rows


def converge(batch_sizes, seconds: float, chunk: int = 25):
    """Equal-WALL-time convergence: run each batch size from the same init
    for ``seconds`` of training wall and report the mel-L1 reached — the
    direct test of "B=16 converges faster per wall-clock".  Fresh batches
    are sampled per chunk (both arms identically), mel-L1 fetched once per
    chunk (a per-iter fetch would add ~30 ms dispatch each)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tacotron2_subword_tpu.apps.train_hifigan import (SyntheticSegments,
                                                          make_optimizer)
    from tacotron2_subword_tpu.models import hifigan as HG
    from tacotron2_subword_tpu.ops import stft as S

    h = HG.HifiganConfig()
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    gen = HG.init_generator(kg, h)
    disc = HG.init_discriminators(kd)
    tx = make_optimizer(2e-4, lr_decay=1.0)

    def d_loss_fn(disc_p, gen_p, mel, audio):
        y_hat = HG.generator_apply(gen_p, h, mel)
        rs, gs, _, _ = HG.discriminators_apply(
            disc_p, audio[:, None, :], jax.lax.stop_gradient(y_hat))
        return HG.discriminator_loss(rs, gs)

    def g_loss_fn(gen_p, disc_p, mel, audio):
        y_hat = HG.generator_apply(gen_p, h, mel)
        rs, gs, fr, fg = HG.discriminators_apply(
            disc_p, audio[:, None, :], y_hat)
        mel_hat = S.mel_spectrogram(y_hat[:, 0, :])
        mel_y = S.mel_spectrogram(audio)
        n = min(mel_hat.shape[-1], mel_y.shape[-1])
        loss_mel = jnp.mean(jnp.abs(mel_hat[..., :n] - mel_y[..., :n]))
        return (HG.generator_adv_loss(gs) + HG.feature_loss(fr, fg)
                + 45.0 * loss_mel), loss_mel

    def step(gen_p, disc_p, og, od, mel, audio):
        _, dgrads = jax.value_and_grad(d_loss_fn)(disc_p, gen_p, mel, audio)
        dupd, od = tx.update(dgrads, od, disc_p)
        disc_p = optax.apply_updates(disc_p, dupd)
        (_, lmel), ggrads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gen_p, disc_p, mel, audio)
        gupd, og = tx.update(ggrads, og, gen_p)
        gen_p = optax.apply_updates(gen_p, gupd)
        return gen_p, disc_p, og, od, lmel

    jstep = jax.jit(step, donate_argnums=(0, 1, 2, 3))
    ds = SyntheticSegments(32)
    rows = []
    for B in batch_sizes:
        g, d = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      (gen, disc))
        og, od = tx.init(g), tx.init(d)
        mel_np, audio_np = ds.sample_batch(B)
        g, d, og, od, lmel = jstep(g, d, og, od, jnp.asarray(mel_np),
                                   jnp.asarray(audio_np))
        float(lmel)  # compile, excluded from the budget
        iters, t0 = 0, time.perf_counter()
        history = []
        while time.perf_counter() - t0 < seconds:
            mel_np, audio_np = ds.sample_batch(B)
            mel, audio = jnp.asarray(mel_np), jnp.asarray(audio_np)
            for _ in range(chunk):
                g, d, og, od, lmel = jstep(g, d, og, od, mel, audio)
            iters += chunk
            history.append(float(lmel))
        final = float(np.median(history[-3:]))
        rows.append({"B": B, "iters": iters, "mel_l1": final,
                     "segments": iters * B})
        print(f"B={B}: {iters} iters / {iters*B} segments in {seconds:.0f}s "
              f"wall, mel L1 {final:.3f} (start {history[0]:.3f})",
              flush=True)
        del g, d, og, od
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 16])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--converge", type=float, default=0.0, metavar="SECONDS",
                    help="instead of step timing, train each batch size "
                         "for SECONDS of equal wall from the same init and "
                         "report the mel-L1 reached")
    ap.add_argument("--out", default=None,
                    help="append a markdown table to this report file")
    args = ap.parse_args()
    if args.converge:
        rows = converge(args.batches, args.converge)
        if args.out:
            with open(args.out, "a", encoding="utf-8") as f:
                f.write("\n| B | iters | segments seen | mel L1 @ equal "
                        "wall |\n|---|---|---|---|\n")
                for r in rows:
                    f.write("| %d | %d | %d | %.3f |\n" % (
                        r["B"], r["iters"], r["segments"], r["mel_l1"]))
            print(f"appended table to {args.out}")
        return
    rows = measure(args.batches, args.iters)
    if args.out and rows:
        base = rows[0]
        with open(args.out, "a", encoding="utf-8") as f:
            f.write("\n| B | ms/it | segments/s | audio-sec/s | compile s "
                    "| vs B=%d wall | vs B=%d thru |\n|---|---|---|---|---"
                    "|---|---|\n" % (base["B"], base["B"]))
            for r in rows:
                f.write("| %d | %.1f | %.1f | %.0f | %.0f | %.2fx | %.2fx "
                        "|\n" % (r["B"], r["s_per_it"] * 1e3,
                                 r["segments_per_s"], r["audio_s_per_s"],
                                 r["compile_s"],
                                 r["s_per_it"] / base["s_per_it"],
                                 r["segments_per_s"]
                                 / base["segments_per_s"]))
        print(f"appended table to {args.out}")


if __name__ == "__main__":
    main()
