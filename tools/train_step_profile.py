"""Device-time breakdown of the full train step (xprof op-level profile).

The reference logs only wall seconds per iteration (train.py:343-345);
this tool answers "where do the milliseconds actually go on the TPU" for
the bf16 fwd+bwd+Adam step at the pinned bench workload, by op category —
the actionable granularity (fusion names are noise, categories map to
model components).

Usage: python tools/train_step_profile.py [--batch 8] [--t-out 128]
           [--steps 10] [--out NOTE.md] [--softdtw]
NOTE: axon compile endpoint is serialized — do not run while training.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not __package__:
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:  # running from a source checkout
        sys.path.insert(0, REPO)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


from tacotron2_subword_tpu.utils.xprof import parse_xplane_ops  # noqa: E402
# (re-exported here for backward compatibility; implementation moved to
# the package so bench.py shares the same device-time parse)


CATEGORIES = (
    ("matmul/conv (MXU)", re.compile(r"dot|conv", re.I)),
    ("fusions (VPU elementwise/reduce)", re.compile(r"fusion", re.I)),
    ("copies/transposes", re.compile(r"copy|transpose|bitcast", re.I)),
    ("dynamic slice/update (scan state)",
     re.compile(r"dynamic", re.I)),
    ("all-reduce/collectives", re.compile(r"all-|collective", re.I)),
    ("rng", re.compile(r"rng|threefry", re.I)),
)


def categorize(ops):
    out = {name: 0.0 for name, _ in CATEGORIES}
    out["other"] = 0.0
    for name, ms, _n in ops:
        for cat, pat in CATEGORIES:
            if pat.search(name):
                out[cat] += ms
                break
        else:
            out["other"] += ms
    return out


def profile_infer(args):
    """--infer mode: device op breakdown of the free-running DECODE loop
    (B=args.batch, args.infer_steps decode steps) — the data behind the
    fused-decoder-step verdict: how much in-loop device time is matmul
    (already VMEM-bandwidth-bound) vs small-op overhead a Pallas megakernel
    could shave."""
    import jax

    import bench

    _cfg, make_jfn = bench._build_infer("axon", args.batch)
    jfn = make_jfn(args.infer_steps)
    np.asarray(jfn(jax.random.PRNGKey(1)))  # compile outside the trace
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            np.asarray(jfn(jax.random.PRNGKey(2)))
        ops, module_ms = parse_xplane_ops(d)

    total = sum(ms for _, ms, _ in ops)
    us_step = total * 1e3 / args.infer_steps
    lines = [f"decode device profile — B={args.batch}, "
             f"{args.infer_steps} free-running steps, bf16",
             f"device total {total:.2f} ms -> {us_step:.1f} us/step "
             f"(XLA Modules: {module_ms:.2f} ms)"]
    lines.append("")
    lines.append("by category (us/step, % of device):")
    for cat, ms in sorted(categorize(ops).items(), key=lambda t: -t[1]):
        lines.append(f"  {cat:38s} {ms * 1e3 / args.infer_steps:8.2f}  "
                     f"{100 * ms / total:5.1f}%")
    lines.append("")
    lines.append("top ops (total ms, count over the whole trace):")
    for name, ms, n in ops[:20]:
        lines.append(f"  {ms:8.3f} ms  x{n:<6d} {name[:90]}")
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write("# Decode-loop device profile\n\n```\n" + report
                    + "\n```\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t-out", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--softdtw", action="store_true")
    ap.add_argument("--infer", action="store_true",
                    help="profile the free-running decode loop instead of "
                         "the train step")
    ap.add_argument("--infer-steps", type=int, default=200)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.infer:
        profile_infer(args)
        return

    import jax

    import bench  # reuse the pinned bench workload setup

    # rebuild run_train's state/batch, then trace steps ourselves
    import jax.numpy as jnp
    from tacotron2_subword_tpu import train_lib as T
    from tacotron2_subword_tpu.config import TacotronConfig

    over = {"softdtw_loss_weight": 1.0} if args.softdtw else {}
    cfg = TacotronConfig(**over)
    state, tx = T.create_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, t_out = args.batch, args.t_out
    T_text, T_sub = 64, 32
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
    step = jax.jit(T.train_step, static_argnums=(3, 4))
    _, m = step(state, batch_d, jax.random.PRNGKey(1), cfg, tx)
    np.asarray(m["total"])  # compile outside the trace

    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            s = state
            for i in range(args.steps):
                s, m = step(s, batch_d, jax.random.PRNGKey(2 + i), cfg, tx)
            np.asarray(m["total"])
        ops, module_ms = parse_xplane_ops(d)

    total = sum(ms for _, ms, _ in ops)
    per_step = total / args.steps
    lines = [f"train-step device profile — B={B}, T_out={t_out}, bf16, "
             f"{args.steps} steps, softdtw={args.softdtw}",
             f"XLA Modules span (honest wall-on-device): "
             f"{module_ms / args.steps:.2f} ms/step",
             f"op-duration sum {total:.2f} ms -> {per_step:.2f} ms/step "
             "(counts OVERLAPPED async slice/copy-starts — use for "
             "relative category weights, not absolute time)"]
    lines.append("")
    lines.append("by category (ms/step, % of device):")
    for cat, ms in sorted(categorize(ops).items(), key=lambda t: -t[1]):
        lines.append(f"  {cat:38s} {ms / args.steps:7.3f}  "
                     f"{100 * ms / total:5.1f}%")
    lines.append("")
    lines.append("top ops (total ms over all steps):")
    for name, ms, n in ops[:15]:
        lines.append(f"  {ms:8.2f} ms  x{n:<5d} {name[:90]}")
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write("# Train-step device profile\n\n```\n" + report
                    + "\n```\n")


if __name__ == "__main__":
    main()
