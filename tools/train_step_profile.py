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
import glob
import os
import re
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse_xplane_ops(trace_dir: str):
    """[(op_name, total_ms, n_events)] from the device 'XLA Ops' lines of
    the newest xplane.pb (pure-python protobuf fallback, CLAUDE.md)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    agg, module_ms = {}, 0.0
    for plane in space.planes:
        if "TPU" not in plane.name or "Host" in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Modules" in line.name:
                module_ms += sum(ev.duration_ps / 1e9
                                 for ev in line.events)
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                ms, n = agg.get(name, (0.0, 0))
                agg[name] = (ms + ev.duration_ps / 1e9, n + 1)
    return (sorted(((k, v[0], v[1]) for k, v in agg.items()),
                   key=lambda t: -t[1]), module_ms)


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t-out", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--softdtw", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

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
             f"device total {total:.2f} ms -> {per_step:.2f} ms/step "
             f"(XLA Modules line: {module_ms / args.steps:.2f} ms/step)"]
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
