"""Quality evaluation of trained checkpoints on the synthetic dataset
(tools/make_synthetic_dataset.py): free-running inference from phone IDs,
then mel soft-DTW + MCD vs ground truth (the reference's acceptance metrics,
evaluation.py:70-117 / softdtw.py:75-97, applied at mel level since the
synthetic corpus has no recorded audio).

Performance notes (hard-won, see CLAUDE.md):
 - ONE batched decode per (checkpoint, threshold), via ONE jitted infer
   function shared across the whole sweep with the gate threshold as a
   traced argument — per-utterance calls and per-threshold recompiles cost
   minutes each through the serialized axon compile endpoint;
 - metrics run host-side in numpy (eval.metrics.softdtw_np): the jax
   soft-DTW would compile once per distance-matrix shape.

Usage: python tools/eval_synthetic.py --data /tmp/synth_data \
           --checkpoint /tmp/run/checkpoint_best [--sweep-dir RUN_DIR] \
           [--gate-thresholds 0.5,0.001] [--n 16] [--out-csv eval.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

# repo root on sys.path (running `python tools/eval_synthetic.py` puts only
# tools/ there; do NOT use PYTHONPATH — it breaks axon plugin discovery)
if not __package__:
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:  # running from a source checkout
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--sweep-dir", default=None,
                    help="evaluate every checkpoint_* in this directory "
                         "(the reference best_checkpoint.py ledger, "
                         "best_checkpoint.py:436-597, at mel level); one "
                         "XLA compile is reused across all checkpoints")
    ap.add_argument("--hparams", default=None)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--max-steps", type=int, default=256)
    ap.add_argument("--gate-thresholds", default=None,
                    help="comma-separated list; default = cfg value (the "
                         "reference's 0.001 is hair-trigger — a healthy "
                         "gate's noise floor is ~3e-3; 0.5 is the robust "
                         "setting)")
    ap.add_argument("--out-csv", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tacotron2_subword_tpu.config import create_config
    from tacotron2_subword_tpu import train_lib as T
    from tacotron2_subword_tpu.models import tacotron2 as M
    from tacotron2_subword_tpu.eval import metrics as EM
    from tacotron2_subword_tpu.utils import checkpoint as CK

    cfg = create_config(hparams_string=args.hparams)
    skeleton, _ = T.create_train_state(jax.random.PRNGKey(0), cfg)
    thresholds = ([float(t) for t in args.gate_thresholds.split(",")]
                  if args.gate_thresholds else [cfg.gate_threshold])

    if args.sweep_dir:
        from tacotron2_subword_tpu.apps.best_checkpoint import \
            list_checkpoints
        ckpts = list_checkpoints(args.sweep_dir)
    else:
        if not args.checkpoint:
            ap.error("one of --checkpoint / --sweep-dir is required")
        ckpts = [args.checkpoint]

    # ONE jitted batched decode reused across every checkpoint AND
    # threshold (threshold is traced, not baked in)
    @jax.jit
    def infer_fn(params, bn, text, sub, cls, t_lens, s_lens, thresh):
        return M.infer(params, bn, cfg, text, sub, cls, cls,
                       rng=jax.random.PRNGKey(100),
                       max_steps=args.max_steps, gate_threshold=thresh,
                       text_lengths=t_lens, sub_lengths=s_lens)

    batch = load_val_batch(args)
    ledger, rows = [], []
    # resumable sweep ledger: append each (checkpoint, gate) row as it is
    # produced and skip rows already present (the reference's resumable CSV
    # pattern, best_checkpoint.py:444-456) — a killed sweep loses nothing
    sweep_csv = args.out_csv if args.sweep_dir else None
    done = set()
    if sweep_csv and os.path.exists(sweep_csv):
        with open(sweep_csv, newline="") as f:
            for r in csv.DictReader(f):
                done.add((r["checkpoint"], float(r["gate"])))
                ledger.append(r)
    for ckpt in ckpts:
        todo = [t for t in thresholds
                if (os.path.basename(ckpt), t) not in done]
        if not todo:
            print(f"{os.path.basename(ckpt)}: already in ledger, skipping",
                  flush=True)
            continue
        state, _meta = CK.load_checkpoint(ckpt, skeleton)
        for thr in todo:
            summary, rows = eval_checkpoint(args, state, ckpt, thr,
                                            infer_fn, batch, EM)
            ledger.append(summary)
            print(f"{os.path.basename(ckpt)} gate={thr}: "
                  f"softdtw(mel)={summary['softdtw']:.4f}  "
                  f"MCD={summary['mcd']:.4f}  "
                  f"len_err={summary['len_err']*100:.1f}%  "
                  f"gate_ok={summary['gate_ok']}/{summary['n']}", flush=True)
            if sweep_csv:
                new = not os.path.exists(sweep_csv)
                if not new:
                    # resume-append must match the existing header exactly,
                    # or rows silently misalign with the old columns
                    with open(sweep_csv, newline="") as f:
                        header = next(csv.reader(f))
                    if header != list(summary.keys()):
                        raise SystemExit(
                            f"{sweep_csv} header {header} != current summary "
                            f"schema {list(summary.keys())}; move the old "
                            "ledger aside or use a new --sweep-csv name")
                with open(sweep_csv, "a", newline="") as f:
                    w = csv.DictWriter(f,
                                       fieldnames=list(summary.keys()))
                    if new:
                        w.writeheader()
                    w.writerow(summary)

    if args.out_csv and not sweep_csv:
        out_rows = ledger if len(ledger) > 1 else rows
        with open(args.out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(out_rows[0].keys()))
            w.writeheader()
            w.writerows(out_rows)
        print("wrote", args.out_csv)


def load_val_batch(args):
    base = os.path.join(args.data, "val")
    raw = []
    for i in range(args.n):
        dur = np.load(os.path.join(base, "durations", f"{i}.npy"))
        raw.append((dur[:, 0].astype(np.int32),
                    np.load(os.path.join(base, "sub", f"{i}.npy"))))
    # padded shapes derived from the corpus, rounded to fixed multiples:
    # still ONE compile for the whole sweep
    T_TEXT = -(-max(len(p) for p, _ in raw) // 16) * 16
    T_SUB = -(-max(len(s) for _, s in raw) // 8) * 8
    texts, subs, clss, gts, t_lens, s_lens = [], [], [], [], [], []
    for i in range(args.n):
        phones, sub_ids = raw[i]
        texts.append(np.pad(phones, (0, T_TEXT - len(phones))))
        subs.append(np.pad(sub_ids, (0, T_SUB - len(sub_ids))))
        clss.append(np.load(os.path.join(base, "cls", f"{i}.npy")))
        gts.append(np.load(os.path.join(base, "mels",
                                        f"ljspeech-mel-{i+1:05d}.npy")))
        t_lens.append(len(phones))
        s_lens.append(len(sub_ids))
    return dict(text=jnp.asarray(np.stack(texts)),
                sub=jnp.asarray(np.stack(subs)),
                cls=jnp.asarray(np.stack(clss)),
                t_lens=jnp.asarray(t_lens), s_lens=jnp.asarray(s_lens),
                gts=gts)


def eval_checkpoint(args, state, ckpt, thr, infer_fn, batch, EM):
    import scipy.fftpack

    out = infer_fn(state.params, state.bn_state, batch["text"],
                   batch["sub"], batch["cls"], batch["t_lens"],
                   batch["s_lens"], jnp.float32(thr))
    mel_b = np.asarray(out["mel_postnet"], np.float32)
    lens_b = np.asarray(out["mel_lengths"])
    ok_b = np.asarray(out["infer_ok"])

    rows, sdtw_vals, mcd_vals, len_err = [], [], [], []
    for i in range(args.n):
        gt = batch["gts"][i]
        n_frames = int(lens_b[i])
        pred = mel_b[i, :, :max(n_frames, 2)]

        # mel soft-DTW (normalized per frame-pair)  [reference softdtw.py]
        D = ((pred.T[:, None, :] - gt.T[None, :, :]) ** 2).sum(-1)
        sdtw = EM.softdtw_np(D, gamma=1.0) / (D.shape[0] + D.shape[1])
        # MCD over DTW-aligned MCEPs computed directly from the mel (the
        # synthetic GT has no waveform; apply the MCD formula to DCT-II
        # cepstra of the log-mels, aligned by exact DTW)
        mcep_p = scipy.fftpack.dct(pred.T, type=2, norm="ortho")[:, 1:14]
        mcep_g = scipy.fftpack.dct(gt.T, type=2, norm="ortho")[:, 1:14]
        mcd = float(EM.mcd_from_mcep(mcep_p, mcep_g))
        sdtw_vals.append(sdtw)
        mcd_vals.append(mcd)
        len_err.append(abs(n_frames - gt.shape[1]) / gt.shape[1])
        rows.append({"utt": i, "gate": thr, "frames_pred": n_frames,
                     "frames_gt": gt.shape[1], "softdtw": round(sdtw, 4),
                     "mcd": round(mcd, 4),
                     "gate_ok": bool(ok_b[i])})

    summary = {
        "checkpoint": os.path.basename(ckpt), "step": int(state.step),
        "gate": thr, "n": len(rows), "softdtw": float(np.mean(sdtw_vals)),
        "mcd": float(np.mean(mcd_vals)), "len_err": float(np.mean(len_err)),
        "gate_ok": sum(r["gate_ok"] for r in rows),
    }
    return summary, rows


if __name__ == "__main__":
    main()
