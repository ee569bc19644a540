"""Training CLI — the reference's train.py (reference train.py:188-439)
rebuilt for TPU meshes.

    python -m tacotron2_subword_tpu.apps.train -o outdir -l logdir \
        --train-list data/preprocess/train.txt --val-list .../val.txt \
        --mel-dir ... --sub-dir ... --cls-dir ... [--hparams "[k:v-k:v]"]

Differences from the reference, by design:
 - no subprocess launcher / NCCL init: data parallelism is a jit over a
   ``jax.sharding.Mesh`` (params replicated, batch sharded; XLA emits the
   gradient all-reduce) — reference distributed.py:132-200 disappears;
 - the lossy sqrt(B) sub-batch collate (reference data_utils.py:146-160) is
   replaced by length-bucketed static shapes (nothing dropped);
 - checkpoints are Orbax dirs with the same naming/auto-resume/best
   semantics (reference train.py:86-123,182-186,244-263,366-368);
 - an explicit --checkpoint path wins over auto-scan (the reference's scan
   overwrites it, train.py:248 — documented fix).

``--synthetic N`` trains on generated data (shape-compatible with the real
pipeline) for smoke/perf runs without a dataset on disk.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_subword_tpu.config import TacotronConfig, create_config
from tacotron2_subword_tpu import train_lib as T
from tacotron2_subword_tpu.data import BertTacotron2Dataset, BucketedLoader
from tacotron2_subword_tpu.data.dataset import PrefetchLoader, load_filepaths
from tacotron2_subword_tpu.parallel import mesh as PM
from tacotron2_subword_tpu.utils import checkpoint as CK
from tacotron2_subword_tpu.utils.logging_utils import Tacotron2Logger


class SyntheticDataset:
    """Shape-compatible synthetic dataset for smoke and perf runs."""

    def __init__(self, cfg: TacotronConfig, n: int = 64, seed: int = 0):
        self.cfg = cfg
        self.n = n
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed * 100003 + i)
        T_text = rng.randint(20, 60)
        T_mel = rng.randint(80, 240)
        return {
            "text": rng.randint(0, self.cfg.n_symbols, T_text
                                ).astype(np.int32),
            "sub": rng.randint(0, self.cfg.sub_n_symbols,
                               rng.randint(8, 24)).astype(np.int32),
            "cls": rng.randn(self.cfg.bert_embedding_dim
                             ).astype(np.float32),
            "mel": rng.randn(self.cfg.n_mel_channels, T_mel
                             ).astype(np.float32),
            "durations": np.ones(T_text, np.int32),
        }


def device_batch(batch: Dict[str, np.ndarray], mesh) -> Dict[str, jnp.ndarray]:
    sharding = PM.batch_sharding(mesh)
    if jax.process_count() > 1:
        # each process holds its contiguous row slice of the global batch
        # (BucketedLoader shard_within_batch); assemble the global array
        return {k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v)) for k, v in batch.items()}
    return {k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in batch.items()}


def replicate_global(x, mesh):
    """Replicated device value that is valid under multi-process meshes
    (every process must supply the identical host value)."""
    s = PM.replicate_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(s, np.asarray(x))
    return jax.device_put(x, s)


def _batch_struct(cfg, B, t, s, m, with_alignment):
    """ShapeDtypeStruct pytree matching pad_batch's output for AOT
    compilation of a bucket shape."""
    S, f32, i32 = jax.ShapeDtypeStruct, jnp.float32, jnp.int32
    d = {"text": S((B, t), i32), "text_lengths": S((B,), i32),
         "sub": S((B, s), i32), "sub_lengths": S((B,), i32),
         "mels": S((B, cfg.n_mel_channels, m), f32),
         "output_lengths": S((B,), i32),
         "cls_phone": S((B, cfg.bert_embedding_dim), f32),
         "cls_sub": S((B, cfg.bert_embedding_dim), f32),
         "gate_target": S((B, m), f32), "weight": S((B,), f32)}
    if with_alignment:
        d["align_target"] = S((B, m, t), f32)
    return d


def aot_warmup(step_fn, state, cfg, plan, global_batch, key_example):
    """Precompile the train step for every bucket shape the corpus will hit
    (the compile-budget guard: full-size TPU compiles cost 45-250 s each,
    see data/dataset.py compile_plan).  Returns {bucket_key: executable} —
    AOT ``lower().compile()`` does NOT populate the jit dispatch cache, so
    the train loop must route through these executables."""
    import time as _time
    key_struct = jax.ShapeDtypeStruct(key_example.shape, key_example.dtype)
    out = {}
    t0 = _time.perf_counter()
    for n, key in enumerate(sorted(plan)):
        t, s, m = key
        bs = _batch_struct(cfg, global_batch, t, s, m, bool(cfg.align_loss))
        out[key] = step_fn.lower(state, bs, key_struct).compile()
        print(f"  aot-warmup {key} ({n + 1}/{len(plan)}) "
              f"{_time.perf_counter() - t0:.0f}s", flush=True)
    return out


def select_step_fn(executables, bucket, step_fn, warned: set):
    """Route a batch to its AOT-compiled executable; fall back to the jit
    path with a LOUD one-time warning when the bucket missed the compile
    plan (a silent fallback costs a surprise 45-250 s mid-training compile
    on TPU)."""
    fn = executables.get(bucket)
    if fn is not None:
        return fn
    if executables and bucket not in warned:
        warned.add(bucket)
        print(f"WARNING: batch bucket {bucket} is not in the AOT compile "
              f"plan (have: {sorted(executables)}) — falling back to a "
              f"mid-training jit compile (45-250 s on TPU)", flush=True)
    return step_fn


def validate(state, loader, cfg, mesh, eval_fn, rng) -> float:
    losses, n = 0.0, 0
    last = None
    for batch in loader:
        db = device_batch(batch, mesh)
        metrics, outputs = eval_fn(state, db, rng)
        w = float(np.sum(batch["weight"]))
        losses += float(metrics["total"]) * w
        n += w
        last = (outputs, db)
    return (losses / max(n, 1)), last


def train(args) -> None:
    cfg = create_config(hparams_string=args.hparams)
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)

    os.makedirs(args.output_directory, exist_ok=True)
    mesh = PM.make_mesh(n_model=args.model_parallel)
    if jax.process_count() > 1:
        # establish the cross-process collective context while the hosts
        # are still in lockstep (see PM.collective_barrier)
        PM.collective_barrier(mesh)
    n_data = mesh.shape["data"]
    n_dev = mesh.devices.size
    global_batch = cfg.batch_size * n_data

    if args.synthetic:
        train_ds = SyntheticDataset(cfg, args.synthetic, seed=1)
        val_ds = SyntheticDataset(cfg, max(8, args.synthetic // 8), seed=2)
    else:
        train_rows = load_filepaths(args.train_list)
        val_rows = load_filepaths(args.val_list)
        train_ds = BertTacotron2Dataset(train_rows, args.mel_dir,
                                        args.sub_dir, args.cls_dir,
                                        load_alignment=bool(cfg.align_loss))
        val_ds = BertTacotron2Dataset(val_rows, args.val_mel_dir or
                                      args.mel_dir,
                                      args.val_sub_dir or args.sub_dir,
                                      args.val_cls_dir or args.cls_dir,
                                      load_alignment=bool(cfg.align_loss))

    loader_kw = dict(batch_size=global_batch,
                     shard_index=jax.process_index(),
                     num_shards=jax.process_count(),
                     with_alignment=bool(cfg.align_loss),
                     frames_per_step=cfg.n_frames_per_step,
                     # lockstep across hosts: identical global batches,
                     # per-host row slices (see BucketedLoader)
                     shard_within_batch=True)
    train_loader = BucketedLoader(train_ds, seed=cfg.seed, **loader_kw)

    state, tx = T.create_train_state(jax.random.PRNGKey(cfg.seed), cfg)
    learning_rate = cfg.learning_rate

    # resume / warm start (reference train.py:244-263)
    start_iter = 0
    ckpt_path = args.checkpoint or CK.scan_checkpoint(args.output_directory)
    if ckpt_path and not args.warm_start:
        state, meta = CK.load_checkpoint(ckpt_path, state)
        start_iter = int(state.step)
        if cfg.use_saved_learning_rate and "learning_rate" in meta:
            learning_rate = meta["learning_rate"]
        print(f"resumed from {ckpt_path} at iteration {start_iter}")
    elif ckpt_path and args.warm_start:
        state = CK.warm_start(ckpt_path, state, cfg.ignore_layers)
        print(f"warm-started from {ckpt_path}")

    cpu_state = state
    state = PM.shard_train_state(state, mesh)
    step_fn = PM.make_parallel_train_step(cfg, tx, mesh, state=cpu_state)
    eval_fn = jax.jit(
        lambda s, b, r: T.eval_step(s, b, r, cfg),
        in_shardings=(PM.replicate_sharding(mesh), PM.batch_sharding(mesh),
                      PM.replicate_sharding(mesh)),
    )

    logger = Tacotron2Logger(args.log_directory) if args.log_directory \
        else None
    from tacotron2_subword_tpu.utils.platform import StepProfiler
    profiler = StepProfiler(args.profile_dir)
    best = CK.BestTracker(args.output_directory)
    # host-INVARIANT stream: the step key is a replicated global value, so
    # every process must derive the identical key sequence
    rng = jax.random.PRNGKey(cfg.seed)
    iteration = start_iter

    print(f"training: {n_dev} devices, global batch {global_batch}, "
          f"{len(train_ds)} utterances")

    # compile budget: report the bucket shapes this corpus actually hits
    # (each full-size TPU train-step compile costs 45-250 s; the worst-case
    # grid is len(text)xlen(sub)xlen(mel) edges = up to 150 variants)
    plan = train_loader.compile_plan()
    plan_str = ", ".join(f"(t{t},s{s},m{m})x{c}"
                         for (t, s, m), c in sorted(plan.items()))
    print(f"compile plan: {len(plan)} train-step shape variants: {plan_str}",
          flush=True)
    executables, missed_buckets = {}, set()
    if args.aot_warmup:
        rng, wkey = jax.random.split(rng)
        executables = aot_warmup(step_fn, state, cfg, plan, global_batch,
                                 wkey)

    def stage(batch):
        """Producer-thread work: pad-batch → device transfer.  Returns the
        bucket key alongside the on-device batch (shapes are identical)."""
        bucket = (batch["text"].shape[1], batch["sub"].shape[1],
                  batch["mels"].shape[2])
        return bucket, device_batch(batch, mesh)

    def staged(loader):
        if args.prefetch > 0:
            return PrefetchLoader(loader, depth=args.prefetch, stage=stage)
        return map(stage, iter(loader))

    for epoch in range(cfg.epochs):
        for bucket, db in staged(train_loader):
            t0 = time.perf_counter()
            rng, step_key = jax.random.split(rng)
            step_key = replicate_global(step_key, mesh)
            profiler.step(iteration)
            state, metrics = select_step_fn(
                executables, bucket, step_fn, missed_buckets)(
                state, db, step_key)
            total = float(metrics["total"])  # host sync
            dt = time.perf_counter() - t0
            iteration += 1
            if iteration % args.log_interval == 0:
                print(f"epoch {epoch} iter {iteration}: loss {total:.4f} "
                      f"grad_norm {float(metrics['grad_norm']):.3f} "
                      f"{dt:.2f}s/it", flush=True)
                if logger:
                    logger.log_training(metrics, learning_rate, dt,
                                        iteration)

            if iteration % cfg.iters_per_checkpoint == 0:
                rng, vkey = jax.random.split(rng)
                val_loader = BucketedLoader(val_ds, seed=cfg.seed,
                                            **loader_kw)
                val_loss, last = validate(state, val_loader, cfg, mesh,
                                          eval_fn, vkey)
                print(f"validation loss {val_loss:.4f}", flush=True)
                if jax.process_index() == 0:
                    CK.save_checkpoint(state, args.output_directory,
                                       val_loss=val_loss,
                                       learning_rate=learning_rate)
                    if best.update(state, val_loss, learning_rate):
                        print(f"new best val loss {val_loss:.4f}")
                    if logger and last is not None \
                            and jax.process_count() == 1:
                        # image/audio logging fetches batch-sharded outputs,
                        # which are not host-addressable across processes
                        logger.log_validation(val_loss, state.params,
                                              last[0], last[1], iteration)
            if args.max_iters and iteration >= args.max_iters:
                profiler.close()
                print("reached max iters")
                return


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output_directory", required=True)
    p.add_argument("-l", "--log_directory", default=None)
    p.add_argument("-c", "--checkpoint", default=None,
                   help="explicit checkpoint to resume from (wins over "
                        "auto-scan)")
    p.add_argument("--warm_start", action="store_true")
    p.add_argument("--hparams", default=None,
                   help='reference-style "[k:v-k:v]" overrides')
    p.add_argument("--train-list", default=None)
    p.add_argument("--val-list", default=None)
    p.add_argument("--mel-dir", default=None)
    p.add_argument("--val-mel-dir", default=None)
    p.add_argument("--sub-dir", default=None)
    p.add_argument("--cls-dir", default=None)
    p.add_argument("--val-sub-dir", default=None,
                   help="subword-ID dir for the val list (defaults to "
                        "--sub-dir; the reference shares one dir across "
                        "splits, which silently mismatches val rows)")
    p.add_argument("--val-cls-dir", default=None)
    p.add_argument("--tokenizer_vocab", type=int, default=None,
                   help="subword vocab size (sets sub_n_symbols)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic utterances (smoke/perf)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (one process per host)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="model-axis size (shards embeddings + wide LSTM "
                        "weights; data axis = n_devices / this)")
    p.add_argument("--profile-dir", default=None,
                   help="capture an xprof trace of a few steps here")
    p.add_argument("--aot-warmup", action="store_true",
                   help="precompile every bucket shape in the compile plan "
                        "before step 1 (bounds mid-training compile stalls)")
    p.add_argument("--max-iters", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=1)
    p.add_argument("--prefetch", type=int, default=2,
                   help="background-prefetch depth for the input pipeline "
                        "(npy load + pad + device transfer overlap the "
                        "device step; 0 disables — the reference's "
                        "n_workers DataLoader capability, train.py:234-242)")
    return p


def main():
    args = build_argparser().parse_args()
    if args.multihost:
        # Multi-host pods: one process per host; jax.distributed wires the
        # coordination service (the role of the reference's NCCL
        # init_distributed + launcher, train.py:30-42, distributed.py:181).
        # MUST run before anything touches a JAX backend (including the
        # compilation-cache probe below).  On cloud TPU the no-arg form
        # auto-detects; elsewhere (including the CPU multi-process test)
        # pass the coordinator env vars.
        kw = {}
        addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if addr:
            kw = dict(coordinator_address=addr,
                      num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                      process_id=int(os.environ["JAX_PROCESS_ID"]))
        jax.distributed.initialize(**kw)
    if args.model_parallel <= 1:
        # XLA:CPU cannot reload serialized model-parallel executables: the
        # compiler records tuning pseudo-features (+prefer-no-gather, set
        # by the TP collectives' codegen) that the AOT loader then treats
        # as unsupported host features — every reload fails, and under
        # load the failure intermittently hard-aborts (SIGABRT) instead of
        # falling back to a recompile.  DP-only executables reload fine.
        from tacotron2_subword_tpu.utils.platform import \
            enable_compilation_cache
        enable_compilation_cache()
    if args.tokenizer_vocab:
        extra = f"[sub_n_symbols:{args.tokenizer_vocab}-]"
        args.hparams = args.hparams or extra
    train(args)


if __name__ == "__main__":
    main()
