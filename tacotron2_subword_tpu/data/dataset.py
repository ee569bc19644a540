"""Data pipeline: reference-format dataset + length-bucketed batching.

On-disk format compatibility with the reference (reference
data_utils.py:48-86):
 - per-utterance durations npy with phone IDs in column 0 and per-phone
   durations in column 1 (data_utils.py:69, GTA.py:42),
 - mel npy ``ljspeech-mel-%05d.npy`` (1-indexed),
 - subword-token-ID npy per utterance index,
 - BERT [CLS] vector npy per utterance index.

Batching: the reference's collate sorts by text length and splits a batch of
B into sqrt(B) sub-batches of sqrt(B), silently dropping B - sqrt(B)^2
samples (data_utils.py:146-160 — with B=8 HALF the batch is dropped).  The
TPU build replaces this with proper length bucketing: utterances are
assigned to (text_len, mel_len) buckets with padded static shapes per
bucket, which (a) drops nothing, (b) bounds XLA recompilation to the fixed
bucket grid, and (c) keeps padding waste low.  Documented divergence.

Everything here is host-side numpy; device transfer happens in the train
loop (sharded over the mesh's data axis — the analogue of the reference's
DistributedSampler, train.py:232).
"""

from __future__ import annotations

import bisect
import os
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def load_filepaths(path: str, split: str = "|") -> List[List[str]]:
    with open(path, encoding="utf-8") as f:
        return [line.strip().split(split) for line in f if line.strip()]


def create_alignment_target(durations: np.ndarray, n_frames: int,
                            n_phones: Optional[int] = None) -> np.ndarray:
    """Expand per-phone durations into a 0/1 [n_frames, n_phones] alignment
    matrix (reference utils.py:92-117 Alignment_Generator.LR semantics).

    Note: the reference's wiring of this target is broken as committed
    (data_utils.py:126 calls get_alignment(texts) against a (self, filename)
    signature); this is the repaired data path.
    """
    n_phones = n_phones or len(durations)
    out = np.zeros((n_frames, n_phones), np.float32)
    t = 0
    for i, d in enumerate(durations):
        d = int(d)
        out[t:min(t + d, n_frames), i] = 1.0
        t += d
        if t >= n_frames:
            break
    return out


class BertTacotron2Dataset:
    """Loads (phone IDs, subword IDs, CLS vector, mel, durations) per index.

    Layout mirrors the reference: ``mel_dir/ljspeech-mel-%05d.npy`` (index+1),
    ``sub_dir/{i}.npy`` subword IDs, ``cls_dir/{i}.npy`` CLS vector, and a
    training list whose rows reference duration npys (col 0 = phone IDs).
    """

    def __init__(self, file_list: Sequence[Sequence[str]], mel_dir: str,
                 sub_dir: str, cls_dir: str, load_alignment: bool = False):
        self.rows = list(file_list)
        self.mel_dir = mel_dir
        self.sub_dir = sub_dir
        self.cls_dir = cls_dir
        self.load_alignment = load_alignment

    def __len__(self) -> int:
        return len(self.rows)

    def lengths(self, i: int) -> Tuple[int, int, int]:
        """(text_len, sub_len, mel_len) WITHOUT materializing the arrays
        (mmap header reads) — used by BucketedLoader.compile_plan to cost
        the bucket grid before training starts."""
        dur = np.load(self.rows[i][-1], mmap_mode="r")
        sub = np.load(os.path.join(self.sub_dir, f"{i}.npy"), mmap_mode="r")
        mel = np.load(os.path.join(
            self.mel_dir, f"ljspeech-mel-{i + 1:05d}.npy"), mmap_mode="r")
        t_mel = mel.shape[1] if mel.shape[0] == 80 else mel.shape[0]
        return dur.shape[0], sub.shape[0], int(t_mel)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        dur_path = self.rows[i][-1]
        dur = np.load(dur_path)
        text = dur[:, 0].astype(np.int32)
        durations = dur[:, 1].astype(np.int32)
        mel = np.load(os.path.join(
            self.mel_dir, f"ljspeech-mel-{i + 1:05d}.npy")).astype(np.float32)
        if mel.shape[0] != 80 and mel.shape[1] == 80:
            mel = mel.T  # accept [T, 80] storage
        sub = np.load(os.path.join(self.sub_dir, f"{i}.npy")).astype(np.int32)
        cls = np.load(os.path.join(self.cls_dir, f"{i}.npy")).astype(
            np.float32).reshape(-1)
        sample = {"text": text, "sub": sub, "cls": cls, "mel": mel,
                  "durations": durations}
        if self.load_alignment:
            sample["alignment"] = create_alignment_target(
                durations, mel.shape[1], len(text))
        return sample


def _pad_to(x: np.ndarray, length: int, axis: int = 0,
            value: float = 0.0) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, length - x.shape[axis])
    return np.pad(x, pad, constant_values=value)


def pad_batch(samples: List[Dict[str, np.ndarray]],
              text_len: Optional[int] = None,
              sub_len: Optional[int] = None,
              mel_len: Optional[int] = None,
              with_alignment: bool = False) -> Dict[str, np.ndarray]:
    """Pad a list of samples into a dense batch with reference-compatible
    semantics: zero-padded text/sub/mel, gate target 0 then 1 from the last
    valid frame (reference data_utils.py stop_token + pad 1.0)."""
    text_len = text_len or max(len(s["text"]) for s in samples)
    sub_len = sub_len or max(len(s["sub"]) for s in samples)
    mel_len = mel_len or max(s["mel"].shape[1] for s in samples)

    batch = {
        "text": np.stack([_pad_to(s["text"], text_len) for s in samples]),
        "text_lengths": np.asarray([len(s["text"]) for s in samples],
                                   np.int32),
        "sub": np.stack([_pad_to(s["sub"], sub_len) for s in samples]),
        "sub_lengths": np.asarray([len(s["sub"]) for s in samples], np.int32),
        "mels": np.stack([_pad_to(s["mel"], mel_len, axis=1)
                          for s in samples]),
        "output_lengths": np.asarray([s["mel"].shape[1] for s in samples],
                                     np.int32),
        "cls_phone": np.stack([s["cls"] for s in samples]),
        "cls_sub": np.stack([s["cls"] for s in samples]),
    }
    t = np.arange(mel_len)[None, :]
    batch["gate_target"] = (
        t >= (batch["output_lengths"][:, None] - 1)).astype(np.float32)
    if with_alignment:
        batch["align_target"] = np.stack([
            _pad_to(_pad_to(s["alignment"], mel_len, axis=0), text_len,
                    axis=1)
            for s in samples])
    return batch


class BucketedLoader:
    """Length-bucketed batch iterator with static padded shapes per bucket.

    Buckets are a fixed grid over (text_len, mel_len); each batch is padded
    to its bucket's boundary so XLA compiles at most
    len(text_edges) x len(mel_edges) program variants.  Nothing is dropped;
    a final partial batch per bucket is padded by repeating its last sample
    (with a ``weight`` mask to exclude duplicates from the loss if desired).
    """

    def __init__(self, dataset, batch_size: int,
                 text_edges: Sequence[int] = (32, 64, 96, 128, 192),
                 mel_edges: Sequence[int] = (128, 256, 384, 512, 768, 1024),
                 sub_edges: Sequence[int] = (16, 32, 48, 64, 96),
                 seed: int = 0, shard_index: int = 0, num_shards: int = 1,
                 drop_remainder: bool = False,
                 with_alignment: bool = False,
                 frames_per_step: int = 1,
                 shard_within_batch: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.text_edges = sorted(text_edges)
        # mel pad lengths must divide n_frames_per_step (the decoder scans
        # groups of r frames, models/tacotron2.py decoder_teacher_forced)
        r = max(int(frames_per_step), 1)
        self.mel_edges = sorted({-(-e // r) * r for e in mel_edges})
        self.sub_edges = sorted(sub_edges)
        self.rng = np.random.RandomState(seed)
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.drop_remainder = drop_remainder
        self.with_alignment = with_alignment
        # Multi-host lockstep mode: every shard iterates the FULL dataset in
        # the same order and forms identical global batches, then takes its
        # contiguous row slice of each.  Sharding the dataset instead (the
        # reference's DistributedSampler model, train.py:232) would let
        # hosts see different bucket sequences and fall out of lockstep on
        # batch count/shape — a collective deadlock.  Costs each host a full
        # pass over the metadata; documented trade.
        self.shard_within_batch = shard_within_batch
        if shard_within_batch and batch_size % num_shards:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"num_shards={num_shards}")
        self.epoch = 0

    def _edge(self, edges: Sequence[int], v: int) -> int:
        i = bisect.bisect_left(edges, v)
        return edges[min(i, len(edges) - 1)]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(len(self.ds))
        # per-host shard (analogue of DistributedSampler + set_epoch)
        self.rng = np.random.RandomState(self.epoch * 9973 + 17)
        self.rng.shuffle(idx)
        if not self.shard_within_batch:
            idx = idx[self.shard_index::self.num_shards]
        self.epoch += 1

        buckets: Dict[Tuple[int, int, int], list] = {}
        for i in idx:
            s = self.ds[int(i)]
            key = (self._edge(self.text_edges, len(s["text"])),
                   self._edge(self.sub_edges, len(s["sub"])),
                   self._edge(self.mel_edges, s["mel"].shape[1]))
            buckets.setdefault(key, []).append(s)
            if len(buckets[key]) == self.batch_size:
                yield self._slice(self._emit(key, buckets.pop(key)))
        for key, rest in sorted(buckets.items()):
            if self.drop_remainder:
                continue
            weight = np.zeros(self.batch_size, np.float32)
            weight[:len(rest)] = 1.0
            while len(rest) < self.batch_size:
                rest.append(rest[-1])
            b = self._emit(key, rest)
            b["weight"] = weight
            yield self._slice(b)

    def compile_plan(self) -> Dict[Tuple[int, int, int], int]:
        """Bucket shapes this corpus will actually hit → utterance count.

        XLA compiles one program variant per (text, sub, mel) bucket key;
        on TPU each full-size train-step compile costs 45-250 s, so the
        worst-case grid (len(text_edges) x len(sub_edges) x len(mel_edges),
        up to 150 variants at the defaults) can dwarf short runs.  This scan
        is cheap (mmap header reads via dataset.lengths when available) and
        lets the train CLI print the real compile budget up front and AOT
        warm up exactly these shapes."""
        counts: Dict[Tuple[int, int, int], int] = {}
        for i in range(len(self.ds)):
            if hasattr(self.ds, "lengths"):
                t, s, m = self.ds.lengths(i)
            else:
                smp = self.ds[i]
                t, s, m = len(smp["text"]), len(smp["sub"]), smp["mel"].shape[1]
            key = (self._edge(self.text_edges, t),
                   self._edge(self.sub_edges, s),
                   self._edge(self.mel_edges, m))
            counts[key] = counts.get(key, 0) + 1
        return counts

    def _emit(self, key, samples) -> Dict[str, np.ndarray]:
        t, s, m = key
        b = pad_batch(samples, text_len=t, sub_len=s, mel_len=m,
                      with_alignment=self.with_alignment)
        b["weight"] = np.ones(len(samples), np.float32)
        return b

    def _slice(self, b: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """In shard_within_batch mode, this host's contiguous row slice of
        the global batch (reassembled on device by
        jax.make_array_from_process_local_data)."""
        if not self.shard_within_batch or self.num_shards == 1:
            return b
        k = self.batch_size // self.num_shards
        lo = self.shard_index * k
        return {key: v[lo:lo + k] for key, v in b.items()}


class PrefetchLoader:
    """Background-thread prefetch over any batch iterable, with an optional
    staging function that runs IN the producer thread (e.g. the
    host→device transfer).

    This is the TPU-idiomatic counterpart of the reference's multiprocess
    DataLoader worker pool (reference train.py:234-242, hparams.py
    n_workers): instead of N worker processes feeding pinned-memory
    tensors to CUDA, one producer thread overlaps npy load + pad + the
    ``jax.device_put`` enqueue with the device step that is still running
    (JAX dispatch is async, so the train loop's only host work is popping
    the queue).  ``depth`` bounds host memory to ``depth`` staged batches.

    Exceptions in the producer are re-raised in the consumer; the thread
    is a daemon and also exits when the iterator is dropped (``close``).
    """

    _DONE = object()

    def __init__(self, loader, depth: int = 2,
                 stage: Optional[Callable] = None):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.loader = loader
        self.depth = depth
        self.stage = stage

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def produce():
            try:
                for batch in self.loader:
                    if self.stage is not None:
                        batch = self.stage(batch)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
                q.put(PrefetchLoader._DONE)
            except BaseException as e:  # re-raised consumer-side
                q.put(e)

        t = threading.Thread(target=produce, daemon=True,
                             name="prefetch-loader")
        t.start()
        try:
            while True:
                item = q.get()
                if item is PrefetchLoader._DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a producer blocked in q.put() sees the stop flag,
            # then JOIN: a daemon thread killed at interpreter exit while
            # inside a C++ staging call (device_put) aborts the process
            # ("FATAL: exception not rethrown")
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=10.0)
