"""Data pipeline tests: reference npy format compatibility, bucketing."""

import os

import numpy as np
import pytest

from tacotron2_subword_tpu.data import (
    BertTacotron2Dataset, BucketedLoader, create_alignment_target, pad_batch)


@pytest.fixture
def synth_dataset(tmp_path):
    """Write a small reference-format dataset to disk."""
    rng = np.random.RandomState(0)
    mel_dir = tmp_path / "mels"
    sub_dir = tmp_path / "subs"
    cls_dir = tmp_path / "cls"
    dur_dir = tmp_path / "durs"
    for d in (mel_dir, sub_dir, cls_dir, dur_dir):
        d.mkdir()
    rows = []
    n = 10
    for i in range(n):
        T_text = rng.randint(5, 20)
        durs = rng.randint(1, 6, T_text)
        T_mel = int(durs.sum())
        dur = np.stack([rng.randint(0, 313, T_text), durs], axis=1)
        dur_path = dur_dir / f"{i}.npy"
        np.save(dur_path, dur)
        np.save(mel_dir / f"ljspeech-mel-{i+1:05d}.npy",
                rng.randn(80, T_mel).astype(np.float32))
        np.save(sub_dir / f"{i}.npy", rng.randint(0, 500, rng.randint(3, 10)))
        np.save(cls_dir / f"{i}.npy", rng.randn(768).astype(np.float32))
        rows.append([f"wav/{i}.wav", str(dur_path)])
    return BertTacotron2Dataset(rows, str(mel_dir), str(sub_dir),
                                str(cls_dir))


def test_dataset_loads_reference_format(synth_dataset):
    s = synth_dataset[0]
    assert s["text"].dtype == np.int32
    assert s["mel"].shape[0] == 80
    assert s["cls"].shape == (768,)
    assert len(s["durations"]) == len(s["text"])
    assert s["durations"].sum() == s["mel"].shape[1]


def test_alignment_target_expansion():
    durs = np.asarray([2, 3, 1])
    a = create_alignment_target(durs, 6)
    expect = np.zeros((6, 3), np.float32)
    expect[0:2, 0] = 1
    expect[2:5, 1] = 1
    expect[5:6, 2] = 1
    np.testing.assert_array_equal(a, expect)
    # truncation when mel shorter than sum(durations)
    a2 = create_alignment_target(durs, 4)
    assert a2.shape == (4, 3)
    assert a2[3, 1] == 1 and a2.sum() == 4


def test_pad_batch_gate_semantics(synth_dataset):
    samples = [synth_dataset[i] for i in range(3)]
    b = pad_batch(samples)
    T = b["mels"].shape[-1]
    for k in range(3):
        ln = b["output_lengths"][k]
        np.testing.assert_array_equal(b["gate_target"][k, :ln - 1], 0)
        np.testing.assert_array_equal(b["gate_target"][k, ln - 1:], 1)
        # padded mel region is zero
        if ln < T:
            assert np.abs(b["mels"][k, :, ln:]).max() == 0


def test_bucketed_loader_drops_nothing(synth_dataset):
    loader = BucketedLoader(synth_dataset, batch_size=4,
                            text_edges=(8, 16, 32), mel_edges=(32, 64, 128),
                            sub_edges=(8, 16))
    seen = 0
    shapes = set()
    for batch in loader:
        assert batch["text"].shape[0] == 4
        seen += int(batch["weight"].sum())
        shapes.add((batch["text"].shape[1], batch["sub"].shape[1],
                    batch["mels"].shape[2]))
    assert seen == len(synth_dataset)  # nothing dropped (vs reference sqrtB)
    # static shapes come from the fixed bucket grid
    for t, s, m in shapes:
        assert t in (8, 16, 32) and s in (8, 16) and m in (32, 64, 128)


def test_bucketed_loader_sharding(synth_dataset):
    a = BucketedLoader(synth_dataset, batch_size=2, shard_index=0,
                       num_shards=2, text_edges=(32,), mel_edges=(128,),
                       sub_edges=(16,))
    b = BucketedLoader(synth_dataset, batch_size=2, shard_index=1,
                       num_shards=2, text_edges=(32,), mel_edges=(128,),
                       sub_edges=(16,))
    na = sum(int(x["weight"].sum()) for x in a)
    nb = sum(int(x["weight"].sum()) for x in b)
    assert na + nb == len(synth_dataset)


def test_bucketed_loader_reshuffles_by_epoch(synth_dataset):
    loader = BucketedLoader(synth_dataset, batch_size=10,
                            text_edges=(32,), mel_edges=(128,),
                            sub_edges=(16,))
    b1 = next(iter(loader))
    b2 = next(iter(loader))
    assert not np.array_equal(b1["text_lengths"], b2["text_lengths"])


def test_compile_plan_counts_bucket_shapes(tmp_path):
    """The plan must enumerate exactly the bucket keys the loader will emit,
    with utterance counts summing to the corpus size (the compile-budget
    guard: each key is one XLA train-step compile)."""
    import os
    from tacotron2_subword_tpu.data.dataset import (BertTacotron2Dataset,
                                                    BucketedLoader)
    rng = np.random.RandomState(0)
    mel_dir = tmp_path / "mels"
    sub_dir = tmp_path / "sub"
    cls_dir = tmp_path / "cls"
    dur_dir = tmp_path / "dur"
    for d in (mel_dir, sub_dir, cls_dir, dur_dir):
        os.makedirs(d)
    rows = []
    spec = [(10, 4, 50), (20, 6, 100), (40, 10, 200), (41, 11, 201)]
    for i, (t, s, m) in enumerate(spec):
        np.save(dur_dir / f"{i}.npy",
                np.stack([rng.randint(0, 9, t), np.ones(t, int)], 1))
        np.save(mel_dir / f"ljspeech-mel-{i+1:05d}.npy",
                rng.randn(80, m).astype(np.float32))
        np.save(sub_dir / f"{i}.npy", rng.randint(0, 9, s).astype(np.int32))
        np.save(cls_dir / f"{i}.npy", rng.randn(8).astype(np.float32))
        rows.append(["x.wav", str(dur_dir / f"{i}.npy")])
    ds = BertTacotron2Dataset(rows, str(mel_dir), str(sub_dir), str(cls_dir))
    loader = BucketedLoader(ds, batch_size=2, text_edges=(16, 32, 64),
                            sub_edges=(8, 16), mel_edges=(64, 128, 256))
    plan = loader.compile_plan()
    assert plan == {(16, 8, 64): 1, (32, 8, 128): 1, (64, 16, 256): 2}
    assert sum(plan.values()) == len(ds)
    # the loader emits exactly the planned keys
    emitted = {(b["text"].shape[1], b["sub"].shape[1], b["mels"].shape[2])
               for b in loader}
    assert emitted == set(plan)


def test_prefetch_loader_order_and_stage_thread():
    """PrefetchLoader must preserve batch order, run the stage function in
    the producer thread (not the consumer's), and drain fully."""
    import threading
    from tacotron2_subword_tpu.data.dataset import PrefetchLoader

    main_thread = threading.get_ident()
    stage_threads = []

    def stage(x):
        stage_threads.append(threading.get_ident())
        return x * 10

    src = list(range(20))
    out = list(PrefetchLoader(src, depth=3, stage=stage))
    assert out == [x * 10 for x in src]
    assert all(t != main_thread for t in stage_threads)


def test_prefetch_loader_propagates_producer_error():
    from tacotron2_subword_tpu.data.dataset import PrefetchLoader

    def gen():
        yield 1
        yield 2
        raise RuntimeError("bad npy")

    it = iter(PrefetchLoader(gen(), depth=2))
    assert next(it) == 1
    assert next(it) == 2
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="bad npy"):
        next(it)


def test_prefetch_loader_early_close_stops_producer():
    """Dropping the consumer mid-stream must let the producer thread exit
    (no leaked thread spinning on a full queue)."""
    import threading
    import time
    from tacotron2_subword_tpu.data.dataset import PrefetchLoader

    it = iter(PrefetchLoader(iter(range(1000)), depth=1))
    assert next(it) == 0
    it.close()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name == "prefetch-loader" and t.is_alive()
                   for t in threading.enumerate()):
            return
        time.sleep(0.05)
    raise AssertionError("producer thread did not exit after close()")


def test_prefetch_loader_reusable_over_epochs(synth_dataset):
    """Wrapping a BucketedLoader: iterating the SAME PrefetchLoader twice
    must re-run the underlying loader (fresh epoch shuffle), matching the
    train loop's for-epoch reuse."""
    from tacotron2_subword_tpu.data.dataset import (BucketedLoader,
                                                    PrefetchLoader)
    ds = synth_dataset
    inner = BucketedLoader(ds, batch_size=2)
    pf = PrefetchLoader(inner, depth=2)
    n1 = sum(int(b["weight"].sum()) for b in pf)
    n2 = sum(int(b["weight"].sum()) for b in pf)
    assert n1 == n2 == len(ds)
