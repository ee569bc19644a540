"""Smoke tests for the repo-root ``tools/`` scripts' pure plumbing.

These scripts normally need TPU hardware; here we exercise the host-side
parsing/categorizing paths against synthetic inputs so a refactor can't
silently break the evidence pipeline (the round-3 advisor found exactly
that: a return-shape change crashed ``train_step_profile.main``).
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_synthetic_xplane(trace_dir):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    plane = space.planes.add()
    plane.name = "/device:TPU:0"
    for i, name in enumerate(
            ["fusion.1", "dot.7", "copy.2", "dynamic-update-slice.3"], 1):
        md = plane.event_metadata[i]
        md.id, md.name = i, name
    ops = plane.lines.add()
    ops.name = "XLA Ops"
    for i, dur_ms in enumerate([2.0, 5.0, 1.0, 0.5], 1):
        ev = ops.events.add()
        ev.metadata_id, ev.duration_ps = i, int(dur_ms * 1e9)
    # a second event for op 1 to exercise aggregation
    ev = ops.events.add()
    ev.metadata_id, ev.duration_ps = 1, int(3.0 * 1e9)
    mods = plane.lines.add()
    mods.name = "XLA Modules"
    mev = mods.events.add()
    mev.metadata_id, mev.duration_ps = 1, int(12.0 * 1e9)
    # a host plane that must be ignored
    host = space.planes.add()
    host.name = "Host Threads"
    path = os.path.join(trace_dir, "test.xplane.pb")
    with open(path, "wb") as f:
        f.write(space.SerializeToString())
    return path


def test_parse_xplane_ops_and_categorize(tmp_path):
    tsp = _load("train_step_profile")
    _write_synthetic_xplane(str(tmp_path))
    ops, module_ms = tsp.parse_xplane_ops(str(tmp_path))

    assert isinstance(ops, list) and ops, "expected op rows"
    # sorted by descending total ms; fusion.1 aggregated to 2+3=5 ms x2
    assert ops[0][0] in ("dot.7", "fusion.1")
    agg = {name: (ms, n) for name, ms, n in ops}
    assert abs(agg["fusion.1"][0] - 5.0) < 1e-6 and agg["fusion.1"][1] == 2
    assert abs(agg["dot.7"][0] - 5.0) < 1e-6
    assert abs(module_ms - 12.0) < 1e-6

    # the main() consumption pattern: iterate 3-tuples + categorize
    total = sum(ms for _, ms, _ in ops)
    assert abs(total - 11.5) < 1e-6
    cats = tsp.categorize(ops)
    assert abs(cats["matmul/conv (MXU)"] - 5.0) < 1e-6
    assert abs(cats["fusions (VPU elementwise/reduce)"] - 5.0) < 1e-6
    assert abs(cats["copies/transposes"] - 1.0) < 1e-6
    assert abs(cats["dynamic slice/update (scan state)"] - 0.5) < 1e-6


def test_make_synthetic_dataset_phase_true():
    """Round-5 corpus generator: ground truth is audio-first — the wav is
    synthesized directly (harmonic bank + shaped noise) and the stored mel
    must equal ops.stft.mel_spectrogram(wav) (the reference's TacotronSTFT
    pipeline, layers.py:63-80), NOT a template the audio was fitted to."""
    import numpy as np
    import jax.numpy as jnp
    from tacotron2_subword_tpu.ops import stft as S

    M = _load("make_synthetic_dataset")
    rng = np.random.RandomState(11)
    phones, durations, sub, cls, mel, wav = M.make_utterance(rng)

    total = int(durations[:, 1].sum())
    assert wav.shape == (total * M.HOP,)
    assert mel.shape == (M.MEL_CHANNELS, total)
    assert np.abs(wav).max() <= 0.98
    # the mel IS the mel of the audio (phase-true by construction)
    ref = np.asarray(S.mel_spectrogram(jnp.asarray(wav[None])))[0][:, :total]
    np.testing.assert_allclose(mel, ref, atol=2e-3)

    # deterministic text->audio mapping: same phones+shift => identical
    # harmonic core (voiced-only phones, noise seed varied)
    vp = np.array([p for p in range(3, 67) if p % 4 != 3][:8], np.int32)
    w1, _ = M.synth_wav(vp, 0.0, noise_seed=1)
    w2, _ = M.synth_wav(vp, 0.0, noise_seed=2)
    assert np.corrcoef(w1, w2)[0, 1] > 0.99
    # CLS pitch shift actually moves the fundamental (conditioning path
    # carries real information): a proper F0 tracker must report the
    # +6-semitone arm ~1.414x higher
    from tacotron2_subword_tpu.eval.metrics import estimate_f0
    w_up, _ = M.synth_wav(vp, 6.0, noise_seed=1)
    f0_a = estimate_f0(w1, M.SR)
    f0_b = estimate_f0(w_up, M.SR)
    med_a = np.median(f0_a[f0_a > 0])
    med_b = np.median(f0_b[f0_b > 0])
    assert 1.25 < med_b / med_a < 1.6, (med_a, med_b)


def test_train_tokenizer_trains_loadable_vibert_asset(tmp_path):
    """tools/train_tokenizer produces a vibert-style WordPiece JSON
    (counterpart of the reference's pre-trained data/vibert_*.json,
    reference data_utils.py:15-26) that loads through
    text.bert.SubwordTokenizer with [CLS]/[SEP] stripped, and whose
    normalization matches the corpus text path (NFKC + lowercase)."""
    import numpy as np
    import pytest
    pytest.importorskip("tokenizers")
    T = _load("train_tokenizer")

    sents = ["xin chào thế giới", "hôm nay trời đẹp quá",
             "tôi yêu tiếng việt", "chào em hôm nay"] * 16
    tok = T.train_wordpiece(sents, vocab_size=200)
    path = str(tmp_path / "vibert_test.json")
    tok.save(path)

    from tacotron2_subword_tpu.text.bert import SubwordTokenizer
    st = SubwordTokenizer(path)
    assert st.vocab_size <= 200
    ids = st.encode("xin chào hôm nay")
    cls_id, sep_id = tok.token_to_id("[CLS]"), tok.token_to_id("[SEP]")
    assert len(ids) > 0 and int(ids.max()) < st.vocab_size
    assert cls_id not in ids and sep_id not in ids
    # the raw tokenizer DOES emit the specials (reference-style
    # post-processor) — stripping is SubwordTokenizer's job
    raw = tok.encode("xin chào hôm nay").ids
    assert raw[0] == cls_id and raw[-1] == sep_id
    # NFKC+lowercase normalizer: cased/composed input encodes identically
    np.testing.assert_array_equal(st.encode("XIN CHÀO Hôm Nay"), ids)

    # "id|sentence" corpus files parse
    tf = tmp_path / "train_text.txt"
    tf.write_text("0|xin chào\n1|hôm nay\n", encoding="utf-8")
    assert T.read_text_file(str(tf)) == ["xin chào", "hôm nay"]


def test_make_text_utterance_uses_trained_tokenizer(tmp_path):
    """--tokenizer-json in make_synthetic_dataset: the corpus subword
    stream must come from the trained asset (mod sub_vocab, exactly the
    apps/inference.py convention) instead of the crc32 fallback."""
    import unicodedata
    import numpy as np
    import pytest
    pytest.importorskip("tokenizers")
    M = _load("make_synthetic_dataset")
    T = _load("train_tokenizer")

    lex = tmp_path / "small.lex"
    lex.write_text("an a_1 n\nba b a_1\nem E_1 m\nme m E_1\nnam n a_1 m\n",
                   encoding="utf-8")
    from tacotron2_subword_tpu.text import Text2Seq
    from tacotron2_subword_tpu.text.bert import SubwordTokenizer
    t2s = Text2Seq(str(lex))
    sylls = ["an", "ba", "em", "me", "nam"]

    tok = T.train_wordpiece(
        [" ".join(sylls)] * 8 + ["ba em", "nam an me"], vocab_size=64)
    path = str(tmp_path / "vibert_64.json")
    tok.save(path)
    st = SubwordTokenizer(path)

    rng = np.random.RandomState(3)
    text, phones, durations, sub, cls, mel, wav = M.make_text_utterance(
        rng, sylls, t2s, sub_vocab=512, tokenizer=st)
    norm = unicodedata.normalize("NFKC", text).lower()
    np.testing.assert_array_equal(sub, st.encode(norm) % 512)
    # and differs from the crc32 fallback stream (i.e. the asset is live)
    from tacotron2_subword_tpu.text.bert import hashed_subword_ids
    fb = hashed_subword_ids(norm, 512)
    assert len(sub) != len(fb) or (np.asarray(sub) != fb).any()
