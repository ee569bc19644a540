"""Text front-end tests: lexicon formats, G2P behavior (against reference
resources where available), Kaldi tagging, Text2Seq ID semantics, and
native-C++ vs pure-Python G2P model consistency."""

import os

import numpy as np
import pytest

from tacotron2_subword_tpu.text import lexicon as L
from tacotron2_subword_tpu.text.fst_g2p import FstG2PModel, _PyG2PModel
from tacotron2_subword_tpu.text.g2p import G2P, G2PFst, default_g2p_config
from tacotron2_subword_tpu.text.text_to_sequence import Text2Seq

REF_RES = "/root/reference/resources"
HAS_REF = os.path.isdir(REF_RES)
VI_LEX = os.path.join(REF_RES, "all-vietnamese-syllables_17k9.XSAMPA."
                               "Mien-BAC_KA.txt")


@pytest.fixture(scope="module")
def small_lexicon(tmp_path_factory):
    p = tmp_path_factory.mktemp("lex") / "small.lex"
    p.write_text(
        "an a_1 n\n"
        "anh a_1 J\n"
        "ba b a_1\n"
        "banh b a_1 J\n"
        "em E_1 m\n"
        "me m E_1\n"
        "nam n a_1 m\n",
        encoding="utf-8")
    return str(p)


def test_load_lexicon_utf8_sig(tmp_path):
    p = tmp_path / "bom.lex"
    p.write_bytes("﻿xin s i n\nchào c a_2 w\n".encode("utf-8"))
    lex = L.load_lexicon(str(p))
    assert lex["xin"] == "s i n"
    assert lex["chào"] == "c a_2 w"


def test_norm_vnmese_accent():
    assert L.norm_vnmese_accent("uỳ") == "ùy"       # short, non-qu: old style
    assert L.norm_vnmese_accent("hoà") == "hòa"      # short: oà→òa
    assert L.norm_vnmese_accent("hoàng") == "hoàng"  # long: unchanged (no òa)
    assert L.norm_vnmese_accent("thòa x") == "thoà x"  # long: òa→oà
    assert L.norm_vnmese_accent("qùy") == "qùy"      # qu-prefix guard


def test_phone_id_map_construction(small_lexicon):
    lex = L.load_lexicon(small_lexicon)
    p2i, i2p = L.build_phone_id_map([lex], other_symbols=["_", "-", "~", "+"])
    # other symbols first, then sorted phones
    assert p2i["_"] == 0 and p2i["-"] == 1 and p2i["~"] == 2 and p2i["+"] == 3
    phones = sorted({p for v in lex.values() for p in v.split()})
    for k, ph in enumerate(phones):
        assert p2i[ph] == 4 + k
    # delimiter doubles the inventory
    p2i_d, _ = L.build_phone_id_map([lex], other_symbols=["_"],
                                    delimiter="z")
    assert "a_1z" in p2i_d and "_z" in p2i_d


@pytest.mark.skipif(not HAS_REF, reason="reference resources not present")
def test_phone_id_file_roundtrip(tmp_path):
    p2i, i2p = L.load_phone_id_file(os.path.join(REF_RES,
                                                 "phone_id_list.txt"))
    assert p2i["_"] == 0 and p2i["~"] == 2 and p2i["+"] == 3
    assert len(p2i) == 147
    out = tmp_path / "dump.txt"
    L.dump_phone_id_file(p2i, str(out))
    p2i2, _ = L.load_phone_id_file(str(out))
    assert p2i2 == p2i


class _LookupOnlyG2P(G2P):
    def infer(self, word):
        return ""


def _small_config(lex_path):
    cfg = default_g2p_config()
    cfg["resources"]["vi_lexicon_file"] = lex_path
    cfg["resources"]["en_lexicon_file"] = lex_path
    cfg["resources"]["foreign_lexicon_file"] = lex_path
    return cfg


def test_g2p_lexicon_lookup_and_punctuation(small_lexicon):
    g = _LookupOnlyG2P(_small_config(small_lexicon))
    assert g.g2p("an em") == "a_1|n E_1|m"
    assert g.g2p("an , em .") == "a_1|n , E_1|m ."


def test_g2p_kaldi_format(small_lexicon):
    cfg = _small_config(small_lexicon)
    cfg["kaldi_format"]["kaldi_format"] = True
    g = _LookupOnlyG2P(cfg)
    # 2-phone syllable → _B/_E; 3-phone → _B/_I/_E; punctuation → pauses
    assert g.g2p("an") == "a_1_B|n_E"
    assert g.g2p("anh ,") == "a_1_B|J_E mpau"
    assert g.g2p("nam .") == "n_B|a_1_I|m_E lpau"


def test_g2pfst_oov_inference(small_lexicon):
    g = G2PFst(small_lexicon, _small_config(small_lexicon))
    # in-lexicon word bypasses the model
    assert g.g2p("an") == "a_1|n"
    # OOV built from seen graphemes decodes to a nonempty pronunciation
    out = g.g2p("nama")
    assert out and "|" in out


def test_cpp_and_python_models_agree(small_lexicon):
    """The native decoder and the pure-Python mirror implement the same
    algorithm and must produce identical pronunciations."""
    if not FstG2PModel.native_available():
        pytest.skip("native lib not built")
    cpp = FstG2PModel.train(small_lexicon)
    py = _PyG2PModel.train(small_lexicon)
    assert cpp.num_graphones == py.num_graphones
    for w in ["an", "anh", "ba", "nam", "banh", "nama", "abeman"]:
        assert cpp.phoneticize(w) == py.phoneticize(w), w


@pytest.mark.skipif(not HAS_REF, reason="reference resources not present")
def test_g2pfst_on_reference_lexicon():
    g = G2PFst(VI_LEX)
    # every in-lexicon word resolves through the lexicon verbatim
    assert g.g2p("ai") == "a_1|j"
    out = g.g2p("xin chào deepmind")
    syllables = out.split(" ")
    assert len(syllables) == 3
    assert syllables[0] == g.vi_lex["xin"].replace(" ", "|")
    assert all(s for s in syllables)


@pytest.mark.skipif(not HAS_REF, reason="reference resources not present")
def test_text2seq_matches_reference_id_map(small_lexicon):
    t2s = Text2Seq(VI_LEX)
    # '+' BOS = 3, '~' EOS = 2, whitespace phone between syllables
    seq = t2s.phone_to_sequence("a_1|j a_1|n", padding=True)
    assert seq[0] == t2s.phone_to_id["+"] == 3
    assert seq[-1] == t2s.phone_to_id["~"] == 2
    ws = t2s.phone_to_id[" "]
    inner = seq[1:-1]
    assert inner.count(ws) == 1  # one separator between two syllables
    # grapheme path end-to-end
    seq2 = t2s.grapheme_to_sequence("xin ai")
    assert seq2[0] == 3 and seq2[-1] == 2 and len(seq2) > 5

    # ignore_white_space drops separators
    t2s_no_ws = Text2Seq(VI_LEX, ignore_white_space=True)
    seq3 = t2s_no_ws.phone_to_sequence("a_1|j a_1|n", padding=False)
    assert ws not in seq3


@pytest.mark.skipif(not HAS_REF, reason="reference resources not present")
def test_text2seq_character_mode():
    t2s = Text2Seq(VI_LEX)
    seq = t2s.text_to_sequence("ba", is_phone=False)
    assert seq == [t2s.symbol_to_id["b"], t2s.symbol_to_id["a"]]


def test_packaged_tokenizer_asset_default():
    """The trained asset shipped with the package (assets/vibert_512.json,
    from tools/train_tokenizer.py over the reference syllable lexicon)
    loads, encodes within its vocab, and is check_bert_emb's default
    variant when no tokenizers are requested (reference
    check_bert_emb.py:24-33 always has its vibert JSONs on hand)."""
    pytest.importorskip("tokenizers")
    from tacotron2_subword_tpu.text.bert import (SubwordTokenizer,
                                                 packaged_tokenizer_path)
    p = packaged_tokenizer_path()
    assert p is not None and os.path.exists(p)
    st = SubwordTokenizer(p)
    assert st.vocab_size == 512
    ids = st.encode("xin chào thế giới hôm nay")
    assert len(ids) > 0 and int(ids.max()) < 512
    # deterministic across loads (training-time vs inference-time IDs)
    assert (SubwordTokenizer(p).encode("xin chào thế giới hôm nay")
            == ids).all()

    from tacotron2_subword_tpu.apps.check_bert_emb import check
    rep = check("xin chào thế giới")
    assert "vibert_512" in rep["variants"]
    assert rep["variants"]["vibert_512"]["vocab"] == 512
