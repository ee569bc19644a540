#!/usr/bin/env python
"""Train a reference-style subword tokenizer asset (``vibert_{vocab}.json``).

The reference ships five pre-trained ``tokenizers.Tokenizer`` JSON assets
(data/vibert_5500.json .. vibert_7500.json, consumed by reference
data_utils.py:15-26 and compared by check_bert_emb.py:24-60) but not the
script that produced them.  This tool closes that gap for this repo: it
trains a BERT-style WordPiece tokenizer whose JSON loads through the same
``text.bert.SubwordTokenizer`` wrapper used at preprocess and inference
time, so the trained asset — not the crc32 fallback — can carry the
subword stream end-to-end (corpus → training → inference).

Normalization matches the synthetic-corpus text path exactly
(tools/make_synthetic_dataset.py make_text_utterance: NFKC + lowercase),
and the [CLS]/[SEP] post-processor mirrors the reference tokenizers so the
SubwordTokenizer special-stripping path is exercised.

Sentence sources (combinable):
  --texts f1 [f2 ...]   plain sentences, or "id|sentence" lines as written
                        by make_synthetic_dataset --from-text
  --from-lexicon N      compose N random sentences from the Vietnamese
                        syllable lexicon (the same distribution
                        make_synthetic_dataset --from-text draws from)

    python tools/train_tokenizer.py --out-dir assets --vocab-size 512 \
        --from-lexicon 4096 [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import unicodedata
from typing import Iterable, List

if __package__ in (None, ""):  # direct script execution
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))

DEFAULT_LEXICON = ("/root/reference/resources/"
                   "all-vietnamese-syllables_17k9.XSAMPA.Mien-BAC_KA.txt")


def train_wordpiece(sentences: Iterable[str], vocab_size: int):
    """BERT-style WordPiece tokenizer over ``sentences``.

    Layout mirrors the reference's vibert assets: [PAD]/[UNK]/[CLS]/[SEP]/
    [MASK] specials at IDs 0-4, NFKC+lowercase normalizer (identical to the
    corpus text normalization), whitespace pre-tokenization, and a
    [CLS] $A [SEP] post-processor so ``SubwordTokenizer.encode`` gets — and
    strips — the specials exactly as with the reference JSONs."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, \
        processors, trainers

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.Sequence(
        [normalizers.NFKC(), normalizers.Lowercase()])
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.WordPieceTrainer(
        vocab_size=vocab_size,
        special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"])
    tok.train_from_iterator(sentences, trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", tok.token_to_id("[CLS]")),
                        ("[SEP]", tok.token_to_id("[SEP]"))])
    return tok


def read_text_file(path: str) -> List[str]:
    """Plain sentences, or make_synthetic_dataset's "id|sentence" rows."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append(line.split("|", 1)[1] if "|" in line else line)
    return out


def lexicon_sentences(lexicon_path: str, n: int, seed: int = 0) -> List[str]:
    """Seeded random sentences from the syllable inventory — the same
    4-10-word composition make_synthetic_dataset --from-text uses."""
    import numpy as np
    try:
        from tools.make_synthetic_dataset import load_syllables
    except ImportError:  # direct script run: tools/ itself is sys.path[0]
        from make_synthetic_dataset import load_syllables

    sylls = load_syllables(lexicon_path)
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        k = rng.randint(4, 11)
        text = " ".join(sylls[rng.randint(len(sylls))] for _ in range(k))
        out.append(unicodedata.normalize("NFKC", text).lower())
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None,
                    help="output JSON path (default "
                         "{out-dir}/vibert_{vocab}.json)")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--vocab-size", type=int, default=512,
                    help="must be <= the model's sub_n_symbols "
                         "(embedding-table size)")
    ap.add_argument("--texts", nargs="*", default=[],
                    help="sentence files (plain or id|sentence)")
    ap.add_argument("--from-lexicon", type=int, default=0, metavar="N",
                    help="also compose N random lexicon sentences")
    ap.add_argument("--lexicon", default=DEFAULT_LEXICON)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    sentences: List[str] = []
    for p in args.texts:
        sentences += read_text_file(p)
    if args.from_lexicon:
        if not os.path.exists(args.lexicon):
            ap.error(f"lexicon not found: {args.lexicon}")
        sentences += lexicon_sentences(args.lexicon, args.from_lexicon,
                                       args.seed)
    if not sentences:
        ap.error("no training text: pass --texts and/or --from-lexicon N")

    tok = train_wordpiece(sentences, args.vocab_size)
    out = args.out or os.path.join(args.out_dir,
                                   f"vibert_{tok.get_vocab_size()}.json")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    tok.save(out)
    print(f"trained on {len(sentences)} sentences -> {out} "
          f"(vocab {tok.get_vocab_size()})")


if __name__ == "__main__":
    main()
