"""Python interface to the native C++ joint-sequence G2P engine.

Wraps native/libg2p_fst.so (built with ``make -C native``) via ctypes — the
framework's equivalent of the reference's ``import phonetisaurus`` C++
binding (reference build/lib/g2p/g2p.py:5,138).  When the shared library is
not built, a pure-Python mirror of the same algorithm (Viterbi-EM graphone
alignment + trigram LM + beam decode) provides identical behavior at lower
speed, so the text front-end never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import math
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libg2p_fst.so")


def _load_lib():
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.g2p_train.restype = ctypes.c_void_p
    lib.g2p_train.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int]
    lib.g2p_save.restype = ctypes.c_int
    lib.g2p_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.g2p_load.restype = ctypes.c_void_p
    lib.g2p_load.argtypes = [ctypes.c_char_p]
    lib.g2p_phoneticize.restype = ctypes.c_int
    lib.g2p_phoneticize.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_char_p,
                                    ctypes.c_int]
    lib.g2p_num_graphones.restype = ctypes.c_int
    lib.g2p_num_graphones.argtypes = [ctypes.c_void_p]
    lib.g2p_free.argtypes = [ctypes.c_void_p]
    return lib


class FstG2PModel:
    """Native-backed G2P model (train / save / load / phoneticize)."""

    def __init__(self, handle, lib):
        self._h = handle
        self._lib = lib
        self._buf = ctypes.create_string_buffer(8192)

    @classmethod
    def native_available(cls) -> bool:
        return os.path.exists(_SO_PATH)

    @classmethod
    def train(cls, lexicon_path: str, max_g: int = 2, max_p: int = 2,
              em_iters: int = 4) -> "FstG2PModel":
        lib = _load_lib()
        if lib is None:
            return _PyG2PModel.train(lexicon_path, max_g, max_p, em_iters)
        h = lib.g2p_train(lexicon_path.encode(), max_g, max_p, em_iters)
        if not h:
            raise RuntimeError(f"g2p_train failed on {lexicon_path}")
        return cls(h, lib)

    @classmethod
    def load(cls, model_path: str) -> "FstG2PModel":
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native libg2p_fst.so not built (run `make -C native`) and "
                "no pure-Python load for this model format")
        h = lib.g2p_load(model_path.encode())
        if not h:
            raise RuntimeError(f"g2p_load failed on {model_path}")
        return cls(h, lib)

    def save(self, path: str) -> None:
        if self._lib.g2p_save(self._h, path.encode()) != 0:
            raise RuntimeError(f"g2p_save failed: {path}")

    @property
    def num_graphones(self) -> int:
        return self._lib.g2p_num_graphones(self._h)

    def phoneticize(self, word: str, beam: int = 500) -> str:
        """word → 'p|h|o|n' (the reference's infer() output format,
        build/lib/g2p/g2p.py:140-158)."""
        n = self._lib.g2p_phoneticize(self._h, word.encode(), beam,
                                      self._buf, len(self._buf))
        if n < 0:
            return ""
        return self._buf.value.decode()

    def __del__(self):
        try:
            if self._h and self._lib:
                self._lib.g2p_free(self._h)
                self._h = None
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Pure-Python mirror (same algorithm; used when the .so isn't built)
# ---------------------------------------------------------------------------

class _PyG2PModel:
    NEG_INF = -1e30

    def __init__(self):
        self.graphones: List[Tuple[str, str]] = []
        self.graphone_id: Dict[Tuple[str, str], int] = {}
        self.by_grapheme: Dict[str, List[int]] = defaultdict(list)
        self.trigram: Dict[Tuple[int, int], Dict[int, float]] = {}
        self.bigram: Dict[int, Dict[int, float]] = {}
        self.unigram: Dict[int, float] = {}
        self.unigram_floor = -20.0
        self.max_g, self.max_p = 2, 2

    # -- training --
    @classmethod
    def train(cls, lexicon_path: str, max_g=2, max_p=2, em_iters=4):
        import codecs
        entries = []
        with codecs.open(lexicon_path, "r", encoding="utf-8-sig") as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 2 and len(parts[0]) <= 40:
                    entries.append((list(parts[0]), parts[1:]))
        m = cls()
        m.max_g, m.max_p = max_g, max_p
        logp: Dict[Tuple[str, str], float] = {}
        unk = -12.0

        def align(graphemes, phones):
            G, P = len(graphemes), len(phones)
            D = [[cls.NEG_INF] * (P + 1) for _ in range(G + 1)]
            bp = [[(0, 0)] * (P + 1) for _ in range(G + 1)]
            D[0][0] = 0.0
            for i in range(G + 1):
                for j in range(P + 1):
                    if D[i][j] <= cls.NEG_INF / 2:
                        continue
                    for dg in range(1, max_g + 1):
                        if i + dg > G:
                            break
                        for dp in range(0, max_p + 1):
                            if j + dp > P:
                                break
                            g = "".join(graphemes[i:i + dg])
                            p = "|".join(phones[j:j + dp])
                            s = (D[i][j] + logp.get((g, p), unk)
                                 - (2.0 if dp == 0 else 0.0))
                            if s > D[i + dg][j + dp]:
                                D[i + dg][j + dp] = s
                                bp[i + dg][j + dp] = (dg, dp)
            if D[G][P] <= cls.NEG_INF / 2:
                return None
            out = []
            i, j = G, P
            while i > 0 or j > 0:
                dg, dp = bp[i][j]
                if dg == 0 and dp == 0:
                    return None
                out.append(("".join(graphemes[i - dg:i]),
                            "|".join(phones[j - dp:j])))
                i, j = i - dg, j - dp
            return out[::-1]

        for _ in range(max(1, em_iters)):
            counts: Dict[Tuple[str, str], float] = defaultdict(float)
            total = 0.0
            for graphemes, phones in entries:
                al = align(graphemes, phones)
                if not al:
                    continue
                for gp in al:
                    counts[gp] += 1.0
                    total += 1.0
            logp = {k: math.log(v / total) for k, v in counts.items()}
            unk = math.log(0.5 / total)

        BOS, EOS = -1, -2
        tri_c: Dict[Tuple[int, int], Dict[int, float]] = defaultdict(
            lambda: defaultdict(float))
        big_c: Dict[int, Dict[int, float]] = defaultdict(
            lambda: defaultdict(float))
        uni_c: Dict[int, float] = defaultdict(float)
        uni_total = 0.0
        for graphemes, phones in entries:
            al = align(graphemes, phones)
            if not al:
                continue
            ids = []
            for gp in al:
                if gp not in m.graphone_id:
                    m.graphone_id[gp] = len(m.graphones)
                    m.by_grapheme[gp[0]].append(len(m.graphones))
                    m.graphones.append(gp)
                ids.append(m.graphone_id[gp])
            h1, h2 = BOS, BOS
            for k in range(len(ids) + 1):
                w = ids[k] if k < len(ids) else EOS
                tri_c[(h1, h2)][w] += 1.0
                big_c[h2][w] += 1.0
                uni_c[w] += 1.0
                uni_total += 1.0
                h1, h2 = h2, w
        for ctx, cc in tri_c.items():
            tot = sum(cc.values())
            T = len(cc)
            m.trigram[ctx] = {w: math.log(c / (tot + T))
                              for w, c in cc.items()}
        for h, cc in big_c.items():
            tot = sum(cc.values())
            T = len(cc)
            m.bigram[h] = {w: math.log(c / (tot + T)) for w, c in cc.items()}
        m.unigram = {w: math.log(c / uni_total) for w, c in uni_c.items()}
        m.unigram_floor = math.log(0.5 / uni_total)
        return m

    def _lm(self, h1, h2, w):
        t = self.trigram.get((h1, h2))
        if t is not None and w in t:
            return t[w]
        b = self.bigram.get(h2)
        if b is not None and w in b:
            return b[w] - 1.0
        return self.unigram.get(w, self.unigram_floor) - 2.0

    @property
    def num_graphones(self):
        return len(self.graphones)

    def save(self, path):
        raise NotImplementedError(
            "pure-Python fallback has no serializer; build native/")

    def phoneticize(self, word: str, beam: int = 500) -> str:
        chars = list(word)
        G = len(chars)
        beams: List[List[Tuple[float, int, int, int, int]]] = [
            [] for _ in range(G + 1)]
        beams[0].append((0.0, -1, -1, -1, -1))
        for i in range(G):
            for hi, (score, h1, h2, _, _) in enumerate(beams[i]):
                for dg in range(1, self.max_g + 1):
                    if i + dg > G:
                        break
                    g = "".join(chars[i:i + dg])
                    for gid in self.by_grapheme.get(g, ()):
                        s = score + self._lm(h1, h2, gid)
                        beams[i + dg].append((s, h2, gid, hi, gid))
            for j in range(i + 1, min(G, i + self.max_g) + 1):
                if len(beams[j]) > beam:
                    beams[j].sort(key=lambda h: -h[0])
                    del beams[j][beam:]
        if not beams[G]:
            out = []
            for c in chars:
                cands = self.by_grapheme.get(c)
                if not cands:
                    continue
                best = max(cands, key=lambda gid: self.unigram.get(
                    gid, self.unigram_floor))
                p = self.graphones[best][1]
                if p:
                    out.append(p)
            return "|".join(out)
        best_hi, best_s = -1, self.NEG_INF
        for hi, (score, h1, h2, _, _) in enumerate(beams[G]):
            s = score + self._lm(h1, h2, -2)
            if s > best_s:
                best_s, best_hi = s, hi
        gids = []
        pos, idx = G, best_hi
        while pos > 0 and idx >= 0:
            score, h1, h2, prev, gid = beams[pos][idx]
            if gid < 0:
                break
            gids.append(gid)
            pos -= len(self.graphones[gid][0])
            idx = prev
        gids.reverse()
        return "|".join(self.graphones[g][1] for g in gids
                        if self.graphones[g][1])
