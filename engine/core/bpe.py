"""Deterministic byte-pair-encoding tokenizer (train + encode).

Token budgets are the currency of training-data work, and the regex token
-class proxy in datawork.textstats (``tokens_bpe``) only approximates them.
This module is a REAL subword tokenizer: a merges table trained once on the
committed synthetic corpus (tools/train_bpe.py → data/bpe/merges.txt, frozen
like the golden vectors), and a greedy rank-based encoder whose output is
the oracle (the expected-parquet pattern: the same pure function produces
tools/build_expected.py's ``expected_bpe.parquet`` and runs inside the
Spark pandas UDF — engine/core stays Spark-free, invariant #1).

Conventions (all deterministic):

* pre-tokenization: lowercase, whitespace-split — the same word stream
  ``datawork.textstats.words`` produces, so token counts compose with the
  rest of the text-stats family.
* a word's symbol sequence is its characters plus a terminal ``</w>``
  marker (the classic Sennrich et al. 2016 formulation).
* training picks the most frequent adjacent pair each round, ties broken
  by lexicographically smallest pair — no RNG, no dict-order dependence.
* encoding merges the LOWEST-rank pair present, all occurrences
  left-to-right per pass, until no ranked pair remains.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Tuple

END = "</w>"
_INF = float("inf")

Pair = Tuple[str, str]


def word_symbols(word: str) -> Tuple[str, ...]:
    return tuple(word) + (END,)


def train_merges(word_freqs: Dict[str, int], n_merges: int) -> List[Pair]:
    """Learn up to ``n_merges`` merges from a word-frequency table.

    O(n_merges · Σ|word|) with an incrementally maintained pair counter —
    each round only re-segments the words that actually contain the chosen
    pair (the standard trick; a full recount per round is quadratic)."""
    vocab: Dict[Tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        syms = word_symbols(w)
        vocab[syms] = vocab.get(syms, 0) + f

    pair_counts: Counter = Counter()
    pair_words: Dict[Pair, set] = {}
    for syms, f in vocab.items():
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words.setdefault(p, set()).add(syms)

    merges: List[Pair] = []
    for _ in range(n_merges):
        best: Pair | None = None
        best_count = 0
        for p, c in pair_counts.items():
            if c > best_count or (c == best_count and best is not None
                                  and p < best):
                best, best_count = p, c
        if best is None or best_count == 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for syms in sorted(pair_words.get(best, ())):
            f = vocab.pop(syms, 0)
            if not f:
                continue
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(syms)
                    if not ws:
                        del pair_words[p]
            new = _apply_merge(syms, best, merged)
            nf = vocab.get(new, 0) + f
            vocab[new] = nf
            for p in zip(new, new[1:]):
                pair_counts[p] += f
                pair_words.setdefault(p, set()).add(new)
    return merges


def _apply_merge(syms: Tuple[str, ...], pair: Pair,
                 merged: str) -> Tuple[str, ...]:
    out: List[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def build_ranks(merges: Iterable[Pair]) -> Dict[Pair, int]:
    return {p: i for i, p in enumerate(merges)}


def encode_word(word: str, ranks: Dict[Pair, int],
                _cache: Dict[str, Tuple[str, ...]] | None = None
                ) -> Tuple[str, ...]:
    """Greedy rank-based BPE encode of one (already lowercased) word."""
    if _cache is not None:
        hit = _cache.get(word)
        if hit is not None:
            return hit
    syms: Tuple[str, ...] = word_symbols(word)
    while len(syms) > 1:
        best_rank = _INF
        best: Pair | None = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p, _INF)
            if r < best_rank:
                best_rank, best = r, p
        if best is None:
            break
        syms = _apply_merge(syms, best, best[0] + best[1])
    if _cache is not None:
        _cache[word] = syms
    return syms


def encode_text(text: str, ranks: Dict[Pair, int],
                _cache: Dict[str, Tuple[str, ...]] | None = None
                ) -> List[str]:
    """All tokens of a text under the textstats word convention
    (lowercase, whitespace-split; blank text → no tokens)."""
    t = text.strip().lower()
    if not t:
        return []
    out: List[str] = []
    for w in t.split():
        out.extend(encode_word(w, ranks, _cache))
    return out


def count_tokens(text: str, ranks: Dict[Pair, int],
                 _cache: Dict[str, Tuple[str, ...]] | None = None) -> int:
    t = text.strip().lower()
    if not t:
        return 0
    return sum(len(encode_word(w, ranks, _cache)) for w in t.split())


def save_merges(merges: Iterable[Pair], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for a, b in merges:
            f.write(f"{a}\t{b}\n")


def load_merges(path: str) -> List[Pair]:
    out: List[Pair] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            a, b = line.split("\t")
            out.append((a, b))
    return out
