"""A minimal, dependency-free byte-pair-encoding tokenizer (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units") for the token-counting injection point
(operators/text_analysis.with_token_counts).

This is the REAL subword path the regex count approximates: learn a
merge table from a corpus sample on the driver (vocabularies are
small — kilobytes — and learned offline in production anyway), then
ship the ranked merges to executors inside an Arrow-batched pandas
UDF. Encoding is the standard greedy lowest-rank-merge-first loop.

Determinism: pre-tokenization mirrors text_analysis's BPE-ish regex
(runs of alphanumerics or single symbols, lowercased), and merge ties
break lexicographically, so the same corpus sample always yields the
same vocabulary on any machine.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

# mirror of the JVM-side regex in with_token_counts: runs of
# alphanumerics, or one non-alphanumeric non-space symbol
_PRETOKEN = re.compile(r"[a-z0-9]+|[^a-z0-9\s]", re.ASCII)
_END = "</w>"


def pretokenize(text: str) -> list[str]:
    if not isinstance(text, str):
        return []
    return _PRETOKEN.findall(text.lower())


def learn_bpe(texts, num_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from an iterable of texts.
    Returns the ranked merge list (rank = list position). Ties on
    pair frequency break lexicographically for determinism."""
    vocab = Counter()
    for t in texts:
        for w in pretokenize(t):
            vocab[tuple(w) + (_END,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = Counter()
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        maxc = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == maxc)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = Counter()
        for word, freq in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


class BpeTokenizer:
    """Greedy BPE encoder over a learned merge table. Instances are
    small and picklable — pass ``tokenizer=BpeTokenizer(merges).count``
    straight into ``with_token_counts`` and the closure ships to the
    Python workers with the UDF."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        # per-worker memo of word -> token count: corpora repeat words
        # massively, and the greedy merge loop is the hot cost. Bounded
        # so a pathological all-unique-words corpus cannot grow it
        # without limit. Starts empty after pickling (ships no state).
        self._wcache: dict[str, int] = {}

    def encode_word(self, word: str) -> list[str]:
        parts = list(word) + [_END]
        while len(parts) > 1:
            ranked = [
                (self.ranks[p], i)
                for i, p in enumerate(zip(parts, parts[1:]))
                if p in self.ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            parts[i:i + 2] = [parts[i] + parts[i + 1]]
        if parts and parts[-1] == _END:
            parts = parts[:-1]  # bare end-marker from empty merge tail
        return parts

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in pretokenize(text):
            out.extend(self.encode_word(w))
        return out

    def _count_word(self, w: str) -> int:
        n = self._wcache.get(w)
        if n is None:
            n = len(self.encode_word(w))
            if len(self._wcache) < 5_000_000:
                self._wcache[w] = n
        return n

    def count(self, texts: pd.Series) -> pd.Series:
        """Batch token counter with the ``fn(pd.Series[str]) ->
        pd.Series[int]`` contract of the injection point. Counts via
        the per-word memo — identical to ``len(self.encode(t))``
        (encode concatenates per-word encodings, so lengths add)."""
        return texts.map(
            lambda t: sum(self._count_word(w) for w in pretokenize(t))
            if isinstance(t, str)
            else 0
        )
