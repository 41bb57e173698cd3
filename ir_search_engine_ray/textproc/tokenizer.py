"""Tokenization pipeline: text -> index terms.

Two modes, both deterministic and shared verbatim by the distributed build,
the query parser and the pure-Python oracle:

- ``"full"`` (default): lowercase -> HTML-ish tag strip -> whitespace split ->
  TokenFilter cascade -> stopword drop -> Porter stem.  This is the
  reference-parity pipeline (reference doc path:
  ``index/Indexer.java:90-117`` = lemmatize -> TokenFilter -> optional stem ->
  stopword-checked insert; the rebuild substitutes deterministic lowercasing
  for the CoreNLP/spaCy lemmatizer — the north rule names
  tokenization/stopword/Porter, not lemmatization).  Documented deviation from
  the reference: the stopword check runs *before* stemming (the reference
  checks the stemmed form at dictionary insert, ``index/SPIMI.java:78-87``,
  which lets e.g. "this" -> "thi" enter a stemmed index while the query side,
  ``search/QueryParser.java:60``, checks the unstemmed form; the rebuild uses
  the query-side order on both sides so the two pipelines agree).

- ``"simple"``: lowercase -> split on ``[^a-z]+`` -> stopword drop.  Exactly
  expressible in ANSI/DuckDB SQL (``regexp_split_to_array(lower(text),
  '[^a-z]+')``), used for the driver's DuckDB-oracle correctness gate; the
  full pipeline is covered by the pytest oracle instead.

Per-process memoization (raw whitespace token -> tuple of final terms)
generalizes the reference's stem memo-cache (``index/Indexer.java:26-39``):
Ray reuses worker processes across batches, so the cache amortizes the regex
cascade to a dict lookup for the (Zipf-distributed) repeating vocabulary.
"""

from __future__ import annotations

import re
from collections import Counter

from .porter import porter_stem
from .stopwords import STOPWORDS
from .tokenfilter import token_filter

# strip HTML/SGML-ish tags before tokenizing (pyindex/tokenizer.py:7-20 analogue)
_TAG = re.compile(r"</?\w+>", re.ASCII)
_SIMPLE_SPLIT = re.compile(r"[^a-z]+")

MODES = ("full", "full_nostem", "full_lemma", "simple")


def normalize_text(text: str) -> str:
    """Lowercase and strip tags; the per-token work happens in the cascade."""
    return _TAG.sub(" ", text.lower())


def _full_terms_uncached(raw: str, normalizer) -> tuple[str, ...]:
    out = []
    for piece in token_filter(raw):
        if piece in STOPWORDS:
            continue
        out.append(normalizer(piece))
    return tuple(out)


def _identity(term: str) -> str:
    return term


class TokenPipeline:
    """Callable text -> list of terms, with a per-instance memo cache.

    One instance lives per Ray actor / worker process (created in the stage's
    ``__init__``), so the cache is built once and reused across batches.

    ``normalizer`` is the reference's lemmatize-or-stem slot
    (``index/Indexer.java:82-103``: CoreNLP lemma when ``useStemming`` is
    off): any ``str -> str`` callable applied to each post-filter,
    post-stopword piece.  Defaults per mode (``full`` -> Porter,
    ``full_lemma`` -> the deterministic rule lemmatizer
    (``textproc/lemmatize.py``, fingerprint-safe so distributed builds can
    name it: ``IndexConfig(mode="full_lemma")``), ``full_nostem``/``simple``
    -> identity); pass e.g. ``spacy_normalizer()`` for model-backed lemmas.
    Custom callables serve library/query-side users and build scripts,
    where the callable ships to workers via the stage closure — named
    modes only for resumable distributed builds (config fingerprints must
    serialize).
    """

    def __init__(self, mode: str = "full", *, normalizer=None) -> None:
        if mode not in MODES:
            raise ValueError(f"unknown tokenizer mode {mode!r}; want one of {MODES}")
        self.mode = mode
        if normalizer is None:
            if mode == "full":
                normalizer = porter_stem
            elif mode == "full_lemma":
                from .lemmatize import rule_lemma

                normalizer = rule_lemma
            else:
                normalizer = _identity
        self.normalizer = normalizer
        self._cache: dict[str, tuple[str, ...]] = {}

    def raw_tokens(self, text: str) -> list[str]:
        if self.mode == "simple":
            return [t for t in _SIMPLE_SPLIT.split(text.lower()) if t]
        return normalize_text(text).split()

    def terms_for_raw(self, raw: str) -> tuple[str, ...]:
        """Final index terms produced by one raw whitespace token."""
        got = self._cache.get(raw)
        if got is None:
            if self.mode == "simple":
                got = () if raw in STOPWORDS else (raw,)
            else:
                got = _full_terms_uncached(raw, self.normalizer)
            self._cache[raw] = got
        return got

    def __call__(self, text: str) -> list[str]:
        """All index terms of ``text``, in document order."""
        out: list[str] = []
        for raw in self.raw_tokens(text):
            out.extend(self.terms_for_raw(raw))
        return out

    def term_counts(self, text: str) -> Counter:
        """Bag-of-words term frequencies for one document (= one turn)."""
        return Counter(self(text))
