"""Text-analysis operators for training-data pipelines over the
``documents`` table (doc_id, text, lang, source, n_chars).

All are single-pass ``map_batches`` transforms (no shuffle), vectorized where
the kernel allows.  ``token_count`` / ``quality_signals`` / ``lang_id`` have
exact DuckDB SQL oracles (see ``__ray_entry__.oracle_sql``); the rolling-hash
fingerprint is checked by unit test (not SQL-expressible).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..textproc.stopwords import STOPWORDS

_TOKEN = re.compile(r"[a-z]+")


def _regex_char_counts(col: pa.Array | pa.ChunkedArray, pattern: str) -> np.ndarray:
    """Per-string count of characters matched by ``pattern`` (an RE2
    character class, '+'-grouped): utf8_length(text) - utf8_length(text
    with the matches removed) — two Arrow kernel passes per batch, no
    Python loop over characters (measured ~3x faster than the per-char
    loop it replaces, and the gap widens with document size)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    total = pc.utf8_length(col)
    stripped = pc.utf8_length(
        pc.replace_substring_regex(col, pattern=pattern, replacement="")
    )
    return (
        pc.subtract(total, stripped)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def ascii_alpha_counts(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-string ASCII-letter counts — exactly the SQL oracle's
    ``length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))``."""
    return _regex_char_counts(col, "[A-Za-z]+")

# tiny per-language function-word sets for the heuristic language guesser;
# deliberately small so the same logic is expressible in the SQL oracle
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "fr": ("le", "la", "les", "des", "une", "est", "dans", "pour"),
    "es": ("el", "los", "las", "una", "que", "por", "para", "con"),
    "de": ("der", "die", "das", "und", "nicht", "ein", "mit", "für"),
}


def _tokens(text: str) -> list[str]:
    return _TOKEN.findall(text.lower())


def token_count(batch: pa.Table) -> pa.Table:
    """doc_id -> number of [a-z]+ tokens (whitespace-agnostic)."""
    counts = [len(_tokens(t)) for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts, type=pa.int64()),
        }
    )


# GPT2-style pre-tokenizer shape: contractions, leading-space words/numbers,
# punctuation runs — the piece count a BPE tokenizer would start from
_BPE_ISH = __import__("re").compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+(?!\S)|\s+"
)


def token_count_bpe(batch: pa.Table) -> pa.Table:
    """doc_id -> BPE-ish piece count (whitespace pieces excluded) — the
    cheap proxy for 'how many tokens will this cost to train on'."""
    texts = batch["text"].to_pylist()
    counts = [
        sum(1 for m in _BPE_ISH.findall(t) if not m.isspace()) for t in texts
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_pieces": pa.array(counts, type=pa.int64()),
        }
    )


def quality_signals(batch: pa.Table) -> pa.Table:
    """Cheap quality heuristics: length, alpha ratio, stopword ratio, mean
    token length — the usual pre-training corpus filters.

    ``alpha_ratio`` counts Unicode LETTERS (RE2 ``\\pL``, vectorized);
    this replaced a per-character ``str.isalpha`` Python loop — identical
    on letters, but no longer counts the rare Other_Alphabetic combining
    marks / Nl numerals that ``isalpha`` includes."""
    texts = batch["text"].to_pylist()
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    n_alpha = _regex_char_counts(batch["text"], r"\pL+")
    tok_lists = [_tokens(t) for t in texts]
    n_tokens = np.array([len(ts) for ts in tok_lists], dtype=np.int64)
    n_stop = np.array(
        [sum(t in STOPWORDS for t in ts) for ts in tok_lists], dtype=np.int64
    )
    tok_chars = np.array([sum(len(t) for t in ts) for ts in tok_lists], np.int64)
    safe = np.maximum(n_tokens, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "alpha_ratio": pa.array(
                np.round(n_alpha / np.maximum(n_chars, 1), 6), type=pa.float64()
            ),
            "stopword_ratio": pa.array(
                np.round(n_stop / safe, 6), type=pa.float64()
            ),
            "mean_token_len": pa.array(
                np.round(tok_chars / safe, 6), type=pa.float64()
            ),
        }
    )


# frozenset mirror of LANG_MARKERS for O(1) membership; LANG_MARKERS
# itself stays an ordered tuple dict — the SQL oracle builder iterates it
# and the tie-break order ('en','fr','es','de') is part of the semantics
_LANG_MARKER_SETS = {lang: frozenset(m) for lang, m in LANG_MARKERS.items()}


def guess_langs(tok_lists: list[list[str]]) -> list[str]:
    """Language guess per pre-tokenized doc: argmax of per-language
    marker-word hits; 'unk' when nothing matches; ties break in fixed
    ('en','fr','es','de') order — the SQL oracle encodes the same order.
    Taking TOKEN LISTS lets callers that already tokenized (the curate
    quality gate) skip a second tokenize pass."""
    langs = []
    for toks in tok_lists:
        best_lang, best_hits = "unk", 0
        for lang, markers in _LANG_MARKER_SETS.items():
            hits = sum(tok in markers for tok in toks)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        langs.append(best_lang)
    return langs


def lang_id(batch: pa.Table) -> pa.Table:
    """Heuristic language guess per doc — see :func:`guess_langs`."""
    texts = batch["text"].to_pylist()
    langs = guess_langs([_tokens(t) for t in texts])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_guess": pa.array(langs, type=pa.string()),
        }
    )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def doc_fingerprint(batch: pa.Table) -> pa.Table:
    """Order-sensitive rolling (polynomial) hash of the token stream —
    a cheap whole-document fingerprint for exact-content matching that
    ignores whitespace/punctuation differences.

    The whole computation (char polynomial per token, token polynomial per
    doc) is pure modular integer arithmetic so the DuckDB oracle reproduces
    it exactly with ``list_reduce`` + HUGEINT (see
    ``entry_queries.build_oracle_sql['doc_fingerprint']``)."""
    out = []
    memo: dict[str, int] = {}
    for t in batch["text"].to_pylist():
        h = 0
        for tok in _tokens(t):
            th = memo.get(tok)
            if th is None:
                th = memo[tok] = hash_token(tok)
            h = (h * _FP_BASE + th) % _FP_MOD
        out.append(h)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(out, type=pa.int64()),
        }
    )


def hash_token(tok: str) -> int:
    """Deterministic (process-independent) token hash: 32-bit char
    polynomial ``h = h*31 + ord(c)``.  Chosen over crc32 because it is
    expressible in ANSI SQL (fold over characters), making the fingerprint
    oracle-checkable end to end."""
    h = 0
    for c in tok:
        h = (h * 31 + ord(c)) & 0xFFFFFFFF
    return h


def bigram_pmi(
    docs_ds: ray.data.Dataset, *, min_count: int = 2
) -> ray.data.Dataset:
    """Collocation strength: (ngram, count, pmi) for every bigram with
    ``count >= min_count``, where ``pmi = ln(p(ab) / (p(a) p(b)))``
    computed as ``ln(c_ab * T1 * T1 / (c_a * c_b * T2))`` — T1/T2 the
    corpus unigram/bigram totals (float arithmetic ordered exactly as the
    DuckDB oracle writes it, rounded to 6).  The phrase-mining /
    tokenizer-merge-scoring staple.

    Scale shape: unigram and bigram tables come from the
    :func:`ngram_counts` combiners (vocabulary-sized, never the token
    stream); the two unigram-count attachments are partition-tagged
    unions + ``groupby(part)`` — the anti_join_ids co-location shape with
    an attach instead of a drop.  Totals are two scalar aggregates; no
    driver-side vocabulary."""
    P = 64
    uni = ngram_counts(docs_ds, n=1).materialize()
    bi_all = ngram_counts(docs_ds, n=2).materialize()
    t1 = float(uni.sum("count"))
    t2 = float(bi_all.sum("count"))
    bi = bi_all.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["count"], min_count)),
        batch_format="pyarrow",
    )

    def _wpart(words: list[str]) -> np.ndarray:
        import zlib

        return np.array(
            [zlib.crc32(w.encode()) % P for w in words], dtype=np.int32
        )

    def tag_uni(b: pa.Table) -> pa.Table:
        words = b["ngram"].to_pylist()
        n = len(words)
        return pa.table(
            {
                "w": pa.array(words, type=pa.string()),
                "ngram": pa.nulls(n, type=pa.string()),
                "cnt": b["count"].cast(pa.int64()),
                "carry": pa.array(np.zeros(n, dtype=np.int64)),
                "part": pa.array(_wpart(words)),
            }
        )

    def tag_bi(word_idx: int):
        def f(b: pa.Table) -> pa.Table:
            ngrams = b["ngram"].to_pylist()
            words = [g.split(" ")[word_idx] for g in ngrams]
            carry = (
                b["carry"]
                if "carry" in b.column_names
                else pa.array(np.zeros(len(ngrams), dtype=np.int64))
            )
            return pa.table(
                {
                    "w": pa.array(words, type=pa.string()),
                    "ngram": pa.array(ngrams, type=pa.string()),
                    "cnt": b["count"].cast(pa.int64()),
                    "carry": carry,
                    "part": pa.array(_wpart(words)),
                }
            )

        return f

    def attach(group: pa.Table) -> pa.Table:
        is_bi = pa.compute.is_valid(group["ngram"])
        brows = group.filter(is_bi)
        if brows.num_rows == 0:
            return pa.table(
                {
                    "ngram": pa.array([], type=pa.string()),
                    "count": pa.array([], type=pa.int64()),
                    "carry": pa.array([], type=pa.int64()),
                }
            )
        urows = group.filter(pa.compute.invert(is_bi))
        umap = dict(
            zip(urows["w"].to_pylist(), urows["cnt"].to_numpy())
        )
        # every bigram word exists in the unigram vocabulary by construction
        att = np.array(
            [umap[w] for w in brows["w"].to_pylist()], dtype=np.int64
        )
        return pa.table(
            {
                "ngram": brows["ngram"],
                "count": brows["cnt"],
                "carry": pa.array(att),
            }
        )

    # pass 1 attaches c_a (left word) into `carry`; pass 2 re-tags by the
    # right word with c_a riding along, attaches c_b, and finishes
    s1 = (
        bi.map_batches(tag_bi(0), batch_format="pyarrow")
        .union(uni.map_batches(tag_uni, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach, batch_format="pyarrow")
    )

    def retag(b: pa.Table) -> pa.Table:
        ngrams = b["ngram"].to_pylist()
        words = [g.split(" ")[1] for g in ngrams]
        return pa.table(
            {
                "w": pa.array(words, type=pa.string()),
                "ngram": b["ngram"],
                "cnt": b["count"].cast(pa.int64()),
                "carry": b["carry"],
                "part": pa.array(_wpart(words)),
            }
        )

    def attach2(group: pa.Table) -> pa.Table:
        is_bi = pa.compute.is_valid(group["ngram"])
        brows = group.filter(is_bi)
        if brows.num_rows == 0:
            return pa.table(
                {
                    "ngram": pa.array([], type=pa.string()),
                    "count": pa.array([], type=pa.int64()),
                    "pmi": pa.array([], type=pa.float64()),
                }
            )
        urows = group.filter(pa.compute.invert(is_bi))
        umap = dict(
            zip(urows["w"].to_pylist(), urows["cnt"].to_numpy())
        )
        cb = np.array(
            [umap[w] for w in brows["w"].to_pylist()], dtype=np.int64
        )
        cab = brows["cnt"].to_numpy()
        ca = brows["carry"].to_numpy()
        # float op order mirrors the SQL oracle: the oracle's denominator
        # is HUGEINT-exact (sum() promotes T2), and the float64 product
        # chain here is identical to that as long as each partial product
        # stays under 2^53 — an int64 product instead would silently WRAP
        # at web-corpus counts (c_a*c_b*T2 > 2^63 at ~2e7 tokens)
        num = cab.astype(np.float64) * t1 * t1
        den = ca.astype(np.float64) * cb.astype(np.float64) * t2
        pmi = np.round(np.log(num / den), 6)
        return pa.table(
            {
                "ngram": brows["ngram"],
                "count": pa.array(cab, type=pa.int64()),
                "pmi": pa.array(pmi, type=pa.float64()),
            }
        )

    return (
        s1.map_batches(retag, batch_format="pyarrow")
        .union(uni.map_batches(tag_uni, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach2, batch_format="pyarrow")
    )


def ngram_counts(
    docs_ds: ray.data.Dataset, *, n: int = 2, min_count: int = 1
) -> ray.data.Dataset:
    """Corpus n-gram frequencies: (ngram, count) over the [a-z]+ token
    stream — the language-model / collocation-analysis staple.  Per-batch
    combiners pre-aggregate before one vocabulary-of-ngrams groupby; raw
    token streams never shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for t in batch["text"].to_pylist():
            toks = _tokens(t)
            for i in range(len(toks) - n + 1):
                cnt[" ".join(toks[i : i + n])] += 1
        return pa.table(
            {
                "ngram": pa.array(list(cnt.keys()), type=pa.string()),
                "count": pa.array(list(cnt.values()), type=pa.int64()),
            }
        )

    g = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("count"))
    )

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "ngram": b["ngram"],
                "count": b["sum(count)"].cast(pa.int64()),
            }
        )
        if min_count > 1:
            t = t.filter(
                pa.compute.greater_equal(t["count"], min_count)
            )
        return t

    return g.map_batches(finish, batch_format="pyarrow")


def run(docs_ds: ray.data.Dataset, fn) -> ray.data.Dataset:
    return docs_ds.map_batches(fn, batch_format="pyarrow")


def repetition_signals(batch: pa.Table) -> pa.Table:
    """Gopher-style within-doc repetition: per doc, how many of its word
    n-grams (n=2,3) are occurrences of a DUPLICATED n-gram (one appearing
    more than once in the doc).  Integer numerators/denominators (the
    ratio-discipline of quality_signals); heavily repeated boilerplate
    drives n_dup_*grams toward n_*grams.  Single-pass map, no shuffle."""
    from collections import Counter

    cols: dict[str, list[int]] = {
        "n_2grams": [], "n_dup_2grams": [], "n_3grams": [], "n_dup_3grams": []
    }
    for text in batch["text"].to_pylist():
        toks = _tokens(text)
        for n in (2, 3):
            grams = Counter(
                tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            total = max(0, len(toks) - n + 1)
            dup = sum(c for c in grams.values() if c > 1)
            cols[f"n_{n}grams"].append(total)
            cols[f"n_dup_{n}grams"].append(dup)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            **{k: pa.array(v, type=pa.int64()) for k, v in cols.items()},
        }
    )


def unigram_logprob(
    docs_ds: ray.data.Dataset, *, top_v: int = 65536
) -> ray.data.Dataset:
    """Per-doc mean unigram log-probability under the corpus's own unigram
    distribution — the deterministic stand-in for a KenLM-style quality
    filter (fluent text scores near the corpus mean; gibberish and
    boilerplate-free random strings fall far below it).

    Semantics (locked, mirrored exactly by the SQL oracle): ``p(term) =
    count / total_tokens`` for the ``top_v`` most frequent terms
    (count DESC, term ASC — a deterministic cut), ``p = 1 / total_tokens``
    for everything else (the floor an out-of-vocabulary token pays);
    score = mean over the doc's tokens of ``ln p``; docs with no tokens
    are omitted.

    Scale shape: per-batch count combiners -> one vocabulary-sized
    ``groupby(term)`` -> a vocabulary-sized sort for the top-V cut whose
    RESULT (``top_v`` rows — bounded by the parameter, not the corpus) is
    the only driver materialization, broadcast once via ``ray.put`` ->
    one scoring pass over the docs (np.unique per batch + per-batch-vocab
    dict probes + reduceat per doc, no per-token Python)."""
    from ray.data.aggregate import Sum

    if top_v < 1:
        raise ValueError(f"top_v must be >= 1, got {top_v}")

    def partial(batch: pa.Table) -> pa.Table:
        # flat token array -> one np.unique (the spans.gram_rows pattern):
        # measurably faster than a per-token Counter loop on fat batches
        tok_lists = [_tokens(t) for t in batch["text"].to_pylist()]
        if not any(tok_lists):
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in tok_lists if t]
        )
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "term": pa.array(uniq, type=pa.string()),
                "cnt": pa.array(cnt, type=pa.int64()),
            }
        )

    counts = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt"))
    )

    def clean(b: pa.Table) -> pa.Table:
        return pa.table(
            {"term": b["term"], "cnt": b["sum(cnt)"].cast(pa.int64())}
        )

    counts = counts.map_batches(clean, batch_format="pyarrow").materialize()
    total = counts.sum("cnt")
    if not total:
        raise ValueError("corpus has no tokens")
    top = counts.sort(["cnt", "term"], descending=[True, False]).limit(top_v)
    vocab: dict[str, float] = {}
    for r in top.take_all():  # bounded by top_v
        vocab[r["term"]] = float(np.log(r["cnt"] / total))
    floor = float(np.log(1.0 / total))
    vocab_ref = ray.put((vocab, floor))

    def score(batch: pa.Table, *, ref) -> pa.Table:
        vb, fl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tok_lists = [_tokens(t) for t in batch["text"].to_pylist()]
        lens = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        keep = lens > 0
        if not keep.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "logprob": pa.array([], type=pa.float64()),
                }
            )
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in tok_lists if t]
        )
        uniq, inv = np.unique(flat, return_inverse=True)
        ulp = np.fromiter(
            (vb.get(u, fl) for u in uniq), dtype=np.float64, count=uniq.size
        )
        lp = ulp[inv]
        lens_k = lens[keep]
        seg = np.cumsum(lens_k) - lens_k
        sums = np.add.reduceat(lp, seg)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep], type=pa.int64()),
                "n_tokens": pa.array(lens_k, type=pa.int64()),
                "logprob": pa.array(
                    np.round(sums / lens_k, 6), type=pa.float64()
                ),
            }
        )

    return docs_ds.map_batches(
        score, fn_kwargs={"ref": vocab_ref}, batch_format="pyarrow"
    )
