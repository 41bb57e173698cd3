"""Deterministic English lemmatization for the ``full_lemma`` index mode.

Closes the reference's lemma-index gap (CoreNLP lemmatizer at
``index/Indexer.java:82-103``, spaCy at ``pyindex/tokenizer.py:13-43``):
with ``useStemming`` off the reference builds a LEMMA index, not a
surface-form index.  Model-backed lemmatizers can't ship in this
environment, so the rebuild provides two tiers:

- :func:`rule_lemma` — a dictionary-free rule lemmatizer
  (irregular-form table + suffix detachment in the style of WordNet's
  public morphy rules: plural nouns, 3rd-person-singular and -ed/-ing
  verb inflections, with consonant undoubling and final-e restoration).
  Deterministic and dependency-free, so it is fingerprint-safe for
  distributed builds — ``IndexConfig(mode="full_lemma")`` uses it on both
  the index and query sides.  It is an approximation: context-dependent
  lemmas (POS ambiguity, comparatives) are out of reach without a model.

- :func:`spacy_normalizer` — a factory returning a spaCy-backed
  ``str -> str`` lemmatizer when spaCy and a model are importable, gated
  exactly like the multimodal codecs (``NotImplementedError`` naming the
  missing dependency otherwise).  Pass its result as
  ``TokenPipeline(normalizer=...)`` for reference-exact lemmas
  off-sandbox; it is NOT a named mode because a model-backed callable
  can't be fingerprinted into a resumable build config.
"""

from __future__ import annotations

# Very common irregular inflections -> lemma.  Small on purpose: the table
# covers forms frequent enough to distort df statistics, not the long tail
# (which the suffix rules approximate).  Pronoun/be/auxiliary forms are
# mostly stopwords and never reach the normalizer; listed forms here are
# the content-word irregulars.
_IRREGULAR = {
    # nouns
    "men": "man", "women": "woman", "children": "child", "people": "person",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "mice": "mouse",
    "lives": "life", "knives": "knife", "wives": "wife", "leaves": "leaf",
    "selves": "self", "shelves": "shelf", "halves": "half",
    "data": "datum", "criteria": "criterion", "phenomena": "phenomenon",
    "analyses": "analysis", "bases": "basis", "hypotheses": "hypothesis",
    "theses": "thesis", "axes": "axis", "matrices": "matrix",
    "indices": "index", "vertices": "vertex", "appendices": "appendix",
    # verbs
    "went": "go", "gone": "go", "did": "do", "done": "do", "said": "say",
    "made": "make", "took": "take", "taken": "take", "came": "come",
    "saw": "see", "seen": "see", "knew": "know", "known": "know",
    "got": "get", "gotten": "get", "gave": "give", "given": "give",
    "found": "find", "thought": "think", "told": "tell", "became": "become",
    "showed": "show", "shown": "show", "left": "leave", "felt": "feel",
    "brought": "bring", "began": "begin", "begun": "begin", "kept": "keep",
    "held": "hold", "wrote": "write", "written": "write", "stood": "stand",
    "heard": "hear", "let": "let", "meant": "mean", "set": "set",
    "met": "meet", "ran": "run", "paid": "pay", "sat": "sit",
    "spoke": "speak", "spoken": "speak", "lay": "lie", "led": "lead",
    "read": "read", "grew": "grow", "grown": "grow", "lost": "lose",
    "fell": "fall", "fallen": "fall", "sent": "send", "built": "build",
    "understood": "understand", "drew": "draw", "drawn": "draw",
    "broke": "break", "broken": "break", "spent": "spend", "cut": "cut",
    "rose": "rise", "risen": "rise", "drove": "drive", "driven": "drive",
    "bought": "buy", "wore": "wear", "worn": "wear", "chose": "choose",
    "chosen": "choose", "lying": "lie", "dying": "die", "tying": "tie",
    # common -ed/-ing forms the syllable heuristic would miss
    "created": "create", "creating": "create", "used": "use",
    "using": "use", "caused": "cause", "causing": "cause",
    "increased": "increase", "increasing": "increase",
    "decreased": "decrease", "decreasing": "decrease",
    "required": "require", "requiring": "require",
    "provided": "provide", "providing": "provide",
}

_VOWELS = frozenset("aeiouy")
# letters that undouble after suffix stripping ('running' -> 'run');
# l and s excluded so 'falling' -> 'fall', 'passing' -> 'pass' survive
_UNDOUBLE = frozenset("bdfgmnprt")


def _vowel_groups(s: str) -> int:
    n, prev = 0, False
    for ch in s:
        v = ch in _VOWELS
        if v and not prev:
            n += 1
        prev = v
    return n


def _fix_stem(stem: str) -> str:
    """Post-detachment repair: undouble ('hopp' -> 'hop') or restore a
    final e on one-syllable CVC stems ('sav' -> 'save')."""
    if (
        len(stem) >= 3
        and stem[-1] == stem[-2]
        and stem[-1] in _UNDOUBLE
    ):
        return stem[:-1]
    if (
        len(stem) >= 3
        and _vowel_groups(stem) == 1
        and stem[-1] not in _VOWELS
        and stem[-2] in _VOWELS - {"y"}
        and stem[-3] not in _VOWELS
    ):
        return stem + "e"
    return stem


def rule_lemma(token: str) -> str:
    """Lemma of one lowercase token by irregular lookup + suffix rules.

    Deterministic, dictionary-free; intended for post-TokenFilter,
    post-stopword tokens (pure lowercase words)."""
    got = _IRREGULAR.get(token)
    if got is not None:
        return got
    n = len(token)
    # --- plural nouns / 3rd-person-singular verbs
    if token.endswith("ies") and n > 4:
        return token[:-3] + "y"
    for suf, rep in (
        ("sses", "ss"), ("shes", "sh"), ("ches", "ch"),
        ("xes", "x"), ("zes", "z"), ("oes", "o"),
    ):
        if token.endswith(suf) and n > len(suf) + 1:
            return token[: -len(suf)] + rep
    if (
        token.endswith("s")
        and n > 3
        and not token.endswith(("ss", "us", "is"))
    ):
        return token[:-1]
    # --- verb inflections
    if token.endswith("ied") and n > 4:
        return token[:-3] + "y"
    if token.endswith("ed") and n > 4:
        return _fix_stem(token[:-2])
    if token.endswith("ing") and n > 5:
        return _fix_stem(token[:-3])
    return token


def spacy_normalizer(model: str = "en_core_web_sm"):
    """A spaCy-backed ``str -> str`` lemmatizer, or ``NotImplementedError``
    when spaCy/the model is absent (availability-gated like the multimodal
    codecs).  Per-token lemmatization — no sentence context, same shape as
    the ``TokenPipeline`` normalizer slot."""
    try:  # pragma: no cover - spaCy absent in this environment
        import spacy
    except ImportError:
        raise NotImplementedError(
            "spacy_normalizer requires spaCy (and a model such as "
            f"{model!r}) — not available here; mode='full_lemma' uses the "
            "deterministic rule_lemma instead"
        ) from None
    nlp = spacy.load(model, disable=["parser", "ner"])  # pragma: no cover

    def lemma(token: str) -> str:  # pragma: no cover
        doc = nlp(token)
        return doc[0].lemma_.lower() if len(doc) else token

    return lemma  # pragma: no cover
