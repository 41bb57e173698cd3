from .lemmatize import rule_lemma, spacy_normalizer
from .porter import porter_stem
from .stopwords import STOPWORDS, STOPWORDS_SQL_LIST
from .tokenfilter import filter_token, token_filter
from .tokenizer import MODES, TokenPipeline, normalize_text

__all__ = [
    "porter_stem",
    "rule_lemma",
    "spacy_normalizer",
    "STOPWORDS",
    "STOPWORDS_SQL_LIST",
    "filter_token",
    "token_filter",
    "MODES",
    "TokenPipeline",
    "normalize_text",
]
