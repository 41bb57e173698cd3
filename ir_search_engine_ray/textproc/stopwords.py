"""Stopword set.

Reproduces the reference's hand-written 53-entry list
(``invertedindex/src/main/java/index/SPIMI.java:12-17``) with one documented
deviation: the reference list contains four entries with trailing spaces
("by ", "on ", "that ") which can never match a token, so those words were
effectively *not* stopwords there.  Per SURVEY.md §7 the rebuild cleans the
trailing spaces, i.e. "by", "on", "that" ARE stopwords here.  The oracle
(:mod:`ir_search_engine_ray.oracle`) uses the same set, so rank-identity is
checked against this locked-in choice.
"""

STOPWORDS = frozenset(
    {
        "a", "all", "an", "and", "any", "are", "as", "be", "been",
        "but", "by", "few", "for", "have", "he", "her", "here", "him",
        "his", "how", "i", "in", "is", "it", "its", "many", "me", "my",
        "none", "of", "on", "or", "our", "she", "some", "the", "their",
        "them", "there", "they", "that", "this", "us", "was", "what",
        "when", "where", "which", "who", "why", "will", "with", "you",
        "your",
    }
)

# SQL-literal form for DuckDB oracle queries (driver correctness gate).
STOPWORDS_SQL_LIST = "(" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + ")"
