"""Token re-filter cascade.

Behavior-parity reimplementation of the reference's ``TokenFilter``
(``invertedindex/src/main/java/preprocess/TokenFilter.java:11-84``): a regex
cascade that

1. drops tokens containing no ASCII letters at all,
2. collapses dotted single-letter acronyms (``u.s.a.`` -> ``usa``),
3. splits on non-word characters *unless* the token starts with a letter and
   contains a "meaningful dash" (``mach-3``, ``re-entry``) — and then
   re-filters each piece and drops empties.

All patterns are compiled with ``re.ASCII`` because Java's ``\\w`` / ``\\d``
are ASCII-only by default while Python 3's are Unicode-aware.  Java's
``Matcher.find`` is ``re.search`` in Python.
"""

from __future__ import annotations

import re

# ^[^a-zA-Z]*$  — token has no alphabetic characters (TokenFilter.java:15)
_NON_ALPHA = re.compile(r"^[^a-zA-Z]*$", re.ASCII)
# ^\d+(?:\W*\w*)* — token starts with a number (TokenFilter.java:20)
_STARTS_WITH_NUMBER = re.compile(r"^\d+(?:\W*\w*)*", re.ASCII)
# single-letter dotted acronyms, 2..5 letters (TokenFilter.java:26)
_ACRONYMS = re.compile(r".*(?<![a-zA-Z0-9])(?:[a-zA-Z]\.){2,5}.*", re.ASCII)
# meaningful dashes (TokenFilter.java:33)
_DASHES = re.compile(r".*(?:\w+-\d+).*|^[a-zA-Z]{1,2}-\w+", re.ASCII)
# split on non-word chars, Java String.split("\\W") (TokenFilter.java:59)
_NON_WORD = re.compile(r"\W", re.ASCII)


def filter_token(token: str) -> str:
    """Drop no-alphabet tokens; strip dots from acronyms; else pass through.

    Mirrors ``TokenFilter.filterToken`` (TokenFilter.java:69-79).
    """
    if _NON_ALPHA.search(token):
        return ""
    if _ACRONYMS.search(token):
        return token.replace(".", "")
    return token


def token_filter(token: str) -> list[str]:
    """Full cascade: filter, conditionally split, re-filter pieces.

    Mirrors the ``TokenFilter`` constructor + ``splitToken``
    (TokenFilter.java:37-65).  Java's ``split`` drops only *trailing* empty
    strings, but every empty piece is removed by the re-filter anyway, so a
    plain ``re.split`` is equivalent.
    """
    token = filter_token(token)
    if _STARTS_WITH_NUMBER.search(token) or not _DASHES.search(token):
        pieces = _NON_WORD.split(token)
    else:
        pieces = [token]
    out = []
    for piece in pieces:
        filtered = filter_token(piece)
        if filtered:
            out.append(filtered)
    return out
