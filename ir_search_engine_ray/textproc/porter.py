"""Porter stemmer.

A fresh Python implementation of the classic Porter stemming algorithm
(M. F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980),
matching the behavior of the reference's Java implementation
(``invertedindex/src/main/java/preprocess/Stemmer.java:17-590``), which is the
standard public-domain "tartarus" Java version including its later revisions:
``bli -> ble`` and ``logi -> log`` in step 3, the ``k == 0`` guards ("Bug 1")
in steps 3/5 and the ``j >= 0`` guard ("Bug 2") on the ``-ion`` rule.

Words of length <= 2 are returned unchanged (Stemmer.java:550 ``if (k > 1)``).
The implementation below keeps the buffer/``j``/``k`` index structure of the
published algorithm so each rule can be checked line-for-line against it.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


class _Stem:
    __slots__ = ("b", "j", "k")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.j = 0
        self.k = len(word) - 1

    # cons(i) is true <=> b[i] is a consonant
    def cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    # m() measures the number of consonant sequences between 0 and j
    def m(self) -> int:
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    # doublec(j) is true <=> b[j-1..j] contain a double consonant
    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    # cvc(i) is true <=> b[i-2..i] is consonant-vowel-consonant and the
    # second c is not w, x or y
    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        length = len(s)
        if length > self.k + 1:
            return False
        start = self.k - length + 1
        if self.b[start : self.k + 1] != list(s):
            return False
        self.j = self.k - length
        return True

    # setto(s) sets b[j+1..k] to the characters of s
    def setto(self, s: str) -> None:
        self.b[self.j + 1 : self.k + 1] = list(s)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # step1: plurals and -ed / -ing  (Stemmer.java step1)
    def step1(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                self.k -= 1
                if self.b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    # step2: terminal y -> i when there is another vowel in the stem
    def step2(self) -> None:
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    # step3: double suffixes -> single (Stemmer.java step3, incl. bli/logi)
    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"),
              ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def step3(self) -> None:
        if self.k == 0:
            return  # Bug 1 guard
        rules = self._STEP3.get(self.b[self.k - 1])
        if not rules:
            return
        for suffix, repl in rules:
            if self.ends(suffix):
                self.r(repl)
                return

    # step4: -ic-, -full, -ness etc.
    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def step4(self) -> None:
        rules = self._STEP4.get(self.b[self.k])
        if not rules:
            return
        for suffix, repl in rules:
            if self.ends(suffix):
                self.r(repl)
                return

    # step5: -ant, -ence etc. in context <c>vcvc<v>
    _STEP5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def step5(self) -> None:
        if self.k == 0:
            return  # Bug 1 guard
        prev = self.b[self.k - 1]
        if prev == "o":
            # -ion preceded by s/t (with Bug 2 guard), or -ou
            if not (
                (self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"))
                or self.ends("ou")
            ):
                return
        else:
            rules = self._STEP5.get(prev)
            if not rules:
                return
            for suffix in rules:
                if self.ends(suffix):
                    break
            else:
                return
        if self.m() > 1:
            self.k = self.j

    # step6: final -e and -ll
    def step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1

    def run(self) -> str:
        if self.k > 1:
            self.step1()
            self.step2()
            self.step3()
            self.step4()
            self.step5()
            self.step6()
        return "".join(self.b[: self.k + 1])


@lru_cache(maxsize=1 << 18)
def porter_stem(word: str) -> str:
    """Stem ``word`` (expected lowercase ASCII). Length <= 2 is unchanged."""
    if len(word) <= 2:
        return word
    return _Stem(word).run()
