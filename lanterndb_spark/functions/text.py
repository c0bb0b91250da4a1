"""Text tokenization / stemming / analysis functions.

Reference: ``text_to_stem_array`` (lantern_extras/src/stemmers.rs:96-146):
lowercase → map non-alphanumeric chars to space → split on whitespace →
snowball-stem each token → drop stopwords. The hardcoded stopword list is
reproduced verbatim (stemmers.rs:99-103).

The tokenize/stopword stages are pure Catalyst expressions (JVM-side).
Stemming is the one genuinely-Python stage: an Arrow-batched pandas UDF
with two engines, selected like the reference's ``engine`` parameter
(stemmer_api.sql:121-137):

- ``snowball`` (default): Porter2 / snowball "english" implemented from
  the published algorithm — the same algorithm rust-stemmers'
  ``Algorithm::English`` runs (stemmers.rs:76-77), so stems match the
  reference including its exception words (news, proceed, dying, ...).
- ``porter``: the original 1980 algorithm, kept for corpora indexed with
  classic Porter.

Known Porter-1980 vs snowball divergences (both pinned in
tests/test_text.py so either engine drifting is visible):

    word        porter          snowball (= reference)
    fairly      fairli          fair
    generously  gener           generous
    ties        ti              tie
    lying       ly              lie
    dying       dy              die
    proceed     proce           proceed
    news        new             news
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# lantern_extras/src/stemmers.rs:99-103, verbatim
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
    "into", "is", "it", "no", "not", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was", "will",
    "with",
]


# PostgreSQL's english stopword list (share/tsearch_data/english.stop) —
# what to_tsvector('english', ...) removes, checked against the RAW
# lowercase token BEFORE stemming (opposite order from the rust engine,
# which stems first then filters the short list above). Used by the
# 'tsvector' engine profile of text_to_stem_array
# (lantern_extras/src/stemmer_api.sql:33-50).
PG_ENGLISH_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all", "any",
    "both", "each", "few", "more", "most", "other", "some", "such", "no",
    "nor", "not", "only", "own", "same", "so", "than", "too", "very",
    "s", "t", "can", "will", "just", "don", "should", "now",
]


# user stopword management (set_user_stopwords / get_user_stopwords,
# lantern_extras/src/stemmers.rs:25-63) — a process-level override list
# that tokenize() callers pass explicitly; stored here so the whole
# pipeline (build + query side) reads one source of truth
_user_stopwords: list[str] | None = None


def set_user_stopwords(words: list[str] | None) -> None:
    global _user_stopwords
    _user_stopwords = sorted(set(words)) if words is not None else None


def get_user_stopwords() -> list[str]:
    return list(_user_stopwords) if _user_stopwords is not None else list(STOPWORDS)


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col, stopwords: list[str] | None = STOPWORDS, stem: bool | str = False) -> Column:
    """lowercase → strip non-alphanumerics → split → [stem] → drop stopwords.

    With ``stem=False`` the whole expression is JVM-side and mirrorable in a
    SQL oracle; ``stem=True`` adds the snowball (Porter2) pandas UDF — the
    reference's default engine — and ``stem="porter"`` the 1980 algorithm.
    """
    # \p{L}\p{N} == the reference's unicode is_alphanumeric (stemmers.rs:107);
    # supported identically by Java regex and DuckDB's RE2. Splitting on
    # the separator class DIRECTLY is token-identical to the former
    # regexp_replace(class, " ") + split(" ") two-pass form (runs of
    # separators collapse either way; boundary separators yield ""
    # elements that array_remove drops in both) and does one regex pass
    # instead of two, skipping a document-sized intermediate string per
    # row — measured 6.80 -> 3.27 s on the postings-build aggregate and
    # 1.12 -> 0.80 s on the raw projection over a 160k-doc corpus
    # (r14, interleaved pairs; bit-identity asserted over all of sf0.1).
    toks = F.array_remove(F.split(F.lower(_c(col)), r"[^\p{L}\p{N}]+"), "")
    if stem:
        toks = stem_array(toks, engine="snowball" if stem is True else stem)
    if stopwords:
        toks = F.filter(toks, lambda t: ~t.isin(*stopwords))
    return toks


def tokenize_py(text: str, stopwords: list[str] | None = STOPWORDS, stem: bool | str = False) -> list[str]:
    """Python twin of :func:`tokenize` for query strings (must stay in
    lockstep so query terms hit the same postings keys)."""
    # [\W_] ≈ [^\p{L}\p{N}] (python re lacks \p classes; \W is unicode-aware)
    toks = [t for t in re.sub(r"[\W_]+", " ", text.lower()).split() if t]
    if stem:
        toks = [stem_word(t, "snowball" if stem is True else stem) for t in toks]
    if stopwords:
        sw = set(stopwords)
        toks = [t for t in toks if t not in sw]
    return toks


def tokenize_tsvector(col) -> Column:
    """The reference's SECOND stemming engine: ``text_to_stem_array(...,
    engine => 'tsvector')`` == strip FTS operators → ``to_tsvector(
    'english', ...)`` → re-expand lexemes by position
    (lantern_extras/src/stemmer_api.sql:33-50, stemmers.rs:119-146).

    Postgres-FTS profile differences from :func:`tokenize`: the PG
    english stopword list (127 words vs the rust engine's 33) is filtered
    against the RAW lowercase token BEFORE stemming (to_tsvector checks
    the stop file pre-stem; the rust engine stems first), and numerics
    pass through unstemmed (snowball leaves them unchanged anyway).
    Tokenization approximates PG's default parser as alphanumeric runs:
    compound tokens (hyphenated words, emails, URLs — which the PG parser
    additionally emits whole) appear as their parts only. The FTS
    special-character strip (stemmer_api.sql:42) is subsumed: every
    stripped char is non-alphanumeric.
    """
    # one-pass separator-class split — token-identical to the former
    # replace+split (see tokenize); same change, same measurement
    toks = F.array_remove(F.split(F.lower(_c(col)), r"[^\p{L}\p{N}]+"), "")
    toks = F.filter(toks, lambda t: ~t.isin(*PG_ENGLISH_STOPWORDS))
    return stem_array(toks, engine="snowball")


def tokenize_tsvector_py(text: str) -> list[str]:
    """Python twin of :func:`tokenize_tsvector` for query strings."""
    toks = [t for t in re.sub(r"[\W_]+", " ", text.lower()).split() if t]
    sw = set(PG_ENGLISH_STOPWORDS)
    return [stem_word(t, "snowball") for t in toks if t not in sw]


def text_to_stem_array(col, engine: str = "rust") -> Column:
    """Unified two-engine stemming API (stemmers.rs:119-146): ``rust`` =
    snowball-stem then drop the short stopword list (the reference
    default); ``tsvector`` = the Postgres-FTS profile above."""
    if engine == "rust":
        return tokenize(_c(col), stopwords=get_user_stopwords(), stem=True)
    if engine == "tsvector":
        return tokenize_tsvector(col)
    raise ValueError(f"Invalid engine: {engine}")  # stemmers.rs:130 wording


# --------------------------------------------------------------- Porter

_V = "aeiou"


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _V:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _m(w: str) -> int:
    """Porter's measure: number of VC sequences."""
    m, i, n = 0, 0, len(w)
    while i < n and _cons(w, i):
        i += 1
    while i < n:
        while i < n and not _cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _cons(w, i) for i in range(len(w)))


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _cons(w, len(w) - 1)
        and not _cons(w, len(w) - 2)
        and _cons(w, len(w) - 3)
        and w[-1] not in "wxy"
    )


def porter_stem(w: str) -> str:
    """Porter stemming algorithm (Porter, 1980), steps 1a-5b."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif len(w) >= 2 and _cons(w, len(w) - 1) and w[-1] == w[-2] and w[-1] not in "lsz":
                w = w[:-1]
            elif _m(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]:
        if w.endswith(suf):
            if _m(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]:
        if w.endswith(suf):
            if _m(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _m(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _m(w[:-3]) > 1:
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        if _m(stem) > 1 or (_m(stem) == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if len(w) >= 2 and w[-1] == "l" and w[-2] == "l" and _m(w) > 1:
        w = w[:-1]
    return w


# ------------------------------------------- snowball English (Porter2)
# The reference's default engine is rust-stemmers' Algorithm::English —
# the snowball "english" stemmer (Porter2, public spec at
# snowballstem.org/algorithms/english/stemmer.html). Implemented from the
# published algorithm description; `porter_stem` above remains as the
# 1980-algorithm engine.

_SB_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_SB_LI_END = "cdeghkmnrt"
_SB_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_SB_EXCEPTIONS_1A = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}
_SB_STEP2 = [  # longest-first; (suffix, replacement)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("ogi", "og"), ("bli", "ble"), ("li", ""),
]
_SB_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]
_SB_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


def _sb_v(w: str, i: int) -> bool:
    return w[i] in "aeiouy"  # marked consonant-y is 'Y', excluded


def _sb_r1(w: str) -> int:
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            return len(pre)
    for i in range(1, len(w)):
        if not _sb_v(w, i) and _sb_v(w, i - 1):
            return i + 1
    return len(w)


def _sb_r2(w: str) -> int:
    r1 = _sb_r1(w)
    for i in range(r1 + 1, len(w)):
        if not _sb_v(w, i) and _sb_v(w, i - 1):
            return i + 1
    return len(w)


def _sb_in_r1(w: str, suf: str) -> bool:
    return len(w) - len(suf) >= _sb_r1(w)


def _sb_in_r2(w: str, suf: str) -> bool:
    return len(w) - len(suf) >= _sb_r2(w)


def _sb_ends_short(w: str) -> bool:
    n = len(w)
    if n == 2:
        return _sb_v(w, 0) and not _sb_v(w, 1)
    return (
        n >= 3
        and not _sb_v(w, n - 3)
        and _sb_v(w, n - 2)
        and not _sb_v(w, n - 1)
        and w[n - 1] not in "wxY"
    )


def _sb_is_short(w: str) -> bool:
    return _sb_ends_short(w) and _sb_r1(w) >= len(w)


def snowball_stem(w: str) -> str:
    """Snowball English stemmer (Porter2) from the published algorithm,
    matching the reference's rust-stemmers Algorithm::English engine
    (lantern_extras/src/stemmers.rs:76-77,96-118)."""
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    if w in _SB_EXCEPTIONS:
        return _SB_EXCEPTIONS[w]
    # mark consonant-y: initial y, or y after a vowel
    chars: list[str] = []
    for i, ch in enumerate(w):
        if ch == "y" and (i == 0 or chars[-1] in "aeiou"):
            chars.append("Y")
        else:
            chars.append(ch)
    w = "".join(chars)
    # step 0: strip apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and any(_sb_v(w, i) for i in range(len(w) - 2)):
        w = w[:-1]
    if w in _SB_EXCEPTIONS_1A:
        return w
    # step 1b (longest of eedly eed edly ed ingly ing)
    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if _sb_in_r1(w, suf):
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(_sb_v(stem, i) for i in range(len(stem))):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_SB_DOUBLES):
                        w = w[:-1]
                    elif _sb_is_short(w):
                        w += "e"
                break
    # step 1c: y/Y -> i after a non-vowel that isn't the first letter
    if len(w) > 2 and w[-1] in "yY" and not _sb_v(w, len(w) - 2):
        w = w[:-1] + "i"
    # step 2 (longest match, then R1 test; no fallback to shorter suffixes)
    for suf, rep in _SB_STEP2:
        if w.endswith(suf):
            if _sb_in_r1(w, suf):
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _SB_LI_END:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in _SB_STEP3:
        if w.endswith(suf):
            if _sb_in_r1(w, suf):
                if suf == "ative":
                    if _sb_in_r2(w, suf):
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in _SB_STEP4:
        if w.endswith(suf):
            if _sb_in_r2(w, suf):
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break
    # step 5
    if w.endswith("e"):
        if _sb_in_r2(w, "e") or (
            _sb_in_r1(w, "e") and not _sb_ends_short(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("ll") and _sb_in_r2(w, "l"):
        w = w[:-1]
    return w.replace("Y", "y")


_STEM_ENGINES = {"porter": porter_stem, "snowball": snowball_stem}


def stem_word(w: str, engine: str = "snowball") -> str:
    return _STEM_ENGINES[engine](w)


def _make_stem_udf(engine: str):
    fn = _STEM_ENGINES[engine]

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda toks: None if toks is None else [fn(t) for t in toks])

    return _udf


_STEM_UDFS: dict = {}


def stem_array(col, engine: str = "snowball") -> Column:
    """Stem every element of an array<string> column (Arrow-batched).
    ``engine``: 'snowball' (Porter2 — the reference default) or 'porter'."""
    if engine not in _STEM_UDFS:
        _STEM_UDFS[engine] = _make_stem_udf(engine)
    return _STEM_UDFS[engine](_c(col))


# ------------------------------------------------------- text analysis
# Training-data pipeline operators over a raw text column. All pure
# Catalyst expressions so a SQL oracle can mirror them exactly.

# tiny function-word profiles for the heuristic language id
LANG_PROFILES = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "dans", "que", "pour"],
}


def lang_id(col) -> Column:
    """Heuristic language id: argmax over per-language function-word hits
    (ties and zero-hit → 'und' for undetermined). Deterministic and
    SQL-mirrorable; a real n-gram model would slot in behind the same API.
    The token array is let-bound: one tokenize, N cheap filters."""

    def pick(toks) -> Column:
        best_lang, best_score = F.lit("und"), F.lit(0)
        for lang in sorted(LANG_PROFILES):
            words = LANG_PROFILES[lang]
            score = F.size(F.filter(toks, lambda t: t.isin(*words)))
            better = score > best_score
            best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(better, score).otherwise(best_score)
        return best_lang

    return expr_let(tokenize(col, stopwords=None), pick)


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(F.array_remove(F.split(_c(col), "\\s+"), ""))


def bpe_token_estimate(col) -> Column:
    """BPE-ish token-count estimate: word-piece pieces ≈ words + ceil of
    extra length beyond 4 chars per word (a cheap, deterministic proxy)."""
    toks = tokenize(col, stopwords=None)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.lit(1) + F.floor(F.length(t) / F.lit(4)).cast("bigint"),
    )


def quality_score(col) -> Column:
    """Composite [0,1] doc-quality heuristic: penalizes very short docs,
    high non-alnum ratio, and low stopword ratio (word-salad indicator).
    Token array let-bound (one tokenize feeds all three ratios)."""
    txt = _c(col)

    def score(toks) -> Column:
        n_chars = F.length(txt)
        alnum = F.length(F.regexp_replace(txt, "[^a-zA-Z0-9 ]", ""))
        n_toks = F.size(toks)
        sw_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        len_score = F.least(n_toks.cast("double") / F.lit(20.0), F.lit(1.0))
        alnum_ratio = alnum.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
        sw_ratio = F.least(
            sw_hits.cast("double") * F.lit(5.0) / F.greatest(n_toks, F.lit(1)).cast("double"),
            F.lit(1.0),
        )
        return (len_score + alnum_ratio + sw_ratio) / F.lit(3.0)

    return expr_let(tokenize(col, stopwords=None), score)


FP_MOD = 1_000_000_007
FP_BASE = 31


def doc_fingerprint(col) -> Column:
    """Order-sensitive rolling-hash fingerprint of the token stream:
    fold(h = (h*31 + token_hash) mod 1e9+7). token_hash is derived from
    md5 so it is reproducible in any engine (unlike Spark's murmur hash)."""
    toks = tokenize(col, stopwords=None)
    tok_h = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * F.lit(FP_BASE) + tok_h(t)) % F.lit(FP_MOD),
    )


def _ws_tokens(col) -> Column:
    """Whitespace token array (token_count's base, kept as an array)."""
    return F.array_remove(F.split(_c(col), "\\s+"), "")


def expr_let(expr: Column, body) -> Column:
    """Bind ``expr`` ONCE, then reference it freely inside ``body``.

    PLAN-SHAPE RULE (measured 20x on the repetition signals at sf0.1): a
    lambda body that references a non-trivial expression re-evaluates it
    on EVERY element access — higher-order functions are interpreted, so
    an inlined tokenize/ngram sub-expression turns O(len) work into
    O(len²) re-parsing. ``transform(array(e), x -> body(x))[1]`` is a
    let-binding: ``e`` evaluates once as the array element and every
    later reference is a cheap bound-variable read. Same trick
    operators/dedup.py applies via projected columns (_grams_over's
    rule); this form works where no projection boundary is available —
    inside a single Column-valued function."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def _ngrams_of(tk, n: int) -> Column:
    """n-grams over an already-CHEAP token array reference (lambda var or
    plain column — see expr_let). [] when fewer than ``n`` tokens."""
    total = F.size(tk)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(total - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[tk[i + j] for j in range(n)]),
    )
    empty = F.array().cast("array<string>")
    # sequence(1, k) is DESCENDING for k < 1 — guard, don't trust it
    return F.when(total >= n, grams).otherwise(empty)


def word_ngrams(col, n: int = 2) -> Column:
    """Whitespace-word n-grams as space-joined strings, [] when the text
    has fewer than ``n`` words. Pure column expression — no explode, and
    the token array is let-bound so grams cost O(len), not O(len²)."""
    return expr_let(_ws_tokens(col), lambda tk: _ngrams_of(tk, n))


def dup_ngram_fraction(col, n: int = 1) -> Column:
    """Fraction of word n-grams that are repeats of an earlier one:
    ``1 - distinct/total`` (0.0 for empty). The Gopher/C4 repetition
    signal; n=1 is the duplicate-word fraction."""

    def frac(gs) -> Column:
        t = F.size(gs)
        dups = (t - F.size(F.array_distinct(gs))).cast("double")
        return F.when(t > 0, dups / t).otherwise(F.lit(0.0))

    if n == 1:
        return expr_let(_ws_tokens(col), frac)
    return expr_let(
        _ws_tokens(col), lambda tk: expr_let(_ngrams_of(tk, n), frac)
    )


def top_ngram_fraction(col, n: int = 2) -> Column:
    """Fraction of the text's n-grams taken by the single most frequent
    one — high values flag boilerplate/templated text. O(distinct·total)
    element comparisons per row (bound variables, not re-evaluations),
    bounded by document length, zero shuffles."""

    def frac(gs) -> Column:
        t = F.size(gs)
        counts = F.transform(
            F.array_distinct(gs),
            lambda g: F.size(F.filter(gs, lambda x: x == g)),
        )
        return F.when(
            t > 0, F.array_max(counts).cast("double") / t
        ).otherwise(F.lit(0.0))

    if n == 1:
        return expr_let(_ws_tokens(col), frac)
    return expr_let(
        _ws_tokens(col), lambda tk: expr_let(_ngrams_of(tk, n), frac)
    )


def repetition_signals(col) -> list[Column]:
    """The standard intra-doc repetition panel (aliased, ready for
    ``select``): duplicate-word, duplicate-bigram, top-bigram fractions."""
    return [
        dup_ngram_fraction(col, 1).alias("dup_word_frac"),
        dup_ngram_fraction(col, 2).alias("dup_bigram_frac"),
        top_ngram_fraction(col, 2).alias("top_bigram_frac"),
    ]


def compression_ratio(col) -> Column:
    """zlib-compressed size / raw size of the UTF-8 text — the Gopher
    compressibility signal: templated/repetitive documents compress far
    below natural prose (~0.4-0.6 for English; near-duplicate boilerplate
    dips under 0.2), while encrypted/binary junk sits near 1.0.

    This is the ONE quality signal that genuinely needs Python (no
    codegen'd DEFLATE), so it is an Arrow-batched pandas UDF — zlib
    itself is C, the per-row Python is a method call. Deterministic for
    a fixed zlib (level 6, default strategy); pair it with the pure-
    column signals in operators/classifier.py text_quality_features when
    a corpus needs the extra discriminator."""
    import zlib

    @F.pandas_udf("double")
    def _cr(s: pd.Series) -> pd.Series:
        def ratio(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return s.map(ratio)

    return _cr(_c(col))
