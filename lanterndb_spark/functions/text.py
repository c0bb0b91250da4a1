"""Text tokenization / stemming / analysis functions.

Reference: ``text_to_stem_array`` (lantern_extras/src/stemmers.rs:96-146):
lowercase → map non-alphanumeric chars to space → split on whitespace →
snowball-stem each token → drop stopwords. The hardcoded stopword list is
reproduced verbatim (stemmers.rs:99-103).

The tokenize/stopword stages are pure Catalyst expressions (JVM-side).
Stemming is the one genuinely-Python stage: an Arrow-batched pandas UDF
running a self-contained Porter stemmer (public-domain algorithm, Porter
1980) — close kin of the reference's snowball English stemmer and matching
it on the reference's own golden pairs ('lazy'→'lazi', 'jumps'→'jump',
stemmers.rs:148-166, all pinned in tests/test_text.py).

Known Porter-1980 vs snowball-English (Porter2) divergences — words where
this stemmer differs from the reference's rust-stemmers output (pinned in
test_porter_snowball_divergences so any drift is visible):

    word        porter (ours)   snowball (reference)
    fairly      fairli          fair
    generously  gener           generous
    ties        ti              tie
    lying       ly              lie
    dying       dy              die
    proceed     proce           proceed
    exceed      exce            succeed-family kept whole
    news        new             news  (Porter2 exception list)

Both sides are internally consistent (same stem for query and document),
so BM25 retrieval quality is equivalent; only the literal stem strings
differ. Porting the full snowball exception tables was judged not worth
the parity delta — the divergence is documented instead.
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


def tokenize(col, stopwords: list[str] | None = STOPWORDS, stem: bool = False) -> Column:
    """lowercase → strip non-alphanumerics → split → [stem] → drop stopwords.

    With ``stem=False`` the whole expression is JVM-side and mirrorable in a
    SQL oracle; ``stem=True`` adds the Porter pandas UDF.
    """
    # \p{L}\p{N} == the reference's unicode is_alphanumeric (stemmers.rs:107);
    # supported identically by Java regex and DuckDB's RE2
    toks = F.array_remove(
        F.split(F.regexp_replace(F.lower(_c(col)), r"[^\p{L}\p{N}]+", " "), " "), ""
    )
    if stem:
        toks = stem_array(toks)
    if stopwords:
        toks = F.filter(toks, lambda t: ~t.isin(*stopwords))
    return toks


def tokenize_py(text: str, stopwords: list[str] | None = STOPWORDS, stem: bool = False) -> list[str]:
    """Python twin of :func:`tokenize` for query strings (must stay in
    lockstep so query terms hit the same postings keys)."""
    # [\W_] ≈ [^\p{L}\p{N}] (python re lacks \p classes; \W is unicode-aware)
    toks = [t for t in re.sub(r"[\W_]+", " ", text.lower()).split() if t]
    if stem:
        toks = [porter_stem(t) for t in toks]
    if stopwords:
        sw = set(stopwords)
        toks = [t for t in toks if t not in sw]
    return toks


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


@F.pandas_udf(ArrayType(StringType()))
def _stem_array_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda toks: None if toks is None else [porter_stem(t) for t in toks])


def stem_array(col) -> Column:
    """Porter-stem every element of an array<string> column (Arrow-batched)."""
    return _stem_array_udf(_c(col))


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
    SQL-mirrorable; a real n-gram model would slot in behind the same API."""
    toks = tokenize(col, stopwords=None)
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang in sorted(LANG_PROFILES):
        words = LANG_PROFILES[lang]
        score = F.size(F.filter(toks, lambda t: t.isin(*words)))
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


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
    high non-alnum ratio, and low stopword ratio (word-salad indicator)."""
    txt = _c(col)
    n_chars = F.length(txt)
    alnum = F.length(F.regexp_replace(txt, "[^a-zA-Z0-9 ]", ""))
    toks = tokenize(col, stopwords=None)
    n_toks = F.size(toks)
    sw_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    len_score = F.least(n_toks.cast("double") / F.lit(20.0), F.lit(1.0))
    alnum_ratio = alnum.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    sw_ratio = F.least(
        sw_hits.cast("double") * F.lit(5.0) / F.greatest(n_toks, F.lit(1)).cast("double"),
        F.lit(1.0),
    )
    return (len_score + alnum_ratio + sw_ratio) / F.lit(3.0)


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
