"""Text-analysis column functions — language ID, quality scoring, token
counting, fingerprinting. Pure ``Column`` expressions (JVM-side,
whole-stage codegen); each has a direct ANSI-SQL oracle equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword lists (n-gram heuristic language ID)
EN_STOPWORDS = [
    "the", "and", "of", "to", "in", "is", "for", "that", "with", "are",
    "was", "this", "from", "has", "have", "its", "their", "which",
]
MS_STOPWORDS = [
    "yang", "dan", "di", "untuk", "dengan", "ini", "itu", "pada", "adalah",
    "dari", "ke", "dalam", "tidak", "akan", "juga", "telah",
]


def col_let(bound: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``bound`` ONCE per
    row and pass it to ``body`` as a lambda variable.

    Why this exists: Spark's higher-order functions (``transform``/
    ``filter``/``aggregate``) are CodegenFallback — their lambdas are
    INTERPRETED, with no common-subexpression elimination, so a lambda
    that captures a non-trivial subtree (e.g. ``F.slice(col_tokens(c),
    i, n)`` — the tokenizer inside an n-gram loop) re-evaluates that
    whole subtree for EVERY element: O(len) grams become O(len²)
    regex work per row. Measured on 20 docs × 1500 punctuation-heavy
    tokens: 104s inlined vs 3s let-bound vs 0.4s via a separate
    projection. Binding the subtree to a lambda variable makes every
    reference a cheap variable lookup while keeping the Column-in /
    Column-out composability (a projection split can be undone by
    CollapseProject; this cannot).

    Implemented as ``element_at(transform(array(bound), body), 1)`` —
    a single-element transform whose lambda variable IS the binding.
    NULL ``bound`` flows through as a NULL lambda value, same as the
    unbound expression."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def col_tokens(c: Column) -> Column:
    """Whitespace+punct tokenization to lowercase word array."""
    return F.filter(
        F.split(F.lower(F.regexp_replace(c, r"[^A-Za-z0-9']+", " ")), " "),
        lambda t: t != "",
    )


def col_token_count(c: Column) -> Column:
    return F.size(col_tokens(c))


def col_bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish budget estimate: words + digit-groups + punctuation runs
    (mirrors the fallback tokenizer's classes, tokenizer.py)."""
    words = F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+(?:'[a-z]+)?"), 0))
    nums = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]{1,3}"), 0))
    puncts = F.size(F.regexp_extract_all(c, F.lit(r"[^\sA-Za-z0-9]"), 0))
    return words + nums + puncts


def col_stopword_hits(c: Column, stopwords: list[str]) -> Column:
    return F.size(F.array_intersect(
        F.array_distinct(col_tokens(c)),
        F.array(*[F.lit(w) for w in stopwords]),
    ))


def col_lang_id(c: Column) -> Column:
    """en/ms/unknown by distinct-stopword hits."""
    en = col_stopword_hits(c, EN_STOPWORDS)
    ms = col_stopword_hits(c, MS_STOPWORDS)
    return (
        F.when((en >= ms) & (en > 0), F.lit("en"))
        .when(ms > en, F.lit("ms"))
        .otherwise(F.lit("unknown"))
    )


def col_punct_ratio(c: Column) -> Column:
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def col_upper_ratio(c: Column) -> Column:
    n = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    u = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    return F.when(n > 0, u / n).otherwise(F.lit(0.0))


def col_mean_word_len(c: Column) -> Column:
    toks = col_tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def col_quality_score(c: Column) -> Column:
    """[0,1] heuristic quality: length band + stopword presence + sane
    punctuation + sane word length. Deterministic, SQL-expressible."""
    n_tok = col_token_count(c)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
    sw = col_stopword_hits(c, EN_STOPWORDS) + col_stopword_hits(c, MS_STOPWORDS)
    sw_ok = F.when(sw >= 2, F.lit(0.25)).otherwise(F.lit(0.0))
    punct = col_punct_ratio(c)
    punct_ok = F.when(punct <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    mwl = col_mean_word_len(c)
    mwl_ok = F.when((mwl >= 3.0) & (mwl <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
    return len_ok + sw_ok + punct_ok + mwl_ok


def col_lines(c: Column) -> Column:
    """Non-empty trimmed lines of the text."""
    return F.filter(
        F.transform(F.split(c, "\n"), lambda line: F.trim(line)),
        lambda line: line != "",
    )


def col_dup_line_fraction(c: Column) -> Column:
    """Fraction of non-empty lines that repeat an earlier line — the
    Gopher/C4 boilerplate-repetition rule (nav bars, cookie banners,
    templated footers repeat lines; prose doesn't). 0.0 for empty
    docs."""
    lines = col_lines(c)
    n = F.size(lines)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(lines))) / n
    ).otherwise(F.lit(0.0))


def col_dup_ngram_fraction(c: Column, n: int = 3) -> Column:
    """Fraction of the document's word n-grams that repeat an earlier
    occurrence (the Gopher duplicate-n-gram family: high values mean
    looping/templated text that dedup can't see because the DOCUMENT is
    unique). Pure Column expressions — the sequence is clamped with
    greatest() so short docs build a dummy gram list and the outer
    CASE returns 0.0 for them. The token array and the gram array are
    let-bound (``col_let``) so the interpreted n-gram lambda slices a
    materialized array instead of re-tokenizing per element."""
    def with_toks(toks):
        count = F.size(toks) - (n - 1)
        idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
        grams_e = F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, n), " "))

        def with_grams(grams):
            g = F.size(grams)
            return F.when(
                F.size(toks) >= n,
                (g - F.size(F.array_distinct(grams))) / g,
            ).otherwise(F.lit(0.0))

        return col_let(grams_e, with_grams)

    return col_let(col_tokens(c), with_toks)


def col_top_ngram(c: Column, n: int = 2) -> Column:
    """struct(best, bestg, total) for the MOST FREQUENT word n-gram of
    the text — its occurrence count, the gram itself (count ties break
    to the lexicographically smallest gram), and the character length
    of the space-joined token stream. The numerator/denominator of the
    Gopher top-n-gram repetition rule (Rae et al. 2021 §A1.1 — public):
    best·len(bestg)/total is the fraction of characters claimed by the
    single most repeated n-gram, the signal that catches looping/
    templated text duplicate-GRAM fractions dilute (one phrase repeated
    50 times in long prose).

    Pure per-row Column expressions — the grams are sorted once and a
    single linear ``aggregate`` scan tracks the longest run
    (O(G log G) per document, no explode, no shuffle, whole-stage
    codegen keeps it JVM-side). Because the scan updates only on a
    STRICTLY longer run and the array is sorted ascending, count ties
    resolve to the smallest gram with no extra bookkeeping. Only
    meaningful when the document has >= n tokens — callers guard (the
    clamp builds a dummy gram list for shorter docs). Tokens are
    let-bound (``col_let``) so the gram lambda slices a materialized
    array instead of re-tokenizing per element."""
    def with_toks(toks):
        count = F.size(toks) - (n - 1)
        idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
        grams = F.array_sort(F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, n), " ")))
        init = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                        F.lit(0).alias("best"), F.lit("").alias("bestg"))

        def step(acc, g):
            run = F.when(g == acc["prev"],
                         acc["run"] + 1).otherwise(F.lit(1))
            better = run > acc["best"]
            return F.struct(
                g.alias("prev"), run.alias("run"),
                F.when(better, run).otherwise(acc["best"]).alias("best"),
                F.when(better, g).otherwise(acc["bestg"]).alias("bestg"))

        fin = F.aggregate(grams, init, step)
        return F.struct(
            fin["best"].alias("best"), fin["bestg"].alias("bestg"),
            F.length(F.array_join(toks, " ")).alias("total"))

    return col_let(col_tokens(c), with_toks)


def col_fingerprint(c: Column) -> Column:
    """Normalized-content fingerprint: sha256 of the sorted distinct token
    array — robust to reordering/whitespace; SQL-expressible."""
    return F.sha2(F.array_join(F.array_sort(F.array_distinct(col_tokens(c))), " "), 256)


def col_rolling_fingerprints(c: Column, k: int = 8, keep: int = 4) -> Column:
    """Winnowing-style selection: the ``keep`` smallest crc32 values over
    the k-gram windows of the normalized text (order-insensitive digest
    for near-dup screening). The normalized string is let-bound
    (``col_let``) so the window lambda substrings a materialized value
    instead of re-tokenizing per position."""
    def with_norm(norm):
        n = F.length(norm)
        idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
        grams = F.transform(
            idx, lambda i: F.crc32(F.substring(norm, i, k).cast("binary")))
        return F.slice(F.array_sort(grams), 1, keep)

    return col_let(F.array_join(col_tokens(c), " "), with_norm)


def col_normalize_url(c: Column) -> Column:
    """Canonical URL for url-level dedup (the Common-Crawl staple):
    lowercase scheme+host, strip the fragment, drop utm_*/fbclid/gclid
    tracking params (and a dangling '?'/'&'), strip default ports and a
    trailing slash on a bare path. Pure regex, so the DuckDB oracle can
    run the identical transformation."""
    u = F.trim(c)
    # fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # all query cleanup is scoped to the query part — '&' is a legal path
    # character (RFC 3986 sub-delims), so '&&' or '&utm_x=1' inside a
    # PATH must survive untouched
    head = F.regexp_extract(u, r"^([^?]*)", 1)
    q = F.regexp_replace(u, r"^[^?]*", "")  # '?...' or ''
    q = F.regexp_replace(q, r"([?&])(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", "$1")
    q = F.regexp_replace(q, r"&&+", "&")   # collapse runs first, then the
    q = F.regexp_replace(q, r"\?&", "?")   # stranded '?&' left at the head
    q = F.regexp_replace(q, r"[?&]+$", "")
    u = F.concat(head, q)
    # lowercase scheme://host (leave path/query case alone)
    scheme_host = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.when(scheme_host == "", u).otherwise(F.concat(scheme_host, rest))
    # default ports (lookahead-free so the RE2-based DuckDB oracle can run
    # the identical pattern; an unmatched trailing group substitutes "")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    # trailing slash on a bare path (no query)
    u = F.regexp_replace(u, r"^([^?]*[^/?])/$", "$1")
    return u


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene)
# ---------------------------------------------------------------------------
# Patterns restricted to syntax with IDENTICAL semantics in Java regex
# (Spark) and RE2 (DuckDB/Go tooling): no lookaround, no backrefs,
# ASCII \d / \b only — so a plain-SQL oracle reproduces the scrub
# byte-for-byte and the same config ships to any engine.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "[EMAIL]"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IPV4]"),
    # conservative: 9-16 chars of digits/space/hyphen with an optional
    # leading +, anchored on digits at both ends — long enough to skip
    # years/quantities, loose enough for international formats
    "phone": (r"\+?\d[\d\- ]{7,14}\d", "[PHONE]"),
}
_PII_ORDER = ["email", "ipv4", "phone"]


def col_pii_count(c: Column, kind: str) -> Column:
    """Occurrences of one PII kind in the raw text."""
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind][0]), 0))


def col_redact_pii(c: Column, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its bracket token — the scrub pass
    every published web-text pipeline runs before training (emails,
    IPs, phone numbers must not be memorized). Kinds apply in the
    fixed order email -> ipv4 -> phone so overlapping matches resolve
    identically everywhere; earlier replacements leave no digits, so
    later patterns can't re-match inside a token."""
    out = c
    for k in (kinds or _PII_ORDER):
        if k not in PII_PATTERNS:
            raise ValueError(
                f"unknown PII kind {k!r} (have {list(PII_PATTERNS)})")
        pat, repl = PII_PATTERNS[k]
        out = F.regexp_replace(out, pat, repl.replace("$", r"\$"))
    return out


# ---------------------------------------------------------------------------
# URL host / registered-domain extraction (domain-level hygiene)
# ---------------------------------------------------------------------------
# A conservative two-level public-suffix subset: enough that the common
# country-code registries group correctly (bbc.co.uk and news.bbc.co.uk
# are ONE registrant; bbc.co.uk and itv.co.uk are TWO). A full Public
# Suffix List is a config swap — the grouping logic below only consults
# this frozen set, and the set itself is replayed verbatim into the SQL
# oracle, so widening it cannot drift the two engines apart.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "com.tr", "com.ar", "com.sg", "co.za",
)


def col_url_host(c: Column) -> Column:
    """Lowercased host of an absolute URL, with userinfo and port
    stripped — the same authority conventions as the CLI's mixture
    report (scheme case-insensitive, authority stops at ``/?#`` so
    query/fragment text can never leak into the host, credentials never
    surface). URLs without a ``scheme://`` authority yield NULL (a
    relative reference has no host to aggregate by)."""
    host = F.lower(F.regexp_replace(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
        r"^[^/?#]*@", ""))
    host = F.regexp_replace(host, r":[0-9]*$", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def col_registered_domain(c: Column) -> Column:
    """Registered domain of a HOST column (the unit a crawler's
    politeness, spam and per-site caps operate on): the last two
    labels, or the last three when the two-label tail is a known
    two-level public suffix (``TWO_LEVEL_SUFFIXES``); IPv4 literals
    and dot-less hosts group as themselves. Pure regex + CASE, so the
    DuckDB oracle replays it byte-for-byte."""
    last2 = F.regexp_extract(c, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(c, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    is_suffix2 = last2.isin(*TWO_LEVEL_SUFFIXES)
    dom = (F.when(c.rlike(r"^[0-9.]+$"), c)
           .when(last2 == "", c)
           .when(is_suffix2 & (last3 != ""), last3)
           .otherwise(last2))
    return dom
