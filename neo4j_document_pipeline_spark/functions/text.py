"""Core text-normalization functions.

Each function exists in TWO forms:

1. ``py_*`` — plain-Python reference implementation (semantics match the
   reference pipeline; used inside Arrow-batched pandas UDFs and to freeze
   golden fixtures). Byte-identical with the reference behavior:
   - canonicalize: /root/reference/ingestMD.py:61-66
   - safe_label:   /root/reference/ingestMD.py:57-59
   - sha256_hex:   /root/reference/ingestMD.py:68-69
   - norm_space:   /root/reference/ingestMD.py:161-162
   - normalize_name_for_key: /root/reference/graphutil.py:636-651

2. ``col_*`` — Spark ``Column`` expression (JVM-side, whole-stage codegen,
   no Python in the hot path). Used wherever byte-identity is provable via
   tests; the pandas-UDF path exists as the certainty fallback.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Plain-Python reference implementations
# ---------------------------------------------------------------------------

_SAFE_RE = re.compile(r"[^A-Za-z0-9_]")
_TRAIL_WS_RE = re.compile(r"[ \t]+$", flags=re.MULTILINE)
_MULTI_NL_RE = re.compile(r"\n{3,}")
_MULTI_SP_RE = re.compile(r"[ \t]{2,}")
_WS_RUN_RE = re.compile(r"\s+")
_NAME_KEY_RE = re.compile(r"[^a-z0-9 ]+")

NUM_WORDS = {
    "one": "1", "two": "2", "three": "3", "four": "4", "five": "5",
    "six": "6", "seven": "7", "eight": "8", "nine": "9", "ten": "10",
}  # graphutil.py:635-638


def py_canonicalize(text: str | None) -> str:
    """CRLF->LF; collapse >=3 newlines to 2; strip trailing ws per line;
    collapse >=2 spaces/tabs to one space; strip ends.
    Byte-identical invariant vs ingestMD.py:61-66."""
    t = (text or "").replace("\r\n", "\n").replace("\r", "\n")
    t = _MULTI_NL_RE.sub("\n\n", t)
    t = _TRAIL_WS_RE.sub("", t)
    t = _MULTI_SP_RE.sub(" ", t)
    return t.strip()


@lru_cache(maxsize=65536)
def py_safe_label(x: str | None, fallback: str = "Entity") -> str:
    """Strip, spaces->_, non-word->_, truncate to 64 (ingestMD.py:57-59).
    Pure function of its args — memoized (entity labels/predicates repeat
    heavily in the extraction hot path)."""
    x = (x or fallback).strip().replace(" ", "_")
    return _SAFE_RE.sub("_", x)[:64]


def py_sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


@lru_cache(maxsize=65536)
def py_norm_space(s: str | None) -> str:
    """Pure; memoized — called per captured noun phrase in the extraction
    hot path, and entity names draw from a repeating population."""
    return _WS_RUN_RE.sub(" ", (s or "").strip())


def py_normalize_name_for_key(name: str | None) -> str:
    """lowercase; strip punctuation; number-words one..ten -> digits;
    collapse spaces (graphutil.py:640-651)."""
    s = (name or "").lower()
    s = _NAME_KEY_RE.sub(" ", s)
    return " ".join(NUM_WORDS.get(tok, tok) for tok in s.split())


def py_entity_id(label: str, name: str) -> str:
    """Deterministic surrogate for the Neo4j (label, name) MERGE key
    (ingestMD.py:505,509)."""
    return py_sha256_hex(f"{label}:{name}")


# ---------------------------------------------------------------------------
# Spark Column expressions (JVM-side fast path)
# ---------------------------------------------------------------------------

def col_canonicalize(c: Column) -> Column:
    """Column-expression equivalent of py_canonicalize (tested byte-equal)."""
    t = F.coalesce(c, F.lit(""))
    t = F.regexp_replace(t, r"\r\n", "\n")
    t = F.regexp_replace(t, r"\r", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    t = F.regexp_replace(t, r"(?m)[ \t]+$", "")
    t = F.regexp_replace(t, r"[ \t]{2,}", " ")
    # python str.strip() removes all leading/trailing UNICODE whitespace
    # (incl \n, NBSP); (?U) switches Java \s to the Unicode definition
    t = F.regexp_replace(t, r"(?U)^\s+|\s+$", "")
    return t


def col_safe_label(c: Column, fallback: str = "Entity") -> Column:
    x = F.coalesce(F.nullif(c, F.lit("")), F.lit(fallback))
    # python .strip() removes all (unicode) whitespace kinds, not just spaces
    x = F.regexp_replace(x, r"(?U)^\s+|\s+$", "")
    x = F.regexp_replace(x, " ", "_")
    x = F.regexp_replace(x, r"[^A-Za-z0-9_]", "_")
    return F.substring(x, 1, 64)


def col_norm_space(c: Column) -> Column:
    # python: re.sub(r"\s+", " ", s.strip()) — strip first (unicode), then
    # collapse; python \s is unicode-aware on str, hence (?U)
    stripped = F.regexp_replace(F.coalesce(c, F.lit("")), r"(?U)^\s+|\s+$", "")
    return F.regexp_replace(stripped, r"(?U)\s+", " ")


def col_normalize_name_for_key(c: Column) -> Column:
    s = F.lower(F.coalesce(c, F.lit("")))
    s = F.regexp_replace(s, r"[^a-z0-9 ]+", " ")
    toks = F.split(F.trim(F.regexp_replace(s, r" +", " ")), " ")
    mapped = F.transform(
        toks,
        lambda t: F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(v) for kv in NUM_WORDS.items() for v in kv]), t
            ),
            t,
        ),
    )
    out = F.array_join(mapped, " ")
    # empty input -> split produces [""] -> join gives ""
    return F.when(F.trim(s) == "", F.lit("")).otherwise(out)


def normalize_name_for_key_sql(col_sql: str) -> str:
    """SQL-string twin of col_normalize_name_for_key, for read-path
    callers that build plans per request: the Column-DSL version costs
    ~40 py4j round trips to construct (NUM_WORDS map literals + lambda
    plumbing), the string parses in one. Same expression tree, same
    result — parity-tested against the DSL version."""
    num_map = ", ".join(f"'{k}', '{v}'" for k, v in NUM_WORDS.items())
    s = f"lower(coalesce({col_sql}, ''))"
    cleaned = f"regexp_replace({s}, '[^a-z0-9 ]+', ' ')"
    toks = f"split(trim(regexp_replace({cleaned}, ' +', ' ')), ' ')"
    mapped = (f"transform({toks}, t -> "
              f"coalesce(element_at(map({num_map}), t), t))")
    return (f"CASE WHEN trim({cleaned}) = '' THEN '' "
            f"ELSE array_join({mapped}, ' ') END")


def col_entity_id(label: Column, name: Column) -> Column:
    return F.sha2(F.concat_ws(":", label, name), 256)


# ---------------------------------------------------------------------------
# pandas helpers (for use inside mapInPandas stages)
# ---------------------------------------------------------------------------

def pd_canonicalize(s: pd.Series) -> pd.Series:
    return s.map(py_canonicalize)


def pd_sha256(s: pd.Series) -> pd.Series:
    return s.map(py_sha256_hex)


# ---------------------------------------------------------------------------
# HTML -> text extraction (north-star item 1: Common-Crawl pages carry
# html:binary; extracted text must be byte-identical per url to the
# reference extractor — which IS this plain-Python function, used
# unchanged inside the pandas UDF, SURVEY.md §7.3 mitigation #1)
# ---------------------------------------------------------------------------

from html.parser import HTMLParser as _HTMLParser  # noqa: E402

_HTML_SKIP_TAGS = {"script", "style", "head", "noscript", "template"}
_HTML_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "section", "article", "header", "footer",
    "blockquote", "pre",
}


class _TextExtractor(_HTMLParser):
    """Segment-per-block extraction: text inside script/style/head is
    dropped, <br> emits a newline, each closed block element ends a
    segment (kept even when empty), segments join with a blank line.
    For well-formed flat markup (<p>seg</p> per paragraph) this is the
    exact inverse of wrapping \\n\\n-split paragraphs in <p> tags."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.segments: list[str] = []
        self._cur: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _HTML_SKIP_TAGS:
            self._skip += 1
        elif tag == "br":
            self._cur.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            self._cur.append("\n")

    def handle_endtag(self, tag):
        if tag in _HTML_SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _HTML_BLOCK_TAGS:
            self.segments.append("".join(self._cur))
            self._cur = []

    def handle_data(self, data):
        if not self._skip:
            self._cur.append(data)

    def result(self) -> str:
        segs = list(self.segments)
        tail = "".join(self._cur)
        if tail:
            segs.append(tail)
        return "\n\n".join(segs)


def py_html_to_text(html: bytes | str | None) -> str:
    """Deterministic stdlib-only HTML -> text (no external parser deps).
    bytes are decoded utf-8 with replacement; entity references are
    unescaped; block structure maps to blank-line paragraph breaks."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = str(html)
    p = _TextExtractor()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        # HTMLParser is tolerant; this is a belt for pathological input —
        # fall back to whatever was collected
        pass
    return p.result()


def pd_html_to_text(s: pd.Series) -> pd.Series:
    return s.map(py_html_to_text)
