"""Deterministic triple extraction (the frozen ruleset).

The reference's primary extractor is an Azure chat LLM
(/root/reference/ingestMD.py:123-156) with a deterministic markdown-table
fallback (/root/reference/ingestMD.py:177-216). For a reproducible pipeline
we replace the LLM with a FROZEN rule-based extractor whose plain-Python run
over the fixture docs IS the golden reference (SURVEY.md §0.1); the
markdown-table extractor is re-expressed with identical semantics.

Per-chunk flow mirrors ingestMD.py:744-779: run the primary extractor; only
when it yields nothing, fall back to table extraction.

Output triples are dicts ``{subject, predicate, object, subject_type,
object_type}`` where ``object`` may be a string, a timeline dict
``{start, end}`` or a distribution dict ``{pillar: {term: count}}`` —
exactly the shapes store_in_neo4j dispatches on (ingestMD.py:310-315).
``flatten_triples`` then applies the dispatch (ingestMD.py:354-495) to
produce flat ``triples_raw`` rows.
"""

from __future__ import annotations

import json
import re
from functools import lru_cache
from typing import Any

from neo4j_document_pipeline_spark.functions.text import (
    py_norm_space,
    py_safe_label,
)

# ---------------------------------------------------------------------------
# Markdown-table extractor — same semantics as ingestMD.py:161-216
# ---------------------------------------------------------------------------

_TABLE_SEP_RE = re.compile(r"^\s*\|?(?:\s*:?-+:?\s*\|)+\s*$")


def _is_table_sep(line: str) -> bool:
    return bool(_TABLE_SEP_RE.match(line))


def _split_cells(line: str) -> list[str]:
    line = line.strip()
    if line.startswith("|"):
        line = line[1:]
    if line.endswith("|"):
        line = line[:-1]
    return [c.strip() for c in line.split("|")]


def extract_triples_from_markdown_tables(text: str) -> list[dict[str, Any]]:
    """First column = subject; other columns -> (header[j], row[j]) pairs;
    subject_type='Entity', object_type='Value' (ingestMD.py:177-216).

    Rows are consumed until a blank cell-0 / short row / '>'-prefixed line;
    a short or blank-subject row TERMINATES the table (the reference breaks,
    not continues)."""
    lines = text.splitlines()
    triples: list[dict[str, Any]] = []
    i = 0
    n = len(lines)
    while i < n:
        if "|" in lines[i] and i + 1 < n and _is_table_sep(lines[i + 1]):
            headers = [py_norm_space(h) for h in _split_cells(lines[i])]
            k = i + 2
            while k < n and "|" in lines[k] and not lines[k].strip().startswith(">"):
                row = _split_cells(lines[k])
                if len(row) < 2 or not row[0].strip():
                    break
                subj = py_norm_space(row[0])
                for col in range(1, min(len(row), len(headers))):
                    pred = py_norm_space(headers[col])
                    obj = py_norm_space(row[col])
                    if pred and obj:
                        triples.append({
                            "subject": subj,
                            "predicate": pred,
                            "object": obj,
                            "subject_type": "Entity",
                            "object_type": "Value",
                        })
                k += 1
            i = k
            continue
        i += 1
    return triples


# ---------------------------------------------------------------------------
# Frozen rule-based SVO extractor (deterministic stand-in for the LLM)
# ---------------------------------------------------------------------------

# Noun-phrase: a capitalized token optionally chained through connectors or
# further capitalized/numeric tokens ("House of Wisdom", "Al-Khwarizmi",
# "Digital Economy Blueprint 2030").
_NP = (
    r"(?:(?:al|ibn|el)-)?[A-Z][\w'’-]*"
    r"(?:(?:\s+(?:of|the|for|and|de|al|ibn|bin|el))*\s+[A-Z0-9][\w'’-]*)*"
)

# type inference from the trailing token of a noun phrase; falls back to
# the ontology default 'Entity' (prompt ontology, ingestMD.py:126-129)
_TYPE_SUFFIX = {
    "policy": "Policy", "strategy": "Strategy", "goal": "Goal",
    "challenge": "Challenge", "outcome": "Outcome", "pillar": "Pillar",
    "sector": "Sector", "initiative": "Initiative", "objective": "Objective",
    "target": "Target", "opportunity": "Opportunity", "vision": "Vision",
    "region": "Region", "technology": "Technology", "platform": "Technology",
    "system": "Technology", "infrastructure": "Infrastructure",
    "programme": "Initiative", "program": "Initiative", "plan": "Strategy",
    "ministry": "Stakeholder", "agency": "Stakeholder",
    "council": "Stakeholder", "authority": "Stakeholder",
}

# verb lexicon: surface form -> (predicate, subject_type_hint, object_type_hint)
_VERBS = {
    "developed": ("developed", "Stakeholder", None),
    "develops": ("develops", "Stakeholder", None),
    "created": ("created", "Stakeholder", None),
    "invented": ("invented", "Stakeholder", None),
    "introduced": ("introduced", "Stakeholder", None),
    "authored": ("authored", "Stakeholder", None),
    "compiled": ("compiled", "Stakeholder", None),
    "founded": ("founded", "Stakeholder", None),
    "established": ("established", "Stakeholder", None),
    "launched": ("launched", "Stakeholder", "Initiative"),
    "initiated": ("initiated", "Stakeholder", "Initiative"),
    "built": ("built", "Stakeholder", "Infrastructure"),
    "supports": ("supports", None, None),
    "funds": ("funds", "Stakeholder", None),
    "leads": ("leads", "Stakeholder", None),
    "oversees": ("oversees", "Stakeholder", None),
    "governs": ("governs", "Stakeholder", None),
    "promotes": ("promotes", None, None),
    "targets": ("targets", None, "Target"),
    "includes": ("includes", None, None),
    "transformed": ("transformed", None, None),
    "influenced": ("influenced", None, None),
    "preserved": ("preserved", None, None),
    "destroyed": ("destroyed", None, None),
    "attracted": ("attracted", None, None),
    "hosted": ("hosted", None, None),
    "maintained": ("maintained", None, None),
    "refined": ("refined", "Stakeholder", None),
    "translated": ("translated", "Stakeholder", None),
    "distinguished": ("distinguished", "Stakeholder", None),
    "symbolized": ("symbolized", None, None),
    "protects": ("protects", None, None),
    "soothes": ("soothes", None, None),
    "treats": ("treats", None, None),
    "prevents": ("prevents", None, None),
    "reduces": ("reduces", None, None),
    "forms": ("forms", None, None),
    "creates": ("creates", None, None),
}

# pronoun / junk subjects the NP regex can capture at sentence starts
_SUBJ_STOP = {
    "It", "He", "She", "They", "This", "These", "Those", "That", "Below",
    "Above", "There", "Here", "Its", "Their", "His", "Her", "Uses", "Benefit",
    "Benefits", "Overview", "Evidence", "Note", "Also", "However",
}

_SVO_RE = re.compile(
    rf"(?P<subj>{_NP})\s+(?P<verb>{'|'.join(_VERBS)})\s+"
    r"(?P<obj>[a-zA-Z][\w'’-]*(?:[ -][\w'’-]+){0,5})"
)
_ISA_RE = re.compile(
    rf"(?P<subj>{_NP})\s+(?:is|was|are|were)\s+(?:a|an|the)\s+"
    r"(?P<obj>[a-z][\w-]*(?:\s+[\w-]+){0,4}?)(?=[,.;:]|\s+(?:that|which|who|in|of|under|during)\b)"
)
_LOC_RE = re.compile(
    rf"(?P<subj>{_NP})\s+(?:is|was)?\s*(?:located|based|housed)\s+in\s+(?P<obj>{_NP})"
)
# timeline: "X runs from 2021 to 2025" / "X (2021-2025)" / "X spans 2021-2025"
_TL_FROM_RE = re.compile(
    rf"(?P<subj>{_NP})\s+(?P<verb>runs|ran|spans|spanned|operates|operated)\s+"
    r"from\s+(?P<start>\d{3,4})\s*(?:to|until|through)\s*(?P<end>\d{3,4})"
)
_TL_PAREN_RE = re.compile(
    rf"(?P<subj>{_NP})\s*\(\s*(?:r\.\s*)?(?P<start>\d{{3,4}})\s*[–—-]\s*(?P<end>\d{{3,4}})(?:\s*CE)?\s*\)"
)
# distribution: "X reports initiative counts for <Pillar>: term 3, term2 5[, total 8]."
_DIST_RE = re.compile(
    rf"(?P<subj>{_NP})\s+reports\s+initiative\s+counts\s+for\s+"
    rf"(?P<pillar>{_NP})\s*:\s*(?P<body>[^.;]+)"
)
_DIST_ITEM_RE = re.compile(r"([A-Za-z][\w -]*?)\s+(\d+(?:\.\d+)?|\S+)\s*(?:,|$)")

# split after sentence punctuation only when a capital/quote follows, so
# abbreviations like "(r. 786–809 CE)" stay inside one sentence
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z\"'“‘(])|\n+")
_HAS_DIGIT_RE = re.compile(r"\d")

# cheap superset pre-tests for the expensive NP-backtracking passes: the
# full regexes require (a) a lexicon verb bounded by whitespace, (b) an
# is/was/are/were + article sequence, (c) a located/based/housed literal —
# a sentence failing the quick test cannot match the full pattern, so
# gating skips the pass with identical results (hot path)
_SVO_QUICK_RE = re.compile(r"\b(?:" + "|".join(_VERBS) + r")\b")
_ISA_QUICK_RE = re.compile(r"\b(?:is|was|are|were)\s+(?:a|an|the)\s")

_OBJ_LEAD_STOP = frozenset(
    ("the", "a", "an", "by", "to", "in", "on", "and", "from", "its", "their"))


@lru_cache(maxsize=65536)
def _strip_article(np: str) -> str:
    """Drop a leading The/A/An from a captured noun phrase. Pure;
    memoized — noun phrases repeat across sentences in the hot path."""
    parts = np.split(None, 1)
    if len(parts) == 2 and parts[0] in ("The", "A", "An"):
        return parts[1]
    return np


@lru_cache(maxsize=65536)
def _np_type(np: str, hint: str | None) -> str:
    if hint:
        return hint
    parts = np.split()
    last = parts[-1].lower() if parts else ""
    return _TYPE_SUFFIX.get(last, "Entity")


_HEAD_STRIP_RE = re.compile(r"^[#>*\-\s\d.]+")
_HEAD_STRIP_CHARS = set("#>*-. \t0123456789")


def _iter_sentences(text: str):
    for raw in _SENT_SPLIT_RE.split(text):
        s = raw.strip()
        if not s or "|" in s:  # table rows handled by the table extractor
            continue
        # strip markdown heading/bullet/emphasis markers so NPs line up
        # (prefix regex can only match when the first char is in its class;
        # the replaces only matter when a '*' survives — guarded hot path)
        # isdigit() covers Unicode digits (the regex \d class) that the
        # ASCII set misses — the guard must be a superset of the pattern
        if s[0] in _HEAD_STRIP_CHARS or s[0].isdigit():
            s = _HEAD_STRIP_RE.sub("", s)
        if "*" in s:
            s = s.replace("**", "").replace("*", "")
        if s:
            yield s


def _obj_key(o):
    # canonical structural key — same equivalence classes as
    # json.dumps(sort_keys=True) without serializing per call
    if isinstance(o, dict):
        return tuple(sorted((k, _obj_key(v)) for k, v in o.items()))
    return o


@lru_cache(maxsize=65536)
def _sentence_triples(sent: str) -> tuple:
    """All pattern passes for ONE (already marker-stripped) sentence, as a
    tuple of (dedup_key, triple) in pattern order. Memoized: web corpora
    repeat boilerplate sentences heavily (the synth scaling corpus is 78%
    duplicate sentences), and a sentence's candidate triples are a pure
    function of its text — sentence-level extraction dedup, the
    fine-grained analogue of the pipeline's chunk-level dedup-then-extract."""
    out: list[tuple] = []
    seen: set[tuple] = set()

    def add(subj, pred, obj, stype, otype):
        key = (subj, pred, _obj_key(obj) if isinstance(obj, dict) else obj)
        if key in seen or not subj or not pred:
            return
        # subj is norm_space'd (single internal spaces), so the first
        # whitespace-token equals the first space-partition
        if subj in _SUBJ_STOP or subj.partition(" ")[0] in _SUBJ_STOP:
            return
        seen.add(key)
        out.append((key, {
            "subject": subj, "predicate": pred, "object": obj,
            "subject_type": stype, "object_type": otype,
        }))

    # cheap guards: the timeline regexes require a 3-4 digit run and
    # the distribution regex the literal "initiative counts" — skip
    # those passes when they can't match (hot path, identical results)
    if _HAS_DIGIT_RE.search(sent) is not None:
        for m in _TL_FROM_RE.finditer(sent):
            add(py_norm_space(_strip_article(m.group("subj"))), m.group("verb"),
                {"start": m.group("start"), "end": m.group("end")},
                _np_type(m.group("subj"), None), "Time_Period")
        for m in _TL_PAREN_RE.finditer(sent):
            add(py_norm_space(_strip_article(m.group("subj"))), "has timeline",
                {"start": m.group("start"), "end": m.group("end")},
                _np_type(m.group("subj"), None), "Time_Period")
    if "initiative counts" in sent:
        for m in _DIST_RE.finditer(sent):
            term_map: dict[str, Any] = {}
            for item in _DIST_ITEM_RE.finditer(m.group("body")):
                term_map[py_norm_space(item.group(1))] = item.group(2)
            if term_map:
                add(py_norm_space(_strip_article(m.group("subj"))), "has initiative count",
                    {py_norm_space(m.group("pillar")): term_map},
                    _np_type(m.group("subj"), None), "Pillar")
    if _SVO_QUICK_RE.search(sent):
        for m in _SVO_RE.finditer(sent):
            verb = m.group("verb")
            pred, s_hint, o_hint = _VERBS[verb]
            subj = py_norm_space(_strip_article(m.group("subj")))
            obj = py_norm_space(m.group("obj"))
            # drop objects that start with a stopword-ish fragment
            parts = obj.split()
            if parts and parts[0].lower() in _OBJ_LEAD_STOP:
                obj = " ".join(parts[1:])
            if obj:
                add(subj, pred, obj, _np_type(subj, s_hint), _np_type(obj, o_hint))
    if _ISA_QUICK_RE.search(sent):
        for m in _ISA_RE.finditer(sent):
            add(py_norm_space(_strip_article(m.group("subj"))), "is a", py_norm_space(m.group("obj")),
                _np_type(m.group("subj"), None), "Entity")
    if "located" in sent or "based" in sent or "housed" in sent:
        for m in _LOC_RE.finditer(sent):
            add(py_norm_space(_strip_article(m.group("subj"))), "located in", py_norm_space(m.group("obj")),
                _np_type(m.group("subj"), None), "Region")
    return tuple(out)


def extract_triples_rules(text: str) -> list[dict[str, Any]]:
    """FROZEN deterministic ruleset standing in for the chat-LLM extractor
    (ingestMD.py:123-156). Sentence-scoped regex SVO patterns with a typed
    verb lexicon, timeline patterns producing ``{start, end}`` objects
    (ingestMD.py:310-311) and a distribution pattern producing
    ``{pillar: {term: count}}`` objects (ingestMD.py:313-315).

    Per-sentence passes are memoized (_sentence_triples); this wrapper
    merges them with the original chunk-level first-occurrence dedup, so
    the output is byte-identical to the unmemoized single pass. Emitted
    triples are COPIES (incl. nested object dicts): the cache returns the
    same dict objects to every caller, so handing them out directly would
    let any consumer's in-place mutation silently corrupt the cached
    results for all later extractions of that sentence."""
    triples: list[dict[str, Any]] = []
    seen: set[tuple] = set()
    for sent in _iter_sentences(text):
        for key, t in _sentence_triples(sent):
            if key not in seen:
                seen.add(key)
                c = dict(t)
                o = c.get("object")
                if isinstance(o, dict):
                    c["object"] = {k: (dict(v) if isinstance(v, dict) else v)
                                   for k, v in o.items()}
                triples.append(c)
    return triples


def extract_chunk_triples(chunk_text: str) -> list[dict[str, Any]]:
    """Primary rules, then markdown-table fallback only when the primary
    path yields nothing — mirrors process_file (ingestMD.py:751-778)."""
    triples = extract_triples_rules(chunk_text)
    if triples:
        return triples
    return extract_triples_from_markdown_tables(chunk_text)


# ---------------------------------------------------------------------------
# Object-kind dispatch -> flat triples_raw rows (ingestMD.py:354-495)
# ---------------------------------------------------------------------------

def _is_timeline_obj(o: Any) -> bool:
    return isinstance(o, dict) and {"start", "end"} <= set(o.keys())


def _is_distribution_obj(o: Any) -> bool:
    return isinstance(o, dict) and any(isinstance(v, dict) for v in o.values())


def _to_json_compact(x: Any) -> str:
    try:
        return json.dumps(x, separators=(",", ":"), ensure_ascii=False)
    except Exception:
        return str(x)


def _clean_name(s: Any) -> str | None:
    if s is None:
        return None
    if isinstance(s, (str, int, float, bool)):
        return str(s)
    return _to_json_compact(s)


def flatten_triples(triples: list[dict[str, Any]], src_txt: str = "",
                    src_clamp: int = 1000,
                    clamp_all: bool = False) -> list[dict[str, Any]]:
    """Dispatch each triple into normal / timeline / distribution rows with
    the exact bucket semantics of store_in_neo4j (ingestMD.py:354-495):

    - skip when subject or predicate missing (ingestMD.py:360-362)
    - timeline {start,end}: both non-empty -> kind='timeline',
      rel=safe_label(pred), object name "start–end" (en dash,
      ingestMD.py:399-420); malformed -> stringified normal row
    - distribution: per (pillar, term) row, skip term 'total'
      (case-insensitive), int(count) with int(float(str)) fallback, drop
      unparseable (ingestMD.py:423-464); rel type HAS_INITIATIVE_COUNT
    - normal: object stringified via _clean_name; src_txt clamped to 1000
      chars on the normal path but stored FULL on special paths
      (reference quirk, ingestMD.py:419,462,494)

    ``clamp_all=True`` (the distributed pipeline's setting) clamps src_txt
    on the special paths too — a DOCUMENTED DEVIATION from the reference
    quirk: carrying full chunk text per special triple row multiplies
    shuffle volume by the text size at scale; the full text stays
    recoverable via chunk_id -> chunks.text.
    """
    rows: list[dict[str, Any]] = []
    special_txt = (src_txt or "")[:src_clamp] if clamp_all else (src_txt or "")
    for t in triples:
        s, o, p = t.get("subject"), t.get("object"), t.get("predicate")
        if not (s and p):
            continue
        sub_type = py_safe_label(t.get("subject_type"), "Entity")
        obj_type = py_safe_label(t.get("object_type"), "Entity")
        rel_type = py_safe_label(p, "RELATED_TO")

        def base():
            return {
                "subject": s, "subject_type": sub_type,
                "predicate": p, "rel_type": rel_type,
                "object": None, "object_type": obj_type,
                "object_kind": "scalar", "start": None, "end": None,
                "pillar": None, "term": None, "count": None,
                "src_txt": special_txt,
            }

        if _is_timeline_obj(o):
            start = str(o.get("start", "")).strip()
            end = str(o.get("end", "")).strip()
            if start and end:
                r = base()
                r.update({
                    "object": f"{start}–{end}", "object_type": "Time_Period",
                    "object_kind": "timeline", "start": start, "end": end,
                })
                rows.append(r)
                continue
            o = _clean_name(o)  # malformed timeline -> stringified normal
            if not o:
                continue
            r = base()
            r["object"] = o
            rows.append(r)
            continue

        if _is_distribution_obj(o):
            for pillar, term_map in o.items():
                if not isinstance(term_map, dict):
                    continue
                pillar_name = str(pillar).strip()
                if not pillar_name:
                    continue
                for term, cnt in term_map.items():
                    if str(term).lower() == "total":
                        continue
                    try:
                        cnt_val = int(cnt)
                    except Exception:
                        try:
                            cnt_val = int(float(str(cnt)))
                        except Exception:
                            continue
                    r = base()
                    r.update({
                        "object": pillar_name, "object_type": "Pillar",
                        "rel_type": "HAS_INITIATIVE_COUNT",
                        "object_kind": "distribution",
                        "pillar": pillar_name, "term": str(term),
                        "count": cnt_val,
                    })
                    rows.append(r)
            continue

        o_name = _clean_name(o)
        if not o_name:
            continue
        r = base()
        r["object"] = o_name
        r["src_txt"] = (src_txt or "")[:src_clamp]
        rows.append(r)
    return rows
