"""Unit tests for the pure-Python function layer (no Spark needed)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from neo4j_document_pipeline_spark.functions.chunking import chunk_text, split_by_tokens
from neo4j_document_pipeline_spark.functions.extraction import (
    extract_chunk_triples,
    extract_triples_from_markdown_tables,
    extract_triples_rules,
    flatten_triples,
)
from neo4j_document_pipeline_spark.functions.featurizer import cosine, embed_text
from neo4j_document_pipeline_spark.functions.text import (
    py_canonicalize,
    py_normalize_name_for_key,
    py_safe_label,
    py_sha256_hex,
)
from neo4j_document_pipeline_spark.functions.tokenizer import TOKENIZER, decode, encode


# --- canonicalize (ingestMD.py:61-66 parity) ---

def test_canonicalize_basic():
    assert py_canonicalize("a\r\nb\rc") == "a\nb\nc"
    assert py_canonicalize("a\n\n\n\nb") == "a\n\nb"
    assert py_canonicalize("line  \t\nnext") == "line\nnext"
    assert py_canonicalize("a  b\t\tc") == "a b c"
    assert py_canonicalize("  x  ") == "x"
    assert py_canonicalize(None) == ""


def test_canonicalize_matches_reference_impl():
    # independent re-statement of the reference regex chain
    import re
    def ref(text):
        t = (text or "").replace("\r\n", "\n").replace("\r", "\n")
        t = re.sub(r"\n{3,}", "\n\n", t)
        t = re.sub(r"[ \t]+$", "", t, flags=re.MULTILINE)
        t = re.sub(r"[ \t]{2,}", " ", t)
        return t.strip()
    for s in ["a\r\n\r\n\r\nb  c\t", "  \n\n\nx \t y\n", "", "α  β\r γ"]:
        assert py_canonicalize(s) == ref(s)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab \t\r\n")), max_size=60))
def test_canonicalize_property(s):
    out = py_canonicalize(s)
    assert "\r" not in out
    assert "  " not in out
    assert out == out.strip()
    # NOTE: the reference function is intentionally NOT idempotent — the
    # \n{3,} collapse runs BEFORE trailing-whitespace-strip (ingestMD.py:63-64),
    # so "a\r \r\ra" -> "a\n\n\na" keeps a triple newline. We preserve that.


# --- safe_label (ingestMD.py:57-59 parity) ---

def test_safe_label():
    assert py_safe_label("Time Period") == "Time_Period"
    assert py_safe_label("a-b.c") == "a_b_c"
    assert py_safe_label(None) == "Entity"
    assert py_safe_label("") == "Entity"
    assert py_safe_label("x" * 100) == "x" * 64
    assert py_safe_label("  padded  ") == "padded"


def test_normalize_name_for_key():
    assert py_normalize_name_for_key("Phase Two") == "phase 2"
    assert py_normalize_name_for_key("phase-2!") == "phase 2"
    assert py_normalize_name_for_key("  Six   Goals ") == "6 goals"
    assert py_normalize_name_for_key("") == ""


def test_sha256():
    assert py_sha256_hex("abc") == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )


# --- tokenizer round-trip ---

@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_tokenizer_roundtrip(s):
    if TOKENIZER != "regex_fallback":
        pytest.skip("tiktoken active: regex-fallback round-trip not exercised")
    assert decode(encode(s)) == s


def test_split_by_tokens_roundtrip():
    text = "one two three four five six seven eight nine ten"
    parts = split_by_tokens(text, 4, 0)
    assert "".join(parts) == text


# --- chunking (ingestMD.py:83-118 semantics) ---

def test_chunk_small_doc_single_chunk():
    text = "para one.\n\npara two."
    assert chunk_text(text, max_tokens=100) == ["para one.\n\npara two."]


def test_chunk_packing_respects_budget():
    paras = [f"word{i} " * 10 for i in range(20)]
    text = "\n\n".join(p.strip() for p in paras)
    chunks = chunk_text(text, max_tokens=60)
    assert len(chunks) > 1
    for c in chunks:
        assert len(encode(c)) <= 60
    # all paragraph content preserved in order
    rejoined = "\n\n".join(chunks)
    for i in range(20):
        assert f"word{i}" in rejoined


def test_chunk_oversize_paragraph_sliced():
    big = "tok " * 500  # single paragraph, no blank lines
    chunks = chunk_text(big.strip(), max_tokens=50)
    assert len(chunks) > 1
    assert "".join(chunks) == big.strip()


@given(
    st.lists(
        st.text(
            alphabet="ab1 .#*-\n'é\t|",
            min_size=0, max_size=60,
        ),
        min_size=0, max_size=12,
    ),
    st.sampled_from([5, 17, 60, 2500]),
    st.sampled_from([0, 2]),
)
@settings(max_examples=150, deadline=None)
def test_chunk_counts_match_reencode(paras, max_tokens, overlap):
    """Guard for the additive-count optimization: every (chunk, n) pair
    must have n == len(encode(chunk)) and n <= max_tokens, for arbitrary
    paragraph content including markdown markers, unicode, and whitespace
    (fixtures are frozen against this chunker — counts must stay exact)."""
    from neo4j_document_pipeline_spark.functions.chunking import (
        chunk_text_with_counts,
    )
    text = "\n\n".join(paras)
    for c, n in chunk_text_with_counts(text, max_tokens, overlap):
        assert n == len(encode(c))
        assert n <= max_tokens


# --- markdown table extraction (ingestMD.py:177-216 semantics) ---

TABLE_DOC = """Intro line.

| Name | Role | Era |
| --- | :---: | ---: |
| Al-Khwarizmi | mathematician | 9th century |
| Hunayn |  | 9th century |
| al-Razi | physician | 10th century |
> quote terminates table

| H1 | H2 |
|----|----|
|  | orphan |
| after-blank | x |
"""


def test_table_extractor():
    triples = extract_triples_from_markdown_tables(TABLE_DOC)
    got = {(t["subject"], t["predicate"], t["object"]) for t in triples}
    assert ("Al-Khwarizmi", "Role", "mathematician") in got
    assert ("Al-Khwarizmi", "Era", "9th century") in got
    # blank cell skipped but row kept
    assert ("Hunayn", "Era", "9th century") in got
    assert not any(t[0] == "Hunayn" and t[1] == "Role" for t in got)
    # blank-subject row terminates the second table -> 'after-blank' dropped
    assert not any(t[0] == "after-blank" for t in got)
    for t in triples:
        assert t["subject_type"] == "Entity" and t["object_type"] == "Value"


def test_table_short_row_terminates():
    doc = "| A | B |\n| --- | --- |\n| x | 1 |\nnope\n| y | 2 |\n"
    triples = extract_triples_from_markdown_tables(doc)
    got = {(t["subject"], t["object"]) for t in triples}
    assert ("x", "1") in got
    assert ("y", "2") not in got  # table ended at the non-| line


# --- SVO rules ---

def test_svo_rules_basic():
    text = "Al-Khwarizmi developed algebra. The Digital Policy supports innovation."
    triples = extract_triples_rules(text)
    got = {(t["subject"], t["predicate"], t["object"]) for t in triples}
    assert ("Al-Khwarizmi", "developed", "algebra") in got
    assert ("Digital Policy", "supports", "innovation") in got
    types = {t["subject"]: t["subject_type"] for t in triples}
    assert types["Digital Policy"] == "Policy"
    assert types["Al-Khwarizmi"] == "Stakeholder"


def test_timeline_rule():
    triples = extract_triples_rules("Green Initiative runs from 2021 to 2025.")
    assert len(triples) == 1
    t = triples[0]
    assert t["object"] == {"start": "2021", "end": "2025"}
    assert t["subject"] == "Green Initiative"


def test_timeline_paren_rule():
    triples = extract_triples_rules("Harun al-Rashid (786–809) ruled well.")
    assert any(t["object"] == {"start": "786", "end": "809"} for t in triples)


def test_distribution_rule():
    text = "Sarawak Council reports initiative counts for Digital Pillar: training 3, grants 5, total 8."
    triples = extract_triples_rules(text)
    dist = [t for t in triples if isinstance(t["object"], dict) and "Digital Pillar" in t["object"]]
    assert dist
    tm = dist[0]["object"]["Digital Pillar"]
    assert tm["training"] == "3" and tm["grants"] == "5"


# --- flatten / dispatch (ingestMD.py:354-495 semantics) ---

def test_flatten_timeline():
    rows = flatten_triples([{
        "subject": "X", "predicate": "runs", "subject_type": "Initiative",
        "object": {"start": "2021", "end": "2025"}, "object_type": "Time_Period",
    }], src_txt="S" * 2000)
    assert len(rows) == 1
    r = rows[0]
    assert r["object_kind"] == "timeline"
    assert r["object"] == "2021–2025"
    assert r["start"] == "2021" and r["end"] == "2025"
    assert len(r["src_txt"]) == 2000  # special path stores full text


def test_flatten_malformed_timeline_falls_back():
    rows = flatten_triples([{
        "subject": "X", "predicate": "runs",
        "object": {"start": "", "end": "2025"}, "object_type": "T",
    }])
    assert len(rows) == 1
    assert rows[0]["object_kind"] == "scalar"
    assert json.loads(rows[0]["object"]) == {"start": "", "end": "2025"}


def test_flatten_distribution_skips_total_and_bad_counts():
    rows = flatten_triples([{
        "subject": "X", "predicate": "p",
        "object": {"Pillar A": {"t1": "3", "Total": 8, "bad": "n/a", "t2": 2.9}},
    }])
    terms = {(r["term"], r["count"]) for r in rows}
    assert terms == {("t1", 3), ("t2", 2)}
    for r in rows:
        assert r["rel_type"] == "HAS_INITIATIVE_COUNT"
        assert r["object_kind"] == "distribution"
        assert r["pillar"] == "Pillar A"


def test_flatten_normal_clamps_src():
    rows = flatten_triples(
        [{"subject": "a", "predicate": "p", "object": "b"}], src_txt="z" * 2000
    )
    assert len(rows[0]["src_txt"]) == 1000


def test_flatten_skips_missing_subject_or_predicate():
    rows = flatten_triples([
        {"subject": "", "predicate": "p", "object": "b"},
        {"subject": "a", "predicate": None, "object": "b"},
        {"subject": "a", "predicate": "p", "object": None},
    ])
    assert rows == []


# --- fixture docs end-to-end sanity ---

def test_reference_fixture_doc_extracts():
    with open("/root/reference/Test Files/house_of_wisdom_baghdad.markdown", encoding="utf-8") as f:
        text = py_canonicalize(f.read())
    triples = extract_chunk_triples(text)
    got = {(t["subject"], t["predicate"], str(t["object"])) for t in triples}
    assert ("Al-Khwarizmi", "developed", "algebra") in got
    assert ("al-Rashid", "has timeline", str({"start": "786", "end": "809"})) in got
    assert len(triples) >= 8


# --- featurizer ---

def test_featurizer_deterministic_and_normalized():
    a = embed_text("House of Wisdom", dim=64, seed=42)
    b = embed_text("House of Wisdom", dim=64, seed=42)
    assert (a == b).all()
    assert abs((a ** 2).sum() - 1.0) < 1e-9


def test_featurizer_similarity_orders_sensibly():
    q = embed_text("algebra mathematics", dim=128)
    near = embed_text("algebra and mathematics history", dim=128)
    far = embed_text("petroleum jelly skin moisturizer", dim=128)
    assert cosine(q, near) > cosine(q, far)


def test_cosine_zero_norm():
    assert cosine([0, 0], [1, 2]) == 0.0
