"""The P/R >= 0.95 gate: Spark pipeline triples vs frozen golden fixtures.

Golden fixtures (fixtures/triples/<doc_id>.json) were produced by the
plain-Python reference run of the frozen extractors
(scripts/freeze_fixtures.py). The Spark pipeline must reproduce the
(subject, predicate, object) sets at precision AND recall >= 0.95 — the
BASELINE.json headline correctness metric. (By construction the
distributed path runs the same frozen rules, so the gate verifies the
DISTRIBUTED plumbing: canonicalization byte-identity, chunk boundaries,
dedup-cache join-back, object-kind dispatch.)
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.text import py_norm_space
from neo4j_document_pipeline_spark.operators.ingest import (
    chunks_to_triples,
    documents_to_chunks,
    pages_to_documents,
)
from neo4j_document_pipeline_spark.functions.tokenizer import TOKENIZER
from neo4j_document_pipeline_spark.sources.pages import _FIXTURE_PATHS, make_text

# fixture set keyed by the ACTIVE tokenizer (chunk boundaries depend on
# it): the suite runs against whichever set matches the installed
# tokenizer — regex-fallback fixtures are committed; a machine with
# tiktoken freezes fixtures/triples_cl100k via scripts/freeze_fixtures.py
# once and then runs this same gate under cl100k_base.
from scripts.freeze_fixtures import FIXTURE_DIRS

FIXTURE_DIR = FIXTURE_DIRS.get(TOKENIZER,
                               f"/root/repo/fixtures/triples_{TOKENIZER}")
if not os.path.isdir(FIXTURE_DIR):
    pytest.skip(
        f"no golden fixtures frozen for tokenizer {TOKENIZER!r} — run "
        "`python scripts/freeze_fixtures.py` on this machine first "
        f"(writes {FIXTURE_DIR})", allow_module_level=True)


def load_golden():
    golden = {}
    for fn in os.listdir(FIXTURE_DIR):
        with open(os.path.join(FIXTURE_DIR, fn)) as f:
            d = json.load(f)
        golden[d["doc_id"]] = {
            (t["subject"], t["predicate"], t["object"]) for t in d["triples"]
        }
    return golden


@pytest.fixture(scope="module")
def spark_triples(spark):
    rows = []
    for i, p in enumerate(_FIXTURE_PATHS):
        with open(p, encoding="utf-8") as f:
            rows.append((f"u{i:04d}", f.read()))
    # SAME corpus recipe as the freezer — imported, not copy-pasted, so a
    # change to N_SYNTH can never desynchronize the gate from the fixtures
    from scripts.freeze_fixtures import N_SYNTH
    for i in range(2, N_SYNTH):
        rows.append((f"u{i:04d}", make_text(i)))
    pages = spark.createDataFrame(rows, "url string, text string")
    triples = chunks_to_triples(documents_to_chunks(pages_to_documents(pages)))
    out = {}
    for r in triples.select("doc_id", "subject", "rel_type", "object").collect():
        out.setdefault(r["doc_id"], set()).add(
            (py_norm_space(r["subject"]), r["rel_type"], py_norm_space(r["object"])))
    return out


def test_precision_recall_ge_095(spark_triples):
    golden = load_golden()
    assert set(spark_triples) == set(golden), "doc_id sets differ"
    tp = fp = fn = 0
    for doc_id, gold in golden.items():
        got = spark_triples.get(doc_id, set())
        tp += len(got & gold)
        fp += len(got - gold)
        fn += len(gold - got)
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    print(f"\nP={precision:.4f} R={recall:.4f} (tp={tp} fp={fp} fn={fn})")
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"


def test_reference_doc_triples_present(spark_triples):
    """Spot-check the reference Test Files doc extracts its known facts."""
    all_triples = set().union(*spark_triples.values())
    assert ("Al-Khwarizmi", "developed", "algebra") in all_triples
    assert any(s == "al-Rashid" and p == "has_timeline" for s, p, o in all_triples)
