"""Freeze golden triple fixtures (FIXTURES.md §1, SURVEY.md §5.2).

Runs the deterministic extractors in PLAIN single-process Python (the
reference implementation of our frozen ruleset) over the fixture corpus —
the two reference Test Files docs + the synthetic document families — and
writes ``fixtures/triples/<doc_id>.json``. The pytest P/R gate compares
the Spark pipeline's emitted (subject, predicate, object) sets against
these files after safe_label/norm_space normalization.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from neo4j_document_pipeline_spark.functions.chunking import chunk_text
from neo4j_document_pipeline_spark.functions.extraction import (
    extract_chunk_triples,
    flatten_triples,
)
from neo4j_document_pipeline_spark.functions.text import (
    py_canonicalize,
    py_norm_space,
    py_safe_label,
    py_sha256_hex,
)
from neo4j_document_pipeline_spark.functions.tokenizer import TOKENIZER
from neo4j_document_pipeline_spark.sources.pages import _FIXTURE_PATHS, make_text

# fixture sets are keyed by the ACTIVE tokenizer: chunk boundaries (and
# therefore doc/chunk hashing of oversized paragraphs) depend on it, so a
# set frozen under the regex fallback is only valid where tiktoken is
# absent. On a machine WITH tiktoken, running this script freezes the
# cl100k set alongside; the golden gate picks whichever matches the
# installed tokenizer (tests/test_golden_triples.py).
FIXTURE_DIRS = {
    "regex_fallback": "/root/repo/fixtures/triples",
    "cl100k_base": "/root/repo/fixtures/triples_cl100k",
}
OUT_DIR = FIXTURE_DIRS.get(TOKENIZER, f"/root/repo/fixtures/triples_{TOKENIZER}")
N_SYNTH = 120  # covers every family several times over


def extract_doc(text: str) -> tuple[str, list[dict]]:
    """The plain-Python reference pipeline: canonicalize -> doc_id ->
    chunk -> per-chunk extract (rules, table fallback) -> flatten."""
    canon = py_canonicalize(text)
    doc_id = py_sha256_hex(canon)
    rows = []
    for chunk in chunk_text(canon, 2500, 0):
        for r in flatten_triples(extract_chunk_triples(chunk),
                                 src_txt=chunk, clamp_all=True):
            rows.append({
                "subject": py_norm_space(r["subject"]),
                # the DISPATCHED rel type (flatten_triples), not a re-derived
                # safe_label(raw predicate): they differ only on distribution
                # rows, where the reference emits HAS_INITIATIVE_COUNT
                # (ingestMD.py:423-464) — the golden gate and the driver
                # oracle both compare against the pipeline's rel_type
                "predicate": r["rel_type"],
                "object": py_norm_space(r["object"]),
                "subject_type": r["subject_type"],
                "object_type": r["object_type"],
                "object_kind": r["object_kind"],
            })
    return doc_id, rows


def main():
    # wipe stale fixtures first: doc_ids are content hashes, so a corpus
    # or canonicalization change orphans old files and the golden gate's
    # exact doc_id-set assertion would fail for a phantom reason
    if os.path.isdir(OUT_DIR):
        import shutil
        shutil.rmtree(OUT_DIR)
    os.makedirs(OUT_DIR, exist_ok=True)
    corpus: list[tuple[str, str]] = []
    for p in _FIXTURE_PATHS:
        with open(p, encoding="utf-8") as f:
            corpus.append((os.path.basename(p), f.read()))
    for i in range(2, N_SYNTH):
        corpus.append((f"synth_{i:04d}", make_text(i)))

    n_files, n_triples = 0, 0
    seen = set()
    for name, text in corpus:
        doc_id, rows = extract_doc(text)
        if doc_id in seen:  # duplicate-content family collapses
            continue
        seen.add(doc_id)
        with open(os.path.join(OUT_DIR, f"{doc_id}.json"), "w") as f:
            json.dump({"source": name, "doc_id": doc_id, "triples": rows},
                      f, indent=1, ensure_ascii=False)
        n_files += 1
        n_triples += len(rows)
    print(f"froze {n_files} fixture docs, {n_triples} triples -> {OUT_DIR}")


if __name__ == "__main__":
    main()
