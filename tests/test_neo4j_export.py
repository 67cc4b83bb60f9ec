"""neo4j-admin bulk-import export: layout, dialect, and row fidelity.

Reads the exported CSVs back with the SAME RFC-4180 dialect the writer
declares and checks them against the committed tables — if these pass,
neo4j-admin sees exactly the committed graph.
"""

import csv
import glob
import json
import os

import pytest

from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
from neo4j_document_pipeline_spark.sources.neo4j_export import (
    export_neo4j_admin,
)
from neo4j_document_pipeline_spark.sources.pages import synth_pages
from neo4j_document_pipeline_spark.sources.store import GraphStore


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exp") / "kg")
    out = str(tmp_path_factory.mktemp("exp") / "csv")
    run_pipeline(spark, synth_pages(spark, 12), root)
    store = GraphStore(root, spark)
    counts = export_neo4j_admin(store, out)
    return store, out, counts


def _rows(out, name):
    """Data rows across all parts, parsed with the RFC-4180 dialect
    (quote doubling) the writer declares."""
    rows = []
    for p in sorted(glob.glob(os.path.join(out, name, "part-*.csv"))):
        with open(p, newline="", encoding="utf-8") as f:
            rows.extend(csv.reader(f, quotechar='"', doublequote=True))
    return rows


def _header(out, name):
    with open(os.path.join(out, f"{name}.header.csv"),
              encoding="utf-8") as f:
        return f.read().strip()


def test_export_layout_and_counts(exported):
    store, out, counts = exported
    for name, table in (("entities", "nodes"), ("documents", "documents"),
                        ("relates", "edges"), ("mentions", "mentions")):
        rows = _rows(out, name)
        assert counts[name] == len(rows) == store.read(table).count()
        # every data row has exactly the header's column count
        width = len(_header(out, name).split(","))
        assert all(len(r) == width for r in rows), name
    sh = open(os.path.join(out, "import.sh"), encoding="utf-8").read()
    assert "neo4j-admin database import full" in sh
    # Spark's RFC-4180 writer may quote embedded newlines; the importer
    # rejects them unless told otherwise
    assert "--multiline-fields=true" in sh
    assert os.access(os.path.join(out, "import.sh"), os.X_OK)


def test_export_headers_follow_import_contract(exported):
    _, out, _ = exported
    assert _header(out, "entities").startswith("entity_id:ID(Entity),:LABEL,")
    assert "embedding:float[]" in _header(out, "entities")
    assert _header(out, "documents").startswith("doc_id:ID(Document),")
    assert _header(out, "relates").startswith(
        ":START_ID(Entity),:END_ID(Entity),:TYPE,")
    assert "sources:string[]" in _header(out, "relates")
    # full reference-parity property set (rel.embedding /
    # rel.source_text_full are MERGE-set by the reference too)
    assert "embedding:float[]" in _header(out, "relates")
    assert "source_text_full" in _header(out, "relates")
    assert _header(out, "mentions") == \
        ":START_ID(Document),:END_ID(Entity),:TYPE"


def test_export_entity_values_roundtrip(exported):
    store, out, _ = exported
    want = {r["entity_id"]: r for r in store.read("nodes").collect()}
    got = _rows(out, "entities")
    assert {r[0] for r in got} == set(want)
    for eid, label, name, emb, *_ in got:
        assert want[eid]["label"] == label
        assert want[eid]["name"] == name
        vec = want[eid]["embedding"]
        if vec is None:
            assert emb == ""
        else:  # ';'-joined float[] cell, element-exact
            assert [float(x) for x in emb.split(";")] == \
                pytest.approx(list(vec))


def test_export_edges_values_roundtrip(exported):
    store, out, _ = exported
    want = {(r["src_id"], r["dst_id"], r["rel_type"],
             r["term"] or ""): r
            for r in store.read("edges").collect()}
    got = _rows(out, "relates")
    assert len(want) == len(got)  # (src, dst, type, term) is the key
    assert {(r[0], r[1], r[2], r[3]) for r in got} == set(want)
    hdr = _header(out, "relates").split(",")
    i_src, i_cnt = hdr.index("sources:string[]"), hdr.index("count:int")
    i_ts = hdr.index("created_at:datetime")
    i_emb = hdr.index("embedding:float[]")
    i_txt = hdr.index("source_text_full")
    for r in got:
        w = want[(r[0], r[1], r[2], r[3])]
        assert sorted(r[i_src].split(";")) == sorted(w["sources"])
        # empty cell = null (the neo4j-admin convention)
        assert (int(r[i_cnt]) if r[i_cnt] else None) == w["count"]
        # ISO-8601 WITH zone offset (UTC session renders 'Z'): the
        # instant survives any exporting session timezone
        assert r[i_ts] == \
            w["created_at"].strftime("%Y-%m-%dT%H:%M:%S") + "Z"
        if w["embedding"] is not None:
            assert [float(x) for x in r[i_emb].split(";")] == \
                pytest.approx(list(w["embedding"]))
        assert r[i_txt] == (w["source_text_full"] or "")


def test_export_mentions_literal_type(exported):
    store, out, _ = exported
    got = _rows(out, "mentions")
    assert all(r[2] == "MENTIONS" for r in got)
    want = {(r["doc_id"], r["entity_id"])
            for r in store.read("mentions").collect()}
    assert {(r[0], r[1]) for r in got} == want


def test_export_cli(exported, tmp_path, capsys):
    from neo4j_document_pipeline_spark.__main__ import main
    store, _, counts = exported
    out = str(tmp_path / "cli_csv")
    main(["export", "--store", store.root, "--out", out])
    printed = json.loads(capsys.readouterr().out.strip())
    assert printed == counts
    assert os.path.exists(os.path.join(out, "import.sh"))
    with pytest.raises(SystemExit, match="--out"):
        main(["export", "--store", store.root])
