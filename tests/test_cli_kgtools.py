"""CLI surface for the round-5 KG tooling: cardinality / negatives /
bpe / diff / split."""

import json

import pytest


@pytest.fixture()
def kgstore(spark, tmp_path, capsys):
    from neo4j_document_pipeline_spark.__main__ import main
    store = str(tmp_path / "kg")
    main(["ingest", "--pages", "synth:40", "--keep-versions", "3",
          "--store", store])
    capsys.readouterr()
    return store


def _run(capsys, *args):
    from neo4j_document_pipeline_spark.__main__ import main
    main(list(args))
    return capsys.readouterr().out


class TestCliKgTools:
    def test_cardinality(self, kgstore, capsys):
        out = _run(capsys, "cardinality", "--store", kgstore)
        rows = [json.loads(x) for x in out.strip().splitlines()]
        assert rows
        for r in rows:
            assert r["card_class"] in ("1:1", "N:1", "1:N", "N:M")
            assert r["n_triples"] >= r["n_subjects"] or True
            assert set(r) >= {"predicate", "n_triples", "max_out",
                              "max_in", "avg_out"}

    def test_negatives_are_never_true_edges(self, kgstore, capsys, spark):
        from neo4j_document_pipeline_spark.sources.store import GraphStore
        out = _run(capsys, "negatives", "--store", kgstore,
                   "--n-neg", "1", "--limit", "50")
        rows = [json.loads(x) for x in out.strip().splitlines()]
        assert rows
        store = GraphStore(kgstore, spark)
        true = {(r["src_id"], r["rel_type"], r["dst_id"])
                for r in store.read("edges").collect()}
        for r in rows:
            assert (r["subject"], r["predicate"],
                    r["neg_object"]) not in true

    def test_bpe_merge_table(self, kgstore, capsys):
        out = _run(capsys, "bpe", "--store", kgstore, "--rounds", "3")
        rows = [json.loads(x) for x in out.strip().splitlines()]
        assert [r["round"] for r in rows] == [1, 2, 3]
        for r in rows:
            assert r["merged"] == r["left"] + r["right"]
            assert r["pair_count"] >= 1

    def test_diff_between_versions(self, kgstore, capsys, spark):
        from neo4j_document_pipeline_spark.sources.store import GraphStore
        # compact rewrites the table files -> a new committed version
        # with identical rows, so the diff must be exactly zero churn
        _run(capsys, "compact", "documents", "--store", kgstore,
             "--keep-versions", "3")
        store = GraphStore(kgstore, spark)
        hist = store.history("documents")
        assert len(hist) >= 2
        v_new = hist[-1]["version"]
        v_old = hist[-2]["version"]
        out = _run(capsys, "diff", "documents", v_old, v_new,
                   "--store", kgstore)
        head = json.loads(out.strip().splitlines()[0])
        assert (head["added"], head["removed"], head["changed"]) \
            == (0, 0, 0)

    def test_split_summary_covers_corpus(self, kgstore, capsys, spark):
        from neo4j_document_pipeline_spark.sources.store import GraphStore
        out = _run(capsys, "split", "--store", kgstore,
                   "--fractions", "train=0.5,test=0.5")
        head = json.loads(out.strip().splitlines()[0])
        store = GraphStore(kgstore, spark)
        n_docs = store.read("documents").count()
        assert sum(head["splits"].values()) == n_docs
        assert set(head["splits"]) <= {"train", "test"}

    def test_split_bad_fractions_exit(self, kgstore, capsys):
        from neo4j_document_pipeline_spark.__main__ import main
        with pytest.raises(SystemExit):
            main(["split", "--store", kgstore, "--fractions", "oops"])


class TestCliPartitionNeighborhoods:
    def test_partition_reports_both_cuts(self, kgstore, capsys):
        out = _run(capsys, "partition", "--store", kgstore,
                   "--parts", "4", "--iters", "2")
        rep = json.loads(out.strip())
        assert rep["parts"] == 4 and rep["iters"] == 2
        for side in ("hash_cut", "refined_cut"):
            c = rep[side]
            assert c["total_edges"] > 0
            assert 0.0 <= c["cut_fraction"] <= 1.0
            assert c["n_parts"] <= 4
        # refinement never reports a cut over a DIFFERENT edge set
        assert (rep["hash_cut"]["total_edges"]
                == rep["refined_cut"]["total_edges"])

    def test_neighborhoods_sampled_trees(self, kgstore, capsys):
        out = _run(capsys, "neighborhoods", "--store", kgstore,
                   "--seeds", "Al-Khwarizmi", "--fanouts", "3,2")
        rows = [json.loads(x) for x in out.strip().splitlines()]
        assert rows
        roots = {r["root"] for r in rows}
        assert len(roots) == 1
        by_hop_src = {}
        for r in rows:
            assert r["hop"] in (1, 2)
            by_hop_src.setdefault((r["hop"], r["root"], r["src"]),
                                  []).append(r["dst"])
        for (hop, _, _), dsts in by_hop_src.items():
            assert len(dsts) <= (3 if hop == 1 else 2)
        # deterministic rerun: byte-identical output
        out2 = _run(capsys, "neighborhoods", "--store", kgstore,
                    "--seeds", "Al-Khwarizmi", "--fanouts", "3,2")
        assert out2 == out

    def test_neighborhoods_validation(self, kgstore, capsys):
        import pytest as _pt
        with _pt.raises(SystemExit):
            _run(capsys, "neighborhoods", "--store", kgstore)
        with _pt.raises(SystemExit):
            _run(capsys, "neighborhoods", "--store", kgstore,
                 "--seeds", "Al-Khwarizmi", "--fanouts", "a,b")


class TestCliDrift:
    def test_drift_between_snapshots(self, kgstore, capsys, spark):
        # create a second snapshot of documents_final by re-ingesting
        # incrementally with different synth pages
        from neo4j_document_pipeline_spark.__main__ import main
        main(["ingest", "--pages", "synth:60", "--incremental",
              "--keep-versions", "3", "--store", kgstore])
        capsys.readouterr()
        out = _run(capsys, "drift", "--store", kgstore,
                   "documents_final", "n_chunks")
        rep = json.loads(out.strip())
        assert rep["table"] == "documents_final" and rep["column"] == "n_chunks"
        assert rep["verdict"] in ("stable", "drifting", "broken")
        assert isinstance(rep["psi"], float)
        assert rep["top_terms"]
        # explicit-version form agrees with the implicit newest-two form
        out2 = _run(capsys, "drift", "--store", kgstore,
                    "documents_final", "n_chunks", rep["v_old"], rep["v_new"])
        assert json.loads(out2.strip()) == rep

    def test_drift_validation(self, kgstore, capsys):
        import pytest as _pt
        with _pt.raises(SystemExit):
            _run(capsys, "drift", "--store", kgstore, "documents_final")
        with _pt.raises(SystemExit):
            _run(capsys, "drift", "--store", kgstore,
                 "documents_final", "no_such_col")


class TestCliMultilevelPartition:
    def test_partition_multilevel(self, kgstore, capsys):
        out = _run(capsys, "partition", "--store", kgstore,
                   "--parts", "4", "--iters", "2", "--levels", "1")
        rep = json.loads(out.strip())
        assert rep["levels"] == 1
        assert (rep["hash_cut"]["total_edges"]
                == rep["refined_cut"]["total_edges"])
        assert 0.0 <= rep["refined_cut"]["cut_fraction"] <= 1.0
