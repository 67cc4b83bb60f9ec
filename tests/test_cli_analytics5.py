"""CLI surface for betweenness / closure / transitions."""

import datetime
import json

import pytest


@pytest.fixture()
def kgstore(spark, tmp_path, capsys):
    from neo4j_document_pipeline_spark.__main__ import main
    store = str(tmp_path / "kg")
    main(["ingest", "--pages", "synth:40", "--store", store])
    capsys.readouterr()
    return store


def _run(capsys, *args):
    from neo4j_document_pipeline_spark.__main__ import main
    main(list(args))
    return capsys.readouterr().out


class TestCliAnalytics:
    def test_betweenness_sampled_and_exact(self, kgstore, capsys):
        out = _run(capsys, "betweenness", "--store", kgstore,
                   "--pivots", "16", "--limit", "10")
        rows = [json.loads(x) for x in out.strip().splitlines()]
        assert rows
        scores = [r["betweenness"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s >= 0 for s in scores)
        # exact mode runs too (small synth KG)
        out2 = _run(capsys, "betweenness", "--store", kgstore,
                    "--pivots", "none", "--limit", "5")
        assert [json.loads(x) for x in out2.strip().splitlines()]

    def test_closure_reports_depth_census(self, kgstore, capsys):
        out = json.loads(_run(capsys, "closure", "--store", kgstore))
        assert out["rel_type"] == "ALL"
        assert out["pairs_by_depth"].get("1", 0) > 0
        for r in out["deepest"]:
            assert r["dist"] >= 1
        # unknown rel_type fails loudly
        with pytest.raises(SystemExit):
            _run(capsys, "closure", "--store", kgstore,
                 "--rel", "NO_SUCH_REL")

    def test_transitions_over_events_dir(self, spark, tmp_path,
                                         kgstore, capsys):
        evdir = str(tmp_path / "events")
        t0 = datetime.datetime(2023, 1, 1)
        rows = []
        for u in range(4):
            for i, et in enumerate(["view", "click", "purchase"]):
                rows.append((u, et, t0 + datetime.timedelta(minutes=i),
                             u * 10 + i))
        spark.createDataFrame(
            rows, "user_id bigint, event_type string, ts timestamp, "
                  "event_id bigint").write.parquet(evdir)
        out = json.loads(_run(capsys, "transitions", "--store", kgstore,
                              "--events", evdir))
        got = {(t["state"], t["next_state"]): (t["n"], t["p"])
               for t in out["transitions"]}
        assert got[("view", "click")] == (4, 1.0)
        assert got[("click", "purchase")] == (4, 1.0)
        # events dir is required
        with pytest.raises(SystemExit):
            _run(capsys, "transitions", "--store", kgstore)
