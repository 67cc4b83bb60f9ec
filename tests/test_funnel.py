"""Funnel analysis (operators/funnel.py) — hand-checkable sequences and
brute-force parity on a random event log."""

import datetime as dt

import numpy as np
import pytest

from neo4j_document_pipeline_spark.operators.funnel import (
    funnel_counts,
    funnel_steps,
)

T0 = dt.datetime(2025, 6, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")


def test_funnel_known_sequences(spark):
    ev = _ev(spark, [
        # u1 completes all three in order
        (1, "view", _ts(0)), (1, "click", _ts(5)), (1, "buy", _ts(9)),
        # u2: click BEFORE the first view doesn't count; no click after
        (2, "click", _ts(0)), (2, "view", _ts(3)),
        # u3: view then click, no buy
        (3, "view", _ts(1)), (3, "click", _ts(2)),
        # u4: never views
        (4, "buy", _ts(1)),
    ])
    out = {r["user_id"]: r for r in
           funnel_steps(ev, ["view", "click", "buy"]).collect()}
    assert out[1]["n_steps"] == 3
    assert out[1]["t_first"] == _ts(0) and out[1]["t_last"] == _ts(9)
    assert out[2]["n_steps"] == 1
    assert out[3]["n_steps"] == 2
    assert 4 not in out
    counts = {r["step"]: r["n_users"] for r in
              funnel_counts(ev, ["view", "click", "buy"]).collect()}
    assert counts == {1: 3, 2: 2, 3: 1}


def test_funnel_strictly_after_and_window(spark):
    ev = _ev(spark, [
        # same-timestamp click does NOT count (strictly after)
        (1, "view", _ts(0)), (1, "click", _ts(0)),
        # u2 clicks outside the 10-minute window
        (2, "view", _ts(0)), (2, "click", _ts(11)),
        # u3 clicks inside it
        (3, "view", _ts(0)), (3, "click", _ts(10)),
    ])
    out = {r["user_id"]: r["n_steps"] for r in funnel_steps(
        ev, ["view", "click"], within="10 minutes").collect()}
    assert out == {1: 1, 2: 1, 3: 2}


def test_funnel_anchors_at_first_step1(spark):
    # the SECOND view has a click after it, but the funnel anchors at
    # the user's FIRST view (first-touch) — documented semantics
    ev = _ev(spark, [
        (1, "view", _ts(0)), (1, "view", _ts(20)), (1, "click", _ts(25)),
    ])
    r = funnel_steps(ev, ["view", "click"],
                     within="10 minutes").collect()[0]
    assert r["n_steps"] == 1 and r["t_first"] == _ts(0)
    # without the window the click counts (it is after the first view)
    r2 = funnel_steps(ev, ["view", "click"]).collect()[0]
    assert r2["n_steps"] == 2 and r2["t_last"] == _ts(25)


def test_funnel_brute_parity(spark):
    rng = np.random.RandomState(9)
    kinds = ["view", "click", "buy"]
    rows = [(int(rng.randint(12)), kinds[rng.randint(3)],
             _ts(int(rng.randint(500))))
            for _ in range(400)]
    # dedupe (user, kind, ts) so min() ties are unambiguous
    rows = list({(u, k, t) for u, k, t in rows})
    out = {r["user_id"]: r["n_steps"] for r in funnel_steps(
        _ev(spark, rows), kinds, within="3 hours").collect()}
    # brute: greedy earliest with window anchored at first view
    expect = {}
    for u in {r[0] for r in rows}:
        evs = sorted((t, k) for uu, k, t in rows if uu == u)
        t1 = min((t for t, k in evs if k == "view"), default=None)
        if t1 is None:
            continue
        lim = t1 + dt.timedelta(hours=3)
        n, last = 1, t1
        for step in kinds[1:]:
            nxt = min((t for t, k in evs
                       if k == step and last < t <= lim), default=None)
            if nxt is None:
                break
            n, last = n + 1, nxt
        expect[u] = n
    assert out == expect


def test_funnel_validates_steps(spark):
    with pytest.raises(ValueError, match="at least one"):
        funnel_steps(_ev(spark, []), [])


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------

def test_retention_known_values(spark):
    from neo4j_document_pipeline_spark.operators.funnel import (
        retention_cohorts)
    # Mondays: 2025-06-02, -09, -16 (week boundaries)
    d = dt.datetime
    ev = _ev(spark, [
        # u1 cohorts week of 6/2; active weeks 0 and 2
        (1, "view", d(2025, 6, 3)), (1, "view", d(2025, 6, 17)),
        # u2 cohorts same week; active weeks 0 and 1
        (2, "view", d(2025, 6, 4)), (2, "view", d(2025, 6, 9)),
        # u3 cohorts week of 6/9; active week 0 only (twice, same week)
        (3, "view", d(2025, 6, 10)), (3, "view", d(2025, 6, 11)),
    ])
    out = {(r["cohort_week"], r["week_index"]): r["n_users"]
           for r in retention_cohorts(ev).collect()}
    w1, w2 = d(2025, 6, 2), d(2025, 6, 9)
    assert out == {(w1, 0): 2, (w1, 1): 1, (w1, 2): 1, (w2, 0): 1}


def test_retention_cohort_type_excludes_pre_signup(spark):
    from neo4j_document_pipeline_spark.operators.funnel import (
        retention_cohorts)
    d = dt.datetime
    ev = _ev(spark, [
        # browsing BEFORE signup must not count as retained activity
        (1, "view", d(2025, 6, 3)),
        (1, "signup", d(2025, 6, 10)),
        (1, "view", d(2025, 6, 18)),
        # never signs up -> not cohorted at all
        (2, "view", d(2025, 6, 3)),
    ])
    out = {(r["cohort_week"], r["week_index"]): r["n_users"]
           for r in retention_cohorts(ev, cohort_type="signup").collect()}
    assert out == {(d(2025, 6, 9), 0): 1, (d(2025, 6, 9), 1): 1}


# ---------------------------------------------------------------------------
# CLI surface
# ---------------------------------------------------------------------------

def test_cli_funnel_matches_operator(spark, tmp_path, capsys):
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.operators.funnel import funnel_counts
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "events")
    events.write.parquet(d)
    main(["funnel", "--store", str(tmp_path / "kg"), "--events", d,
          "--steps", "view,click,purchase"])
    out = json.loads(capsys.readouterr().out)
    expect = {r["step"]: r["n_users"] for r in
              funnel_counts(events, ["view", "click", "purchase"]).collect()}
    got = {r["step"]: r["n_users"] for r in out["funnel"]}
    assert got == {i: expect.get(i, 0) for i in (1, 2, 3)}
    assert got[1] >= got[2] >= got[3]  # monotone curve
    assert [r["event_type"] for r in out["funnel"]] == \
        ["view", "click", "purchase"]


def test_cli_retention_matches_operator(spark, tmp_path, capsys):
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.operators.funnel import (
        retention_cohorts)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "events")
    events.write.parquet(d)
    main(["retention", "--store", str(tmp_path / "kg"), "--events", d,
          "--limit", "10000"])
    out = json.loads(capsys.readouterr().out)
    expect = {(str(r["cohort_week"]), r["week_index"]): r["n_users"]
              for r in retention_cohorts(events).collect()}
    got = {(r["cohort_week"], r["week_index"]): r["n_users"]
           for r in out["retention"]}
    assert got == expect and got


def test_cli_funnel_validates_inputs(spark, tmp_path):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.__main__ import main
    with _pytest.raises(SystemExit):
        main(["funnel", "--store", str(tmp_path / "kg")])  # no --events
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "events")
    events.write.parquet(d)
    with _pytest.raises(SystemExit):
        main(["funnel", "--store", str(tmp_path / "kg"), "--events", d,
              "--steps", ","])  # empty step list
