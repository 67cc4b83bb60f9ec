"""Z-order layout keys + Markov transition census."""

import pytest


class TestZorderKey:
    def test_known_interleave(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import zorder_key
        # values 0..3 with bits=2: range+1 = 4, bucket == value.
        # z = interleave(bits of a at even positions, b at odd)
        rows = [(a, b) for a in range(4) for b in range(4)]
        df = spark.createDataFrame(rows, ["a", "b"])
        got = {(r["a"], r["b"]): r["zkey"]
               for r in zorder_key(df, ["a", "b"], bits=2).collect()}

        def morton(a, b):
            z = 0
            for j in range(2):
                z |= ((a >> j) & 1) << (2 * j)
                z |= ((b >> j) & 1) << (2 * j + 1)
            return z

        for a in range(4):
            for b in range(4):
                assert got[(a, b)] == morton(a, b), (a, b)

    def test_scaling_to_buckets(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import zorder_key
        # one column, bits=2: min->bucket 0, max->bucket 3 (never 4)
        df = spark.createDataFrame([(100,), (150,), (199,)], ["x"])
        got = {r["x"]: r["zkey"]
               for r in zorder_key(df, ["x"], bits=2).collect()}
        assert got[100] == 0
        assert got[199] == 3
        assert got[150] == (150 - 100) * 4 // 100

    def test_null_maps_to_zero_bucket(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import zorder_key
        df = spark.createDataFrame([(1, 10), (None, 20), (3, 30)],
                                   "a bigint, b bigint")
        got = {r["b"]: r["zkey"]
               for r in zorder_key(df, ["a", "b"], bits=2).collect()}
        # null a contributes no a-bits; b=20 buckets to (10*4)//21 = 1
        assert got[20] == 0b10  # b bucket 1 -> bit 0 of b at position 1

    def test_bit_budget_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import zorder_key
        df = spark.createDataFrame([(1, 2)], ["a", "b"])
        with pytest.raises(ValueError, match="63-bit"):
            zorder_key(df, ["a", "b"], bits=32)
        with pytest.raises(ValueError, match="at least one"):
            zorder_key(df, [], bits=8)

    def test_exactness_guard_raises_in_plan(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import zorder_key
        # range 2^40 with bits=16 breaches the 2^37 double-exactness
        # envelope: the load-bearing guard must raise at execution
        df = spark.createDataFrame([(0,), (1 << 40,)], "x bigint")
        with pytest.raises(Exception, match="zorder_key"):
            zorder_key(df, ["x"], bits=16).collect()

    def test_locality_both_columns(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            zorder_partition_stats)
        # a dense grid: under z-prefix bucketing BOTH columns' per-bucket
        # span must shrink well below the full range (a linear sort
        # would leave the trailing column at fraction ~1.0)
        rows = [(a, b) for a in range(64) for b in range(64)]
        df = spark.createDataFrame(rows, ["a", "b"])
        got = {r["col"]: r.asDict()
               for r in zorder_partition_stats(
                   df, ["a", "b"], bits=6, prefix_bits=4).collect()}
        assert got["a"]["n_buckets"] == 16
        assert got["a"]["n_rows"] == 64 * 64
        # prefix 4 bits over 2 cols -> each column keeps its top 2 bits
        # -> span fraction 1/4 per column
        assert got["a"]["mean_span_fraction"] == pytest.approx(0.25)
        assert got["b"]["mean_span_fraction"] == pytest.approx(0.25)


class TestEventTransitions:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, event_type string, ts timestamp, "
                  "event_id bigint")

    def test_known_counts_and_probs(self, spark):
        import datetime
        from neo4j_document_pipeline_spark.operators.sequences import (
            event_transitions)
        t = lambda s: datetime.datetime(2023, 1, 1, 0, 0, s)  # noqa: E731
        rows = [
            (1, "view", t(1), 1), (1, "click", t(2), 2),
            (1, "view", t(3), 3), (1, "click", t(4), 4),
            (2, "view", t(1), 5), (2, "buy", t(2), 6),
            (3, "view", t(9), 7),  # single event: no pair
        ]
        got = {(r["state"], r["next_state"]): (r["n"], r["p"])
               for r in event_transitions(self._events(spark, rows)).collect()}
        assert got[("view", "click")] == (2, pytest.approx(2 / 3))
        assert got[("view", "buy")] == (1, pytest.approx(1 / 3))
        assert got[("click", "view")] == (1, pytest.approx(1.0))
        assert ("buy", "view") not in got

    def test_tiebreak_determinism(self, spark):
        import datetime
        from neo4j_document_pipeline_spark.operators.sequences import (
            event_transitions)
        t0 = datetime.datetime(2023, 1, 1)
        # same timestamp: event_id orders a -> b -> c
        rows = [(1, "a", t0, 10), (1, "b", t0, 11), (1, "c", t0, 12)]
        got = {(r["state"], r["next_state"]): r["n"]
               for r in event_transitions(self._events(spark, rows)).collect()}
        assert got == {("a", "b"): 1, ("b", "c"): 1}

    def test_include_end_rows_sum_to_one(self, spark):
        import datetime
        from neo4j_document_pipeline_spark.operators.sequences import (
            event_transitions)
        t = lambda s: datetime.datetime(2023, 1, 1, 0, 0, s)  # noqa: E731
        rows = [(1, "view", t(1), 1), (1, "click", t(2), 2),
                (2, "view", t(1), 3)]
        out = event_transitions(self._events(spark, rows),
                                include_end=True).collect()
        by_state = {}
        for r in out:
            by_state.setdefault(r["state"], []).append(r)
        # every state's outgoing probabilities sum to 1
        for state, rs in by_state.items():
            assert sum(r["p"] for r in rs) == pytest.approx(1.0), state
        ends = {(r["state"], r["n"]) for r in out
                if r["next_state"] == "∅"}
        assert ends == {("click", 1), ("view", 1)}


class TestBalancedPartitions:
    def _run(self, spark, edges, k, iters):
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions)
        e = spark.createDataFrame(edges, "u string, v string")
        return {r["id"]: r["part"]
                for r in balanced_partitions(e, k, iters=iters).collect()}

    @staticmethod
    def _brute(edges, k, iters, salt="part"):
        import hashlib
        adj = {}
        pairs = set()
        for u, v in edges:
            if u == v:
                continue
            pairs.add((u, v)); pairs.add((v, u))
        for u, v in pairs:
            adj.setdefault(u, set()).add(v)
        nodes = sorted(adj)
        n = len(nodes)

        def h(x):
            d = hashlib.sha256(f"{salt}:{x}".encode()).hexdigest()
            return int(d[:8], 16) % k

        part = {x: h(x) for x in nodes}
        for _ in range(iters):
            load = {}
            for p in part.values():
                load[p] = load.get(p, 0) + 1
            nxt = {}
            for x in nodes:
                deg = len(adj[x])
                cnt = {}
                for y in adj[x]:
                    cnt[part[y]] = cnt.get(part[y], 0) + 1
                cnt.setdefault(part[x], 0)
                best = max(cnt,
                           key=lambda p: (cnt[p] * n
                                          - k * load.get(p, 0) * deg, -p))
                nxt[x] = best
            part = nxt
        return part

    def test_brute_parity_random(self, spark):
        import random
        rng = random.Random(3)
        nodes = [f"n{i:02d}" for i in range(24)]
        edges = list({(rng.choice(nodes), rng.choice(nodes))
                      for _ in range(70)})
        for iters in (0, 1, 2):
            got = self._run(spark, edges, 4, iters)
            want = self._brute(edges, 4, iters)
            assert got == want, f"iters={iters}"

    def test_two_cliques_cut_improves(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions, edge_cut_stats)
        cl = lambda pre: [(f"{pre}{i}", f"{pre}{j}")
                          for i in range(8) for j in range(i + 1, 8)]
        edges = cl("a") + cl("b") + [("a0", "b0")]
        e = spark.createDataFrame(edges, "u string, v string")
        before = edge_cut_stats(
            e, balanced_partitions(e, 2, iters=0)).first()
        after = edge_cut_stats(
            e, balanced_partitions(e, 2, iters=3)).first()
        # a clustered graph must end with a smaller cut than random hash
        assert after["cut_fraction"] < before["cut_fraction"]
        assert after["total_edges"] == len(edges)

    def test_partitioning_invariance(self, spark):
        edges = [(f"x{i}", f"x{(i * 3) % 11}") for i in range(25)]
        e1 = spark.createDataFrame(edges, "u string, v string")
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions)
        a = {r["id"]: r["part"]
             for r in balanced_partitions(e1, 3, iters=2).collect()}
        b = {r["id"]: r["part"]
             for r in balanced_partitions(e1.repartition(9), 3,
                                          iters=2).collect()}
        assert a == b

    def test_edge_cut_stats_known_values(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            edge_cut_stats)
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "u string, v string")
        a = spark.createDataFrame(
            [("a", 0), ("b", 0), ("c", 1), ("d", 1)], "id string, part int")
        row = edge_cut_stats(e, a).first()
        assert (row["cut_edges"], row["total_edges"]) == (1, 3)
        assert row["cut_fraction"] == round(1 / 3, 6)
        assert (row["n_parts"], row["max_load"], row["min_load"]) == (2, 2, 2)

    def test_validation(self, spark):
        import pytest as _pt
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions)
        e = spark.createDataFrame([("a", "b")], "u string, v string")
        with _pt.raises(ValueError):
            balanced_partitions(e, 1)
        with _pt.raises(ValueError):
            balanced_partitions(e, 4, iters=-1)


class TestMultilevelPartitions:
    def _edges(self, spark, edges):
        return spark.createDataFrame(edges, "u string, v string")

    @staticmethod
    def _cliques():
        cl = lambda pre, n: [(f"{pre}{i:02d}", f"{pre}{j:02d}")
                             for i in range(n) for j in range(i + 1, n)]
        return (cl("a", 8) + cl("b", 8) + cl("c", 8) + cl("d", 8)
                + [("a00", "b00"), ("b00", "c00"), ("c00", "d00")])

    def test_multilevel_beats_flat_hash_on_clustered_graph(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions, edge_cut_stats, multilevel_partitions)
        e = self._edges(spark, self._cliques())
        hash_cut = edge_cut_stats(
            e, balanced_partitions(e, 4, iters=0)).first()["cut_fraction"]
        ml = multilevel_partitions(e, 4, levels=2, coarse_iters=4,
                                   refine_iters=2)
        ml_cut = edge_cut_stats(e, ml).first()["cut_fraction"]
        assert ml_cut < hash_cut
        # every original node is assigned exactly once
        n_nodes = 32
        rows = ml.collect()
        assert len(rows) == n_nodes
        assert len({r["id"] for r in rows}) == n_nodes
        assert all(0 <= r["part"] < 4 for r in rows)

    def test_deterministic_across_partitionings(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            multilevel_partitions)
        e = self._edges(spark, self._cliques())
        a = {r["id"]: r["part"]
             for r in multilevel_partitions(e, 3).collect()}
        b = {r["id"]: r["part"]
             for r in multilevel_partitions(e.repartition(7), 3).collect()}
        assert a == b

    def test_init_seeding_is_respected(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions)
        e = self._edges(spark, [("a", "b"), ("c", "d")])
        init = spark.createDataFrame(
            [("a", 1), ("b", 1), ("c", 0), ("d", 0)], "id string, part int")
        out = {r["id"]: r["part"]
               for r in balanced_partitions(e, 2, iters=0,
                                            init=init).collect()}
        assert out == {"a": 1, "b": 1, "c": 0, "d": 0}
        # a node missing from init falls back to its hash bucket
        partial = spark.createDataFrame([("a", 1)], "id string, part int")
        out2 = {r["id"]: r["part"]
                for r in balanced_partitions(e, 2, iters=0,
                                             init=partial).collect()}
        assert out2["a"] == 1 and set(out2) == {"a", "b", "c", "d"}

    def test_levels_validation(self, spark):
        import pytest as _pt
        from neo4j_document_pipeline_spark.operators.layout import (
            multilevel_partitions)
        e = self._edges(spark, [("a", "b")])
        with _pt.raises(ValueError):
            multilevel_partitions(e, 2, levels=0)


class TestWeightedBalancedPartitions:
    def test_reduces_to_unweighted_with_unit_weights(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions)
        edges = [(f"n{i}", f"n{(i * 5) % 13}") for i in range(20)]
        e = spark.createDataFrame(edges, "u string, v string")
        ew = spark.createDataFrame([(u, v, 1) for u, v in edges],
                                   "u string, v string, w long")
        a = {r["id"]: r["part"]
             for r in balanced_partitions(e, 3, iters=2).collect()}
        b = {r["id"]: r["part"]
             for r in balanced_partitions(ew, 3, iters=2,
                                          weight_col="w").collect()}
        assert a == b

    def test_heavy_edge_pulls_assignment(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions)
        # x sits between two anchors; the heavier edge must win the move
        rows = [("a", "x", 10), ("b", "x", 1), ("a", "a2", 1),
                ("b", "b2", 1)]
        e = spark.createDataFrame(rows, "u string, v string, w long")
        init = spark.createDataFrame(
            [("a", 0), ("a2", 0), ("b", 1), ("b2", 1), ("x", 1)],
            "id string, part int")
        out = {r["id"]: r["part"]
               for r in balanced_partitions(e, 2, iters=1, init=init,
                                            weight_col="w").collect()}
        assert out["x"] == 0  # pulled to the weight-10 anchor

    def test_node_weights_drive_load_penalty(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions)
        # two parts, node g is huge: the score S = c_w*W - k*load_w*deg_w
        # must penalize joining g's part proportionally to its size
        rows = [("g", "x", 1), ("h", "x", 1)]
        e = spark.createDataFrame(rows, "u string, v string, w long")
        sizes = spark.createDataFrame([("g", 100), ("h", 1), ("x", 1)],
                                      "id string, size long")
        init = spark.createDataFrame([("g", 0), ("h", 1), ("x", 0)],
                                     "id string, part int")
        out = {r["id"]: r["part"]
               for r in balanced_partitions(e, 2, iters=1, init=init,
                                            weight_col="w",
                                            node_weights=sizes).collect()}
        # x: part0 affinity c=1 (g) but load 101*deg2; part1 c=1 (h),
        # load 1*deg2 -> x moves to the light part despite equal affinity
        assert out["x"] == 1


class TestReviewFixesSession10:
    def test_edge_cut_stats_reports_uncovered_edges(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            edge_cut_stats)
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "zz")], "u string, v string")
        partial = spark.createDataFrame(
            [("a", 0), ("b", 0), ("c", 1)], "id string, part int")
        row = edge_cut_stats(e, partial).first()
        # (c, zz) has an unassigned endpoint: counted, not dropped
        assert row["uncovered_edges"] == 1
        assert row["total_edges"] == 2
        assert row["cut_edges"] == 1  # (b, c) crosses 0|1

    def test_multilevel_reciprocal_orientations_weigh_once(self, spark):
        from neo4j_document_pipeline_spark.operators.layout import (
            multilevel_partitions)
        # both orientations present: must behave exactly like the
        # canonical single-edge input
        canon = [("a", "b"), ("b", "c"), ("c", "d")]
        recip = canon + [(v, u) for u, v in canon]
        e1 = spark.createDataFrame(canon, "u string, v string")
        e2 = spark.createDataFrame(recip, "u string, v string")
        p1 = {r["id"]: r["part"]
              for r in multilevel_partitions(e1, 2).collect()}
        p2 = {r["id"]: r["part"]
              for r in multilevel_partitions(e2, 2).collect()}
        assert p1 == p2
