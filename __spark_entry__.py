"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full KG construction over the sf0.001
``documents`` table (canonicalize -> chunk -> rule-extract -> graph).

``queries()`` / ``oracle_sql()`` — one entry per SURVEY.md §2 operator,
running against the driver's parquet tables; each SQL-expressible query
has a DuckDB oracle aliased to identical column names. Non-SQL ops
(MinHash-LSH, SimHash, connected components, MMR pipeline, graphrag) are
rows-only checked and covered by Python parity tests in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the engine package lives next to this file; make it importable no
# matter what cwd the harness runs from
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _copurchase_edges(spark, sf, max_orderkey=None, pad=False,
                      weight=None):
    """The co-purchase part graph (parts sharing an order) every
    graph-analytics oracle runs on — built ONCE here so the padding
    decision can't drift between queries. ``pad`` zero-pads ids to 9
    digits so operator-side STRING orderings (least/greatest
    canonicalization, similarity pair order a<b, LPA label tie-breaks)
    match the oracle's numeric ones — required whenever the oracle
    depends on an ordering; plain casts suffice when ids are only join
    keys (BFS, k-core, shortest paths, triangles). ``weight``: None,
    "one" (each co-order occurrence weighs 1.0 — the operators'
    duplicate-summing canonicalization turns that into co-purchase
    counts, count(*) in the oracles), or "endpoint" ((u+v)%7+1:
    deterministic exact-integer weights for the shortest-path oracle,
    identical parallel duplicates so min-combine is trivial)."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    if max_orderkey is not None:
        li = li.filter(F.col("l_orderkey") < max_orderkey)
    a, b = li.alias("a"), li.alias("b")
    if pad:
        pk = lambda c: F.lpad(F.col(c).cast("string"), 9, "0")  # noqa: E731
    else:
        pk = lambda c: F.col(c).cast("string")  # noqa: E731
    cols = [pk("a.l_partkey").alias("u"), pk("b.l_partkey").alias("v")]
    if weight == "one":
        cols.append(F.lit(1.0).alias("w"))
    elif weight == "endpoint":
        cols.append(((F.col("a.l_partkey") + F.col("b.l_partkey")) % 7 + 1)
                    .cast("double").alias("w"))
    return (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_partkey") < F.col("b.l_partkey")))
            .select(*cols))


# ---------------------------------------------------------------------------
# Flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """KG construction on sf0.001 documents: returns the materialized edge
    list with resolved endpoint names (scan -> pandas-UDF extraction ->
    groupBy merge -> joins; SURVEY.md §3.1 write path + J5 fact assembly)."""
    from neo4j_document_pipeline_spark.operators.graph import build_graph
    from neo4j_document_pipeline_spark.operators.ingest import (
        chunks_to_triples,
        documents_to_chunks,
        pages_to_documents,
    )

    from neo4j_document_pipeline_spark.sources.pages import synth_pages

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.col("text"),
    )
    # the driver's documents are random-token text (no extractable facts);
    # union in the deterministic synthetic corpus so the flagship exercises
    # every triple kind end-to-end while still scanning the sf0.001 input
    pages = pages.unionByName(
        synth_pages(spark, 200).select("url", "text"))
    documents = pages_to_documents(pages)
    triples = chunks_to_triples(documents_to_chunks(documents))
    nodes, edges, mentions, _ = build_graph(triples)
    s = nodes.select(F.col("entity_id").alias("src_id"),
                     F.col("label").alias("s_label"), F.col("name").alias("s_name"))
    t = nodes.select(F.col("entity_id").alias("dst_id"),
                     F.col("label").alias("t_label"), F.col("name").alias("t_name"))
    return (
        edges.join(s, "src_id").join(t, "dst_id")
        .select("s_label", "s_name", "rel_type", "t_label", "t_name",
                F.size("sources").alias("n_sources"))
    )


# ---------------------------------------------------------------------------
# Shared expression helpers (kept in sync with their oracle SQL)
# ---------------------------------------------------------------------------

# the contract queries call the ENGINE's own column functions (textstats/
# text), never local copies — the oracle must validate what the pipeline
# ships, so the SQL-side arrays below are derived from the same lists
def _tokens_col(c):
    from neo4j_document_pipeline_spark.functions.textstats import col_tokens
    return col_tokens(c)


def _stopword_lists():
    from neo4j_document_pipeline_spark.functions.textstats import (
        EN_STOPWORDS, MS_STOPWORDS)
    return EN_STOPWORDS, MS_STOPWORDS


_EN_SW, _MS_SW = _stopword_lists()

_SQL_TOKENS = (
    "list_filter(string_split_regex(lower(regexp_replace(text, "
    "'[^A-Za-z0-9'']+', ' ', 'g')), ' '), x -> x <> '')"
)


def _sql_matching_ctes(rounds: int = 4, salt: str = "v1") -> str:
    """Unrolled Luby maximal-matching rounds as DuckDB CTE text (no
    leading WITH) over the bounded part co-purchase graph (l_orderkey
    < 400) — the bit-exact replay of operators/graphalgo.py
    maximal_matching: canonical edges, priority sha256('v1:u|v')||
    ':u|v', an edge selected when its priority is the min at BOTH
    endpoints, matched endpoints retire. Selections land in sel0..
    sel{rounds-1}; ``pe{rounds}`` must be empty (the convergence
    guard the consuming query asserts)."""
    parts = [
        "li AS (SELECT l_orderkey, l_partkey FROM lineitem "
        "WHERE l_orderkey < 400), "
        # STRING-canonical (least, greatest) like _undirected — the
        # numeric a<b join order does not survive the varchar cast
        "me AS MATERIALIZED (SELECT DISTINCT "
        "least(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS u, "
        "greatest(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS v "
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey), "
        "pe0 AS MATERIALIZED (SELECT u, v, "
        f"sha256('{salt}:' || u || '|' || v) || ':' || u || '|' || v AS p "
        "FROM me)"]
    for r in range(rounds):
        parts.append(
            f"mn{r} AS (SELECT id, min(p) AS mp FROM ("
            f"SELECT u AS id, p FROM pe{r} "
            f"UNION ALL SELECT v, p FROM pe{r}) GROUP BY id), "
            f"sel{r} AS (SELECT e.u, e.v FROM pe{r} e "
            f"JOIN mn{r} a ON a.id = e.u AND a.mp = e.p "
            f"JOIN mn{r} b ON b.id = e.v AND b.mp = e.p), "
            f"rm{r} AS (SELECT u AS id FROM sel{r} "
            f"UNION SELECT v FROM sel{r}), "
            f"pe{r + 1} AS MATERIALIZED (SELECT e.u, e.v, e.p "
            f"FROM pe{r} e "
            f"LEFT JOIN rm{r} x ON x.id = e.u "
            f"LEFT JOIN rm{r} y ON y.id = e.v "
            f"WHERE x.id IS NULL AND y.id IS NULL)")
    return ", ".join(parts)


def _sql_balpart_rounds(pfx: str, edges_cte: str, k: int, rounds: int,
                        p0_select: str, weighted: bool = False,
                        size_cte: str | None = None) -> str:
    """Generalized Spinner-round CTE text (no leading WITH) over an
    arbitrary undirected edge CTE ``edges_cte`` holding (u, v) pairs:
    defines {pfx}e2 / {pfx}nodes / {pfx}nn / {pfx}deg and assignment
    CTEs {pfx}p0..{pfx}p{rounds}, replaying balanced_partitions'
    exact-integer score S = c·n − k·load·deg with candidate parts =
    neighbor parts + own and ties to the smaller part. ``p0_select``
    is the full SELECT for the initial (id, part) assignment — the
    sha256 %k hash for a fresh start, a projection join for multilevel
    refinement.

    ``weighted=True``: ``edges_cte`` carries (u, v, weight) and
    ``size_cte`` (id, size) node weights — affinity sums edge weights,
    load sums node sizes, n becomes the total node weight: the
    weight-aware score S = c_w·W − k·load_w·deg_w balanced_partitions
    computes on coarse graphs."""
    if weighted:
        out = [
            f"{pfx}e2 AS (SELECT u, v, weight AS w FROM {edges_cte} "
            f"  UNION ALL SELECT v, u, weight FROM {edges_cte}), "
            f"{pfx}nodes AS (SELECT DISTINCT u AS id FROM {pfx}e2), "
            # W sums sizes of the GRAPH's nodes only — a supernode with
            # no coarse edges (contracted isolated pair) is outside the
            # assignment and must not inflate the load capacity
            f"{pfx}nn AS (SELECT sum(s.size)::BIGINT AS n "
            f"  FROM {size_cte} s JOIN {pfx}nodes nd ON nd.id = s.id), "
            f"{pfx}deg AS (SELECT u AS id, sum(w)::BIGINT AS deg "
            f"  FROM {pfx}e2 GROUP BY u), "
            f"{pfx}p0 AS ({p0_select})"]
    else:
        out = [
            f"{pfx}e2 AS (SELECT u, v FROM {edges_cte} "
            f"  UNION SELECT v, u FROM {edges_cte}), "
            f"{pfx}nodes AS (SELECT DISTINCT u AS id FROM {pfx}e2), "
            f"{pfx}nn AS (SELECT count(*) AS n FROM {pfx}nodes), "
            f"{pfx}deg AS (SELECT u AS id, count(*) AS deg FROM {pfx}e2 "
            f"  GROUP BY u), "
            f"{pfx}p0 AS ({p0_select})"]
    for r in range(rounds):
        if weighted:
            load_cte = (
                f"{pfx}l{r} AS (SELECT part, sum(size)::BIGINT AS load "
                f"  FROM {pfx}p{r} JOIN {size_cte} s "
                f"  ON s.id = {pfx}p{r}.id GROUP BY part), ")
            c_cte = (
                f"{pfx}c{r} AS (SELECT {pfx}e2.u AS id, p.part, "
                f"  sum({pfx}e2.w)::BIGINT AS c "
                f"  FROM {pfx}e2 JOIN {pfx}p{r} p ON {pfx}e2.v = p.id "
                f"  GROUP BY 1, 2 "
                f"  UNION ALL SELECT id, part, 0 FROM {pfx}p{r}), ")
        else:
            load_cte = (
                f"{pfx}l{r} AS (SELECT part, count(*) AS load "
                f"  FROM {pfx}p{r} GROUP BY part), ")
            c_cte = (
                f"{pfx}c{r} AS (SELECT {pfx}e2.u AS id, p.part, "
                f"  count(*) AS c "
                f"  FROM {pfx}e2 JOIN {pfx}p{r} p ON {pfx}e2.v = p.id "
                f"  GROUP BY 1, 2 "
                f"  UNION ALL SELECT id, part, 0 FROM {pfx}p{r}), ")
        out.append(
            load_cte + c_cte +
            f"{pfx}cc{r} AS (SELECT id, part, max(c) AS c FROM {pfx}c{r} "
            f"  GROUP BY 1, 2), "
            f"{pfx}s{r} AS (SELECT {pfx}cc{r}.id, {pfx}cc{r}.part, "
            f"  {pfx}cc{r}.c * (SELECT n FROM {pfx}nn) "
            f"  - {k} * {pfx}l{r}.load * {pfx}deg.deg AS s "
            f"  FROM {pfx}cc{r} JOIN {pfx}l{r} USING (part) "
            f"  JOIN {pfx}deg ON {pfx}deg.id = {pfx}cc{r}.id), "
            f"{pfx}p{r + 1} AS (SELECT id, part FROM ("
            f"  SELECT id, part, row_number() OVER (PARTITION BY id "
            f"  ORDER BY s DESC, part ASC) AS rn FROM {pfx}s{r}) "
            f"  WHERE rn = 1)")
    return ", ".join(out)


def _sql_balpart_ctes() -> str:
    """Unrolled 2-round Spinner-style balanced partitioning as DuckDB
    CTE text (no leading WITH) over the bounded part co-purchase graph
    (l_orderkey < 120, k=4) — the bit-exact replay of
    operators/layout.py balanced_partitions: sha256 %k init, candidate
    parts = neighbor parts + own, EXACT-integer score
    S = c·n − k·load·deg, ties on the smaller part id. Final
    assignment CTE is ``p2``; the canonical u<v edge set is ``pairs``."""
    rounds = []
    for r in range(2):
        rounds.append(
            f"l{r} AS (SELECT part, count(*) AS load FROM p{r} "
            f"  GROUP BY part), "
            f"c{r} AS (SELECT e2.u AS id, p.part, count(*) AS c "
            f"  FROM e2 JOIN p{r} p ON e2.v = p.id GROUP BY 1, 2 "
            f"  UNION ALL SELECT id, part, 0 FROM p{r}), "
            f"cc{r} AS (SELECT id, part, max(c) AS c FROM c{r} "
            f"  GROUP BY 1, 2), "
            f"s{r} AS (SELECT cc{r}.id, cc{r}.part, "
            f"  cc{r}.c * (SELECT n FROM nn) "
            f"  - 4 * l{r}.load * deg.deg AS s "
            f"  FROM cc{r} JOIN l{r} USING (part) "
            f"  JOIN deg ON deg.id = cc{r}.id), "
            f"p{r + 1} AS (SELECT id, part FROM ("
            f"  SELECT id, part, row_number() OVER (PARTITION BY id "
            f"  ORDER BY s DESC, part ASC) AS rn FROM s{r}) "
            f"  WHERE rn = 1)")
    return (
        "pairs AS ("
        "  SELECT DISTINCT a.l_partkey::varchar AS u, "
        "         b.l_partkey::varchar AS v "
        "  FROM lineitem a JOIN lineitem b "
        "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "  WHERE a.l_orderkey < 120 AND b.l_orderkey < 120), "
        "e2 AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs), "
        "nodes AS (SELECT DISTINCT u AS id FROM e2), "
        "nn AS (SELECT count(*) AS n FROM nodes), "
        "deg AS (SELECT u AS id, count(*) AS deg FROM e2 GROUP BY u), "
        "p0 AS (SELECT id, (('0x' || substr(sha256('part:' || id), 1, 8))"
        "::UBIGINT % 4)::INT AS part FROM nodes), "
        + ", ".join(rounds))


def _sql_kmeans_ctes(id_expr: str, k: int = 8, dim: int = 64) -> str:
    """Unrolled 2-round deterministic k-means as DuckDB CTE text (no
    leading WITH) over the embeddings view — the bit-exact replay of
    operators/clustering.py kmeans_assign: integer quantization,
    sha256-seeded init, exact-int64 per-dim diffs, left-fold double
    squares (list_reduce folds left like Spark's aggregate; all terms
    >= 0.0 so the missing 0.0 init changes nothing), ties to the
    smallest cid. ``id_expr`` must match what the Spark query feeds
    kmeans_assign as the id column. Final assignment lands in CTE a2
    as (vid, qv, cid, m)."""
    def assign(mname, aname, cent):
        return (
            f"{mname} AS (SELECT q.vid, q.qv, c.cid, "
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            "d -> CAST(c.n * q.qv[d] - c.S[d] AS DOUBLE) * "
            "CAST(c.n * q.qv[d] - c.S[d] AS DOUBLE)), "
            "(a, b) -> a + b) / (CAST(c.n AS DOUBLE) * "
            "CAST(c.n AS DOUBLE)) AS m "
            f"FROM q CROSS JOIN {cent} c), "
            f"{aname} AS (SELECT vid, qv, cid, m FROM (SELECT *, "
            "row_number() OVER (PARTITION BY vid ORDER BY m, cid) AS rn "
            f"FROM {mname}) WHERE rn = 1)")
    return (
        f"q AS (SELECT {id_expr} AS vid, "
        # CAST x to DOUBLE first: DuckDB's 10000.0 literal is DECIMAL and
        # FLOAT * DECIMAL stays float32, while Spark promotes to double —
        # the one place the two engines' implicit promotions diverge
        "list_transform(embedding, x -> "
        "CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)) AS qv "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        "sd AS (SELECT vid, qv, row_number() OVER ("
        "ORDER BY sha256('km:' || CAST(vid AS VARCHAR)), vid) AS rk "
        "FROM q), "
        f"c0 AS (SELECT rk - 1 AS cid, qv AS S, CAST(1 AS BIGINT) AS n "
        f"FROM sd WHERE rk <= {k}), "
        + assign("m1", "a1", "c0") + ", "
        "n1 AS (SELECT cid, CAST(count(*) AS BIGINT) AS n "
        "FROM a1 GROUP BY cid), "
        "s1 AS (SELECT cid, list(sm ORDER BY d) AS S FROM ("
        "SELECT cid, r.d AS d, CAST(sum(qv[r.d]) AS BIGINT) AS sm "
        f"FROM a1, unnest(range(1, {dim + 1})) AS r(d) "
        "GROUP BY cid, r.d) GROUP BY cid), "
        "c1 AS (SELECT n1.cid, s1.S, n1.n FROM n1 JOIN s1 USING (cid)), "
        + assign("m2", "a2", "c1"))


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- A2: counts per label (documents by lang) ----
    def agg_docs_by_lang(spark, sf):
        return (_t(spark, sf, "documents").groupBy("lang")
                .agg(F.count("*").alias("n")).orderBy("lang"))
    q["agg_docs_by_lang"] = agg_docs_by_lang

    # ---- A3: per-type relationship counts (events by type) ----
    def agg_events_by_type(spark, sf):
        return (_t(spark, sf, "events").groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.round(F.sum("value"), 4).alias("sum_value")))
    q["agg_events_by_type"] = agg_events_by_type

    # ---- A4: distinct-entity count per group ----
    def distinct_users_per_type(spark, sf):
        return (_t(spark, sf, "events").groupBy("event_type")
                .agg(F.countDistinct("user_id").alias("n_users")))
    q["distinct_users_per_type"] = distinct_users_per_type

    # ---- A10/TPC-H Q1 shape: grouped rollup ----
    def pricing_summary(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
                 F.count("*").alias("n_rows"))
        )
    q["pricing_summary"] = pricing_summary

    # ---- W1: top-k per label ----
    def topk_parts_per_brand(spark, sf):
        p = _t(spark, sf, "part")
        w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        return (p.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= 3)
                .select("p_brand", "p_partkey", "p_retailprice", "rk"))
    q["topk_parts_per_brand"] = topk_parts_per_brand

    # ---- W2: round-robin interleave by bucket ----
    def round_robin_events(spark, sf):
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
        return (
            e.withColumn("rk", F.row_number().over(w))
            .orderBy("rk", F.col("value").desc(), F.col("event_id"))
            .select("event_id", "user_id", "rk")
            .limit(50)
        )
    q["round_robin_events"] = round_robin_events

    # ---- W3: first seed per group ----
    def first_event_per_type(spark, sf):
        e = _t(spark, sf, "events")
        w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
        return (e.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .select("event_type", "event_id", F.round("value", 4).alias("value")))
    q["first_event_per_type"] = first_event_per_type

    # ---- A8/F9: min-max normalization with degenerate guard ----
    def minmax_order_price(spark, sf):
        o = _t(spark, sf, "orders")
        w = Window.partitionBy()
        lo, hi = F.min("o_totalprice").over(w), F.max("o_totalprice").over(w)
        return o.select(
            "o_orderkey",
            F.round(
                F.when(hi - lo < F.lit(1e-12), F.lit(0.5))
                .otherwise((F.col("o_totalprice") - lo) / (hi - lo)), 6,
            ).alias("price_n"),
        )
    q["minmax_order_price"] = minmax_order_price

    # ---- J3: hybrid full-outer channel blend ----
    def hybrid_blend(spark, sf):
        e = _t(spark, sf, "events")
        o = _t(spark, sf, "orders")
        vec = e.groupBy(F.col("user_id").alias("id")).agg(F.sum("value").alias("vec"))
        kw = o.groupBy(F.col("o_custkey").alias("id")).agg(F.count("*").cast("double").alias("kw"))
        raw = (vec.join(kw, "id", "full_outer")
               .withColumn("vec", F.coalesce("vec", F.lit(0.0)))
               .withColumn("kw", F.coalesce("kw", F.lit(0.0))))
        w = Window.partitionBy()
        out = raw
        for c in ["vec", "kw"]:
            lo, hi = F.min(c).over(w), F.max(c).over(w)
            out = out.withColumn(
                f"{c}_n",
                F.when(hi - lo < F.lit(1e-12), F.lit(0.5)).otherwise((F.col(c) - lo) / (hi - lo)))
        return (out.withColumn("score", F.round(F.lit(0.6) * F.col("vec_n") + F.lit(0.4) * F.col("kw_n"), 6))
                .select("id", "score")
                .orderBy(F.col("score").desc(), "id").limit(25))
    q["hybrid_blend"] = hybrid_blend

    # ---- J4: 2-hop traversal via self-joins ----
    def two_hop_customer_region(spark, sf):
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        return (
            c.join(n, c.c_nationkey == n.n_nationkey)
            .join(r, n.n_regionkey == r.r_regionkey)
            .groupBy("r_name").agg(F.count("*").alias("n_customers"))
        )
    q["two_hop_customer_region"] = two_hop_customer_region

    # ---- J1: title lookup with coalesce ----
    def order_customer_lookup(spark, sf):
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        return (
            o.join(c, o.o_custkey == c.c_custkey, "left")
            .select("o_orderkey", F.coalesce("c_name", F.lit("?")).alias("cust"))
            .orderBy("o_orderkey").limit(100)
        )
    q["order_customer_lookup"] = order_customer_lookup

    # ---- J7/U3: anti-join (cache-miss pattern) ----
    def parts_never_ordered(spark, sf):
        p = _t(spark, sf, "part")
        li = _t(spark, sf, "lineitem")
        return (p.join(li, p.p_partkey == li.l_partkey, "left_anti")
                .select("p_partkey", "p_name"))
    q["parts_never_ordered"] = parts_never_ordered

    # ---- U4/F5: normalized-key dedup keep-first ----
    def dedup_docs_normalized(spark, sf):
        d = _t(spark, sf, "documents")
        num_map = {"one": "1", "two": "2", "three": "3", "four": "4", "five": "5",
                   "six": "6", "seven": "7", "eight": "8", "nine": "9", "ten": "10"}
        s = F.lower(F.col("text"))
        s = F.regexp_replace(s, r"[^a-z0-9 ]+", " ")
        toks = F.filter(F.split(s, " "), lambda x: x != "")
        mapped = F.transform(
            toks,
            lambda t: F.coalesce(
                F.element_at(F.create_map(*[F.lit(v) for kv in num_map.items() for v in kv]), t), t))
        key = F.array_join(mapped, " ")
        w = Window.partitionBy("norm_key").orderBy("doc_id")
        return (d.withColumn("norm_key", key)
                .withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .select("doc_id", F.sha2("norm_key", 256).alias("key_hash")))
    q["dedup_docs_normalized"] = dedup_docs_normalized

    # ---- F2: content-hash ids ----
    def doc_content_hash(spark, sf):
        return _t(spark, sf, "documents").select(
            "doc_id", F.sha2(F.col("text"), 256).alias("content_hash"))
    q["doc_content_hash"] = doc_content_hash

    # ---- F1: canonicalize text (byte-identical chain) ----
    def canonicalize_docs(spark, sf):
        # the ENGINE's canonicalization (Unicode-aware strip), not a copy
        from neo4j_document_pipeline_spark.functions.text import (
            col_canonicalize)
        return _t(spark, sf, "documents").select(
            "doc_id", F.sha2(col_canonicalize(F.col("text")), 256).alias("canon_hash"))
    q["canonicalize_docs"] = canonicalize_docs

    # ---- F3: safe_label ----
    def safe_label_sources(spark, sf):
        d = _t(spark, sf, "documents")
        x = F.coalesce(F.nullif(F.col("source"), F.lit("")), F.lit("Entity"))
        x = F.regexp_replace(x, r"^\s+|\s+$", "")
        x = F.regexp_replace(x, " ", "_")
        x = F.regexp_replace(x, r"[^A-Za-z0-9_]", "_")
        return (d.select(F.substring(x, 1, 64).alias("label"))
                .groupBy("label").agg(F.count("*").alias("n")))
    q["safe_label_sources"] = safe_label_sources

    # ---- O1/F8: brute-force cosine top-k over embeddings ----
    def cosine_topk(spark, sf):
        e = _t(spark, sf, "embeddings")
        qrow = e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"))
        joined = e.crossJoin(F.broadcast(qrow))
        dot = F.aggregate(F.zip_with("embedding", "qv", lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        na = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x * x))
        nb = F.sqrt(F.aggregate("qv", F.lit(0.0), lambda acc, x: acc + x * x))
        return (
            joined.select(
                "vec_id",
                F.round(F.when((na == 0) | (nb == 0), 0.0).otherwise(dot / (na * nb)), 4).alias("score"))
            .orderBy(F.col("score").desc(), "vec_id").limit(10)
        )
    q["cosine_topk"] = cosine_topk

    # ---- semantic decontamination (embedding-space eval scrub) ----
    def embedding_decontam(spark, sf):
        """Semantic decontamination beside the n-gram pass: corpus
        vectors (vec_id >= 25) flagged when within cosine >= 0.35 of
        any benchmark vector (vec_id < 25), best match per row —
        operators/dedup.py::embedding_decontam_flags, broadcast-exact
        kernel (eval sets are small by nature; the LSH path for huge
        bench sets is pytest-gated against this kernel). Threshold
        compares ROUNDED cosines, so the oracle's boundary is
        identical."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            embedding_decontam_flags)
        e = _t(spark, sf, "embeddings")
        bench = e.filter(F.col("vec_id") < 25).select(
            F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
        corpus = e.filter(F.col("vec_id") >= 25)
        return embedding_decontam_flags(
            corpus, bench, "vec_id", "embedding", "bid", "bv",
            threshold=0.35)
    q["embedding_decontam"] = embedding_decontam

    # ---- IVF ANN, full probe (exact -> shares the cosine oracle) ----
    def ivf_topk_full(spark, sf):
        from neo4j_document_pipeline_spark.operators.similarity import (
            ivf_topk, ivf_train)
        e = _t(spark, sf, "embeddings")
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        cents = ivf_train(e, "vec_id", "embedding", n_cells=4, iters=2)
        # over-fetch, then take the final 10 by the SAME (rounded score,
        # vec_id) ordering the oracle SQL uses — raw-score selection could
        # pick a different row when scores at the cutoff round equal
        out = ivf_topk(e, "vec_id", "embedding", cents, qv, k=50, nprobe=4)
        return (out.select("vec_id", F.round("score", 4).alias("score"))
                .orderBy(F.col("score").desc(), "vec_id").limit(10))
    q["ivf_topk_full"] = ivf_topk_full

    # ---- per-label IVF quantizers, labeled full probe (exact) ----
    def ivf_label_topk(spark, sf):
        """Per-label coarse quantizers (cfg.ann_per_label — the
        reference's one-vector-index-per-label, ingestMD.py:669-690):
        labels are synthesized as vec_id % 3, each label trains its own
        k-means cells (one stratified sample pass), and a labeled query
        ranks/probes ONLY its label's cell range. Probing every cell of
        the label is exact, so the brute within-label cosine SQL is the
        oracle. Same rounded-score re-order trick as ivf_topk_full."""
        from neo4j_document_pipeline_spark.config import PipelineConfig
        from neo4j_document_pipeline_spark.operators.retrieval import (
            build_node_vectors, vector_channel)
        e = _t(spark, sf, "embeddings")
        nodes = e.select(
            F.col("vec_id").cast("string").alias("entity_id"),
            F.pmod(F.col("vec_id"), F.lit(3)).cast("string").alias("label"),
            "embedding")
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        cfg = PipelineConfig(ann_per_label=True, ann_target_cell_rows=256,
                             ann_train_iters=2, ann_label_train_sample=512)
        idx, cents, _, ranges = build_node_vectors(nodes, cfg)
        off, n = ranges["1"]
        out = vector_channel(nodes, qv, ["1"], 50, index=idx,
                             centroids=cents, nprobe=len(cents),
                             allowed_cells=set(range(off, off + n)))
        return (out.select(F.col("entity_id").cast("bigint").alias("vec_id"),
                           F.round("vec", 4).alias("score"))
                .orderBy(F.col("score").desc(), "vec_id").limit(10))
    q["ivf_label_topk"] = ivf_label_topk

    # ---- PQ ANN, exact rerank over the full candidate set ----
    def pq_topk_rerank(spark, sf):
        """ADC-scored product-quantization search with exact cosine rerank
        (operators/similarity.py pq_train/pq_encode/pq_topk). With
        ``candidates`` >= the table size, the rerank stage sees every row,
        so the top-k provably equals brute-force cosine — the same oracle
        trick ivf_topk_full uses at full probe."""
        from neo4j_document_pipeline_spark.operators.similarity import (
            pq_encode, pq_topk, pq_train)
        e = _t(spark, sf, "embeddings")
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        books = pq_train(e, "embedding", m=8, k=16, sample=2000, iters=4)
        enc = pq_encode(e, "embedding", books)
        out = pq_topk(enc, "vec_id", "pq_code", books, qv, k=50,
                      candidates=10_000_000, vec_col="embedding")
        return (out.select("vec_id", F.round("score", 4).alias("score"))
                .orderBy(F.col("score").desc(), "vec_id").limit(10))
    q["pq_topk_rerank"] = pq_topk_rerank

    # ---- hyperplane-LSH ANN, all buckets probed (exact) ----
    def lsh_topk_full(spark, sf):
        """With n_planes=2 and multiprobe=2 every one of the 4 sign
        buckets is probed, so the bucketed search degrades to exact
        cosine — same shared oracle as the other full-probe ANN paths."""
        from neo4j_document_pipeline_spark.operators.similarity import (
            lsh_bucketed_topk)
        e = _t(spark, sf, "embeddings")
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        out = lsh_bucketed_topk(e, "vec_id", "embedding", qv, k=50,
                                n_planes=2, multiprobe=2)
        return (out.select("vec_id", F.round("score", 4).alias("score"))
                .orderBy(F.col("score").desc(), "vec_id").limit(10))
    q["lsh_topk_full"] = lsh_topk_full

    # ---- pairwise top-k similarity join ----
    def pairwise_topk(spark, sf):
        """For each of 50 query vectors, its top-3 most-similar targets
        from a disjoint 100-vector set (broadcast join + per-left
        window)."""
        from neo4j_document_pipeline_spark.operators.similarity import (
            pairwise_topk_join)
        e = _t(spark, sf, "embeddings")
        left = e.filter(F.col("vec_id") < 50)
        right = e.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 150))
        out = pairwise_topk_join(left, right, "vec_id", "vec_id",
                                 "embedding", "embedding", k=3)
        return out.select("lid", "rid", F.round("score", 4).alias("score"),
                          "rank")
    q["pairwise_topk"] = pairwise_topk

    # ---- URL normalization (url-level dedup staple) ----
    def url_normalize(spark, sf):
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_normalize_url)
        d = _t(spark, sf, "documents")
        messy = F.concat(F.lit("HTTPS://Example.COM:443/"), F.col("doc_id"),
                         F.lit("/?utm_source=x&q=1&utm_b=2#frag"))
        return d.select("doc_id", col_normalize_url(messy).alias("url_norm"))
    q["url_normalize"] = url_normalize

    # ---- textstats: token count (engine function) ----
    def token_counts(spark, sf):
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count)
        return _t(spark, sf, "documents").select(
            "doc_id", col_token_count(F.col("text")).alias("n_tok"))
    q["token_counts"] = token_counts

    # ---- textstats: in-document repetition (Gopher rules) ----
    def doc_repetition(spark, sf):
        """Duplicate-line and duplicate-trigram fractions per document —
        the Gopher/C4 boilerplate-repetition signals (templated text
        repeats lines/n-grams; unique-document dedup can't see it)."""
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_dup_line_fraction, col_dup_ngram_fraction)
        return _t(spark, sf, "documents").select(
            "doc_id",
            F.round(col_dup_line_fraction(F.col("text")), 6)
            .alias("dup_line_frac"),
            F.round(col_dup_ngram_fraction(F.col("text"), 3), 6)
            .alias("dup_trigram_frac"))
    q["doc_repetition"] = doc_repetition

    def gopher_topgram(spark, sf):
        """The Gopher top-n-gram rule (Rae et al. §A1.1) at n = 2 and
        3: per document, the most frequent word n-gram (ties to the
        smallest gram) and the fraction of characters it claims —
        catches one phrase looping through otherwise-unique text
        (functions/textstats.py::col_top_ngram, a sorted linear scan
        per row). All inputs to the fraction are exact integers."""
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count, col_top_ngram)
        d = _t(spark, sf, "documents")
        outs = []
        for n in (2, 3):
            s = col_top_ngram(F.col("text"), n)
            outs.append(
                d.filter(col_token_count(F.col("text")) >= n)
                .select("doc_id", F.lit(n).alias("n"),
                        s["bestg"].alias("top_gram"),
                        s["best"].cast("bigint").alias("top_count"),
                        F.round(s["best"] * F.length(s["bestg"])
                                / s["total"], 6)
                        .alias("top_char_frac")))
        return outs[0].unionByName(outs[1])
    q["gopher_topgram"] = gopher_topgram

    # ---- corpus dedup: exact-substring duplicate spans ----
    def dup_span_docs(spark, sf):
        """Per-document duplicated-span stats — the suffix-array-style
        exact-substring dedup signal (Lee et al. 2022) re-expressed as
        k-gram postings + corpus count + per-doc interval merge
        (operators/dedup.py duplicate_span_stats, k=8): every token
        k-gram occurring >= 2 times in the corpus flags its position;
        flagged positions merge into maximal spans; docs report the
        token fraction inside duplicated regions."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            duplicate_span_stats)
        return duplicate_span_stats(
            _t(spark, sf, "documents"), "doc_id", "text", k=8)
    q["dup_span_docs"] = dup_span_docs

    # ---- sketches: count-min frequency cells ----
    def cms_user_counts(spark, sf):
        """Per-event-type count-min sketch of user activity (Cormode &
        Muthukrishnan 2005): sparse (event_type, r, b, cnt) cells over
        sha256 buckets — a pure integer aggregation, so the sketch is
        identical on any partitioning/engine and mergeable by adding
        cells (operators/sketches.py cms_sketch, depth=4 width=64)."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            cms_sketch)
        return cms_sketch(_t(spark, sf, "events"), "event_type",
                          "user_id", depth=4, width=64, salt="v1")
    q["cms_user_counts"] = cms_user_counts

    # ---- sketches: count-min point estimates ----
    def cms_hot_users(spark, sf):
        """Point-query the count-min sketch for every (event_type,
        user_id < 40) probe: estimate = min over hash rows of the
        probed cell's count (0 when absent) — never below the true
        frequency. The oracle rebuilds the cells and the min-over-rows
        arithmetic verbatim."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            cms_point_estimate, cms_sketch)
        e = _t(spark, sf, "events")
        cells = cms_sketch(e, "event_type", "user_id",
                           depth=4, width=64, salt="v1")
        keys = (e.filter(F.col("user_id") < 40)
                .select("event_type", "user_id").distinct())
        return cms_point_estimate(cells, keys, "event_type", "user_id",
                                  depth=4, width=64, salt="v1")
    q["cms_hot_users"] = cms_hot_users

    # ---- sketches: Bloom filter build ----
    def bloom_user_filter(spark, sf):
        """Per-event-type Bloom filter over user ids in sparse packed
        32-bit-word form (operators/sketches.py bloom_sketch): one row
        per non-empty word, bits = OR of 1 << (pos % 32) over the 3
        sha256 bit positions of every user. The membership companion to
        the KMV/CMS sketches — mergeable by OR, broadcastable as the
        build side of a decontamination semi-join. The oracle replays
        the identical hash/bit arithmetic."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            bloom_sketch)
        e = _t(spark, sf, "events")
        return bloom_sketch(e, "event_type", "user_id",
                            m_bits=512, k_hashes=3, salt="v1")
    q["bloom_user_filter"] = bloom_user_filter

    # ---- sketches: Bloom membership probe ----
    def bloom_member_probe(spark, sf):
        """Probe the per-type Bloom filter with every (event_type,
        user_id < 40) pair PLUS guaranteed-absent shifted ids: member =
        all 3 bit positions set (false = definite absence, true = up to
        the filter's FP rate — deterministic either way, so the oracle
        matches bit-for-bit)."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            bloom_contains, bloom_sketch)
        e = _t(spark, sf, "events")
        words = bloom_sketch(e, "event_type", "user_id",
                             m_bits=512, k_hashes=3, salt="v1")
        seen = (e.filter(F.col("user_id") < 40)
                .select("event_type", "user_id").distinct())
        absent = (e.filter(F.col("user_id") < 15)
                  .select("event_type",
                          (F.col("user_id") + 1000000).alias("user_id"))
                  .distinct())
        return bloom_contains(words, seen.unionByName(absent),
                              "event_type", "user_id",
                              m_bits=512, k_hashes=3, salt="v1")
    q["bloom_member_probe"] = bloom_member_probe

    # ---- embedding clustering: deterministic bounded-round k-means ----
    def kmeans_vec_clusters(spark, sf):
        """Deterministic Lloyd k-means (k=8, 2 unrolled rounds) over the
        embeddings table: hash-seeded init, exact-integer centroid
        state, left-fold double distance — the whole clustering is a
        pure function of the data (operators/clustering.py
        kmeans_assign), so the oracle replays every round bit-for-bit."""
        from neo4j_document_pipeline_spark.operators.clustering import (
            kmeans_assign)
        return kmeans_assign(_t(spark, sf, "embeddings"),
                             "vec_id", "embedding", k=8, iters=2)
    q["kmeans_vec_clusters"] = kmeans_vec_clusters

    # ---- embedding clustering: SemDeDup semantic dedup ----
    def semantic_dedup_vecs(spark, sf):
        """SemDeDup (Abbas et al. 2023): k-means clusters -> within-
        cluster cosine >= 0.35 pairs (driver embeddings are random; the
        threshold exercises the pair path like embedding_near_dups) ->
        one survivor per connected group. Ids are zero-padded so the
        components' string min is numeric-correct."""
        from neo4j_document_pipeline_spark.operators.clustering import (
            semantic_dedup)
        e = _t(spark, sf, "embeddings").select(
            F.lpad(F.col("vec_id").cast("string"), 9, "0").alias("vid"),
            "embedding")
        return semantic_dedup(e, "vid", "embedding", k=8, iters=2,
                              threshold=0.35)
    q["semantic_dedup_vecs"] = semantic_dedup_vecs

    # ---- temporal: as-of join (point-in-time lookup) ----
    def asof_click_view(spark, sf):
        """Every click joined to the same user's most recent view at or
        before it (operators/temporal.py asof_join — the union +
        running-window form: ONE shuffle, no range explosion, left
        rows kept unmatched). Oracle is DuckDB's native ASOF LEFT
        JOIN — the reference semantics, implemented independently."""
        from neo4j_document_pipeline_spark.operators.temporal import (
            asof_join)
        ev = _t(spark, sf, "events").withColumn(
            "ts", F.col("ts").cast("timestamp"))
        clicks = ev.filter(F.col("event_type") == "click") \
            .select("event_id", "user_id", "ts")
        views = ev.filter(F.col("event_type") == "view") \
            .select(F.col("event_id").alias("view_id"), "user_id", "ts")
        return (asof_join(clicks, views, "user_id", "ts")
                # inner shape for the oracle: NULL timestamps from
                # unmatched clicks round-trip as pandas NaT in the
                # driver's canonicalizer; left-join semantics are
                # pytest-covered (test_temporal)
                .filter(F.col("view_id_r").isNotNull())
                .select("event_id", "user_id", "ts",
                        F.col("view_id_r").alias("view_id"),
                        F.col("ts_r").alias("view_ts")))
    q["asof_click_view"] = asof_click_view

    # ---- temporal: bucketized range join ----
    def range_join_events(spark, sf):
        """Every click inside the 2-hour window after a same-user
        signup (operators/temporal.py range_join — intervals explode
        into epoch buckets, the join is a hash EQUI join on
        (user, bucket) with the exact range check as a post-filter;
        a raw BETWEEN predicate would plan as a nested loop)."""
        from neo4j_document_pipeline_spark.operators.temporal import (
            range_join)
        ev = _t(spark, sf, "events").withColumn(
            "ts", F.col("ts").cast("timestamp"))
        spans = ev.filter(F.col("event_type") == "signup").select(
            "user_id", F.col("event_id").alias("span_id"),
            F.col("ts").alias("t0"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("t1"))
        clicks = ev.filter(F.col("event_type") == "click") \
            .select("event_id", "user_id", "ts")
        return (range_join(clicks, spans, "user_id", ts_col="ts",
                           start_col="t0", end_col="t1",
                           bucket_seconds=1800)
                .select("event_id", "user_id", "ts",
                        F.col("span_id_r").alias("span_id")))
    q["range_join_events"] = range_join_events

    # ---- corpus analytics: winnowing fingerprints (MOSS) ----
    def winnow_docs(spark, sf):
        """Winnowing fingerprint selection (Schleimer et al. 2003):
        the min sha256-head hash of every 4 consecutive 3-gram
        positions per document — any shared >=6-token substring
        between two docs yields a shared fingerprint
        (operators/corpus.py winnow_fingerprints)."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            winnow_fingerprints)
        return winnow_fingerprints(
            _t(spark, sf, "documents"), "doc_id", "text", k=3, window=4)
    q["winnow_docs"] = winnow_docs

    # ---- corpus hygiene: PII scrubbing ----
    def pii_redaction(spark, sf):
        """Deterministic PII is injected per doc (email, IPv4, phone
        built from doc_id), then counted and scrubbed with the engine's
        Java/RE2-compatible patterns (functions/textstats.py
        col_redact_pii) — the pre-training scrub pass; the oracle runs
        the IDENTICAL regexes in DuckDB."""
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_pii_count, col_redact_pii)
        d = _t(spark, sf, "documents")
        synth = F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 192.168."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".7 tel +60 12-345 67"),
            F.lpad((F.col("doc_id") % 90).cast("string"), 2, "0"),
            F.lit("89"))
        return d.select(
            "doc_id",
            col_pii_count(synth, "email").alias("n_email"),
            col_pii_count(synth, "ipv4").alias("n_ipv4"),
            col_pii_count(synth, "phone").alias("n_phone"),
            col_redact_pii(synth).alias("redacted"))
    q["pii_redaction"] = pii_redaction

    # ---- events: first-touch funnel ----
    def funnel_view_click_purchase(spark, sf):
        """view → click → purchase conversion curve inside a 48-hour
        window anchored at each user's first view (operators/funnel.py
        — one co-partitioned join+agg per step, greedy-earliest
        first-touch semantics, exactly SQL-replayable)."""
        from neo4j_document_pipeline_spark.operators.funnel import (
            funnel_counts)
        return funnel_counts(
            _t(spark, sf, "events"), ["view", "click", "purchase"],
            within="48 hours")
    q["funnel_view_click_purchase"] = funnel_view_click_purchase

    # ---- events: weekly retention cohorts ----
    def retention_weekly(spark, sf):
        """Retention triangle cohorted on each user's first signup:
        distinct users per (cohort week, weeks since) — pre-signup
        activity excluded (operators/funnel.py retention_cohorts;
        hash aggregates only, no windows)."""
        from neo4j_document_pipeline_spark.operators.funnel import (
            retention_cohorts)
        return retention_cohorts(
            _t(spark, sf, "events"), cohort_type="signup")
    q["retention_weekly"] = retention_weekly

    # ---- sketches: KMV distinct-count ----
    def kmv_user_sketch(spark, sf):
        """Mergeable KMV (bottom-k) distinct-user sketch per event
        type, k=32, beside the exact count (operators/sketches.py).
        The sketch is a pure deterministic function of the data (the
        engine's sha256 uniform hash), so the oracle reproduces the
        estimate bit-for-bit — at sf0.001 (15 users < k) the exact
        path fires, at sf0.01 (150 users) the (k-1)/h_k estimator."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            kmv_sketch)
        ev = _t(spark, sf, "events")
        sk = kmv_sketch(ev, "event_type", "user_id", k=32)
        exact = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("exact"))
        return (sk.join(exact, "event_type")
                .select("event_type", "n_min",
                        F.round("estimate", 4).alias("estimate"),
                        "exact"))
    q["kmv_user_sketch"] = kmv_user_sketch

    def sliding_distinct_users(spark, sf):
        """Trailing-window distinct users per event type (6h windows
        sliding by 3h) from per-bucket KMV sketches merged along the
        time axis (sketches.py::kmv_sliding_distinct): raw rows sketch
        once into slide buckets, each window merges its 2 buckets —
        bit-identical to sketching every window from raw (the merge
        property), proven by the oracle reproducing the construction."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            kmv_sliding_distinct)
        ev = _t(spark, sf, "events")
        return (kmv_sliding_distinct(ev, "user_id", window_sec=21600,
                                     slide_sec=10800,
                                     group_cols="event_type", k=32)
                .select("win_start_sec", "event_type", "n_min",
                        F.round("estimate", 4).alias("estimate")))
    q["sliding_distinct_users"] = sliding_distinct_users

    def token_length_quantiles(spark, sf):
        """Median/p90/p99 document token length from a DETERMINISTIC
        hash sample (sketches.py::hash_sample_quantiles) — the same
        pure-function-of-the-data draw as stratified_sample, so the
        estimates replay identically on any partitioning or engine
        (approx_percentile's sketch is partitioning-dependent). Oracle
        reproduces the sample AND the rank arithmetic exactly."""
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count)
        from neo4j_document_pipeline_spark.operators.sketches import (
            hash_sample_quantiles)
        d = _t(spark, sf, "documents").select(
            "doc_id", col_token_count(F.col("text")).alias("n_tok"))
        return hash_sample_quantiles(d, "n_tok", [0.5, 0.9, 0.99],
                                     "doc_id", rate=0.5)
    q["token_length_quantiles"] = token_length_quantiles

    # ---- temporal: hypertable-style rollup ----
    def event_rollup(spark, sf):
        """Multi-resolution tumbling aggregates (1h/6h/1d) where each
        coarser level re-aggregates the next finer level's buckets —
        the TimescaleDB continuous-aggregate shape (raw events scanned
        once; a day bucket sums 24 hour-rows). Oracle recomputes every
        level directly from raw events, proving the hierarchical
        re-aggregation is lossless."""
        from neo4j_document_pipeline_spark.operators.temporal import (
            time_rollup)
        ev = _t(spark, sf, "events")
        return (time_rollup(ev, "ts", "value",
                            levels=["1 hour", "6 hours", "1 day"],
                            group_cols="event_type")
                .select("level", "bucket_start", "event_type", "n",
                        F.round("v_sum", 4).alias("v_sum")))
    q["event_rollup"] = event_rollup

    # ---- corpus analytics: TF-IDF keyword extraction ----
    def tfidf_top_terms(spark, sf):
        """Top-3 TF-IDF terms per document (operators/corpus.py):
        tf · ln(N/df) over the corpus's own vocabulary, ties ranked by
        term ascending so the window is deterministic; N folded
        in-plan as a broadcast 1-row aggregate."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            corpus_tfidf_top_terms)
        return (corpus_tfidf_top_terms(
            _t(spark, sf, "documents"), "doc_id", "text", k=3)
            .select("doc_id", "term", "tf", "dfreq",
                    F.round("score", 6).alias("score"), "rank"))
    q["tfidf_top_terms"] = tfidf_top_terms

    # ---- corpus analytics: unigram LM quality scores ----
    def unigram_perplexity(spark, sf):
        """Average per-token log-probability under the corpus's own
        unigram distribution (operators/corpus.py) — the CCNet-shaped
        perplexity-proxy quality filter; junk documents sort first."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            unigram_logprob_scores)
        return (unigram_logprob_scores(
            _t(spark, sf, "documents"), "doc_id", "text")
            .select("doc_id", "n_tok",
                    F.round("avg_logprob", 6).alias("avg_logprob")))
    q["unigram_perplexity"] = unigram_perplexity

    # ---- corpus analytics: bigram LM quality scores ----
    def bigram_perplexity(spark, sf):
        """Average conditional log-probability per bigram under the
        corpus's own add-0.5-smoothed bigram model (operators/corpus.py
        bigram_logprob_scores) — the context-aware rung above the
        unigram filter: scrambled word order with a normal unigram
        profile sinks here and nowhere else."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            bigram_logprob_scores)
        return (bigram_logprob_scores(
            _t(spark, sf, "documents"), "doc_id", "text", add_k=0.5)
            .select("doc_id", "n_big",
                    F.round("avg_logprob", 6).alias("avg_logprob")))
    q["bigram_perplexity"] = bigram_perplexity

    # ---- corpus analytics: trained Naive Bayes classifier ----
    def nb_lang_scores(spark, sf):
        """Multinomial Naive Bayes language scores (operators/
        classify.py nb_class_scores): train on the even-doc_id half of
        the corpus labeled by its lang column, score the odd half
        against every class — the trainable quality/language-classifier
        rung of the CCNet-style filter ladder, with the train/score
        split exercising the fixed-vocabulary OOV drop and the prior.
        Scores are sums of hundreds of ln terms (magnitude ~10^3), so
        they round at 4dp — cross-engine last-ulp ln noise stays far
        from the rounding boundary where a 6dp compare would sit on
        it."""
        from neo4j_document_pipeline_spark.operators.classify import (
            nb_class_scores)
        d = _t(spark, sf, "documents")
        return (nb_class_scores(
            d.filter(F.col("doc_id") % 2 == 1), "doc_id", "text",
            d.filter(F.col("doc_id") % 2 == 0), "lang")
            .select("doc_id", "label", "n_hit",
                    F.round("score", 4).alias("score")))
    q["nb_lang_scores"] = nb_lang_scores

    # ---- corpus analytics: DSIR importance-resampling weights ----
    def dsir_weights_docs(spark, sf):
        """DSIR log importance ratios (operators/corpus.py
        dsir_log_weights — Xie et al. 2023): hashed unigram+bigram
        bag-of-features models of the en-labeled target slice vs the
        whole raw corpus; documents whose feature profile looks like
        the target score high, and exp(log_ratio) feeds
        weighted_sample for the paper's resampling step. 4dp rounding
        for the same reason as nb_lang_scores (sums of hundreds of ln
        terms)."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            dsir_log_weights)
        d = _t(spark, sf, "documents")
        return (dsir_log_weights(
            d, "doc_id", "text", d.filter(F.col("lang") == "en"),
            buckets=4096, add_k=0.5)
            .select("doc_id", "n_feat",
                    F.round("log_ratio", 4).alias("log_ratio")))
    q["dsir_weights_docs"] = dsir_weights_docs

    # ---- corpus hygiene: C4 page/line quality rules ----
    def c4_filter_docs(spark, sf):
        """The C4 cleaning rules (Raffel et al. 2019 §2.2 —
        operators/corpus.py c4_quality_filters) over a deterministic
        web-page reconstruction of the single-line synthetic corpus:
        5-word pseudo-lines, every (doc_id+i)%3==0 line left without
        terminal punctuation, plus injected lorem-ipsum / code-brace /
        bad-word / javascript lines on fixed doc_id residues so every
        rule fires on a nontrivial slice. Returns the per-page rule
        flags, kept-line counts, and the cleaned text."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            c4_quality_filters)
        d = _t(spark, sf, "documents")
        toks = F.split(F.col("text"), " ")
        nseg = F.ceil(F.size(toks) / F.lit(5.0)).cast("int")
        doc_id = F.col("doc_id")
        segs = F.transform(
            F.sequence(F.lit(1), nseg),
            lambda i: F.concat(
                F.concat_ws(" ", F.slice(toks, (i - 1) * 5 + 1, 5)),
                F.when((doc_id + i) % 3 == 0, F.lit(""))
                .otherwise(F.lit("."))))
        page = F.concat(
            F.concat_ws("\n", segs),
            F.when(doc_id % 13 == 0,
                   F.lit("\nlorem ipsum dolor sit amet okay."))
            .otherwise(F.lit("")),
            F.when(doc_id % 17 == 0,
                   F.lit('\nvar config = { "mode": 1 };'))
            .otherwise(F.lit("")),
            F.when(doc_id % 19 == 0,
                   F.lit("\nwin big at the casino tonight folks."))
            .otherwise(F.lit("")),
            F.when(doc_id % 7 == 0,
                   F.lit("\nplease enable javascript to view this "
                         "page."))
            .otherwise(F.lit("")))
        return c4_quality_filters(
            d.select("doc_id", page.alias("text")), "doc_id", "text")
    q["c4_filter_docs"] = c4_filter_docs

    # ---- sketches: fixed-width histogram (mergeable quantiles) ----
    def hist_price_cells(spark, sf):
        """Per-priority fixed-width histogram sketch of order totals
        (operators/sketches.py hist_sketch): floor-bucket counts,
        exactly mergeable by addition — the quantile/distribution
        member of the KMV/CMS/Bloom sketch family. One map-side-
        combinable hash aggregate; O(range/width) rows out."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            hist_sketch)
        return hist_sketch(
            _t(spark, sf, "orders"), "o_orderpriority", "o_totalprice",
            width=25000.0)
    q["hist_price_cells"] = hist_price_cells

    def hist_price_quantiles(spark, sf):
        """Quantile estimates served FROM the histogram sketch
        (operators/sketches.py hist_quantiles): per priority, the
        p50/p90/p99 bucket at type-1 rank ceil(q·total) and its lower
        edge — true quantile guaranteed inside [est, est + width).
        One window pass over the tiny cell table + one aggregate."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            hist_quantiles, hist_sketch)
        cells = hist_sketch(
            _t(spark, sf, "orders"), "o_orderpriority", "o_totalprice",
            width=25000.0)
        return hist_quantiles(cells, "o_orderpriority",
                              [0.5, 0.9, 0.99], width=25000.0)
    q["hist_price_quantiles"] = hist_price_quantiles

    # ---- training export: deterministic mixture-interleaved order ----
    def interleave_docs_order(spark, sf):
        """Weighted-round-robin training order (operators/sampling.py
        interleave_order): per-language hash-shuffled ranks, stride-
        scheduling virtual time vt = (rank - 0.5)/weight, and the
        global position — the blendable-dataset order a trainer reads
        after mixture_weights picks the ratios. Both rank passes are
        distributed prefix sums (never a global window sort)."""
        from neo4j_document_pipeline_spark.operators.sampling import (
            interleave_order)
        return interleave_order(
            _t(spark, sf, "documents"), "lang", "doc_id",
            weights={"en": 4.0, "zh": 1.0, "de": 1.0,
                     "es": 2.0, "fr": 2.0})
    q["interleave_docs_order"] = interleave_docs_order

    # ---- graph analytics: strongly connected components ----
    def scc_event_graph(spark, sf):
        """Directed SCCs (operators/graphalgo.py
        strongly_connected_components — Orzan-style trim/color/mark,
        the Broder bow-tie decomposition) over the event-transition
        graph: nodes are event_type:hour states, edges each user's
        consecutive transitions — a dense cyclic directed graph with
        tails, so trim, coloring, and backward marking all fire."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            strongly_connected_components)
        e = _t(spark, sf, "events")
        node = F.concat_ws(
            ":", "event_type", F.hour("ts").cast("string"))
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = (e.select("user_id", "ts", "event_id",
                        node.alias("src"))
               .withColumn("dst", F.lead("src").over(w))
               .filter(F.col("dst").isNotNull())
               .select("src", "dst"))
        return (strongly_connected_components(seq)
                .select(F.col("id").alias("node"), "scc"))
    q["scc_event_graph"] = scc_event_graph

    # ---- corpus hygiene: Gopher page-quality rules ----
    def gopher_quality_docs(spark, sf):
        """Gopher page-quality shape statistics + keep verdict
        (operators/corpus.py gopher_quality_filters — Rae et al. 2021
        table A1: word-count band, mean word length, symbol ratio,
        alphabetic-word fraction, bullet/ellipsis line fractions,
        stop-word presence; pure column expressions, one scan).
        Thresholds sized to the synthetic corpus (10-99 words per doc,
        only 'the' from the stop list occurs) so keep splits."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            gopher_quality_filters)
        out = gopher_quality_filters(
            _t(spark, sf, "documents"), "doc_id", "text",
            min_words=40, min_stopwords=1)
        return out.select(
            "doc_id", "n_words",
            F.round("mean_word_len", 6).alias("mean_word_len"),
            F.round("symbol_ratio", 6).alias("symbol_ratio"),
            F.round("alpha_word_frac", 6).alias("alpha_word_frac"),
            F.round("bullet_line_frac", 6).alias("bullet_line_frac"),
            F.round("ellipsis_line_frac", 6).alias("ellipsis_line_frac"),
            "n_stopwords", "keep")
    q["gopher_quality_docs"] = gopher_quality_docs

    # ---- corpus hygiene: fuzzy (whole-document) decontamination ----
    def jaccard_decontam_docs(spark, sf):
        """Fuzzy decontamination (operators/dedup.py
        jaccard_decontam_flags): documents near-duplicate (2-gram
        shingle Jaccard >= 0.1) to ANY benchmark document (source
        'src0') are flagged, with the best-matching bench doc — the
        whole-document companion to the 13-gram overlap pass (catches
        lightly-edited eval copies). Exact inverted-shingle join
        against broadcast bench postings, never corpus²."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            jaccard_decontam_flags)
        d = _t(spark, sf, "documents")
        out = jaccard_decontam_flags(
            d.filter(F.col("source") != "src0"),
            d.filter(F.col("source") == "src0"),
            "doc_id", "text", shingle_words=2, threshold=0.1)
        return out.select(
            "doc_id", "n_grams", "bench_id",
            F.round("jaccard", 6).alias("jaccard"), "flagged")
    q["jaccard_decontam_docs"] = jaccard_decontam_docs

    # ---- sketches: KMV set algebra (theta-sketch overlap) ----
    def kmv_type_overlap(spark, sf):
        """Pairwise user-set overlap between event types computed
        ONLY from their KMV sketches (operators/sketches.py
        kmv_set_ops — theta-sketch set algebra, Beyer et al. 2007):
        union/intersection/Jaccard estimates per type pair, exact
        below sketch saturation (sf0.001: 15 users < k=32 — every
        number exact; sf0.01: 150 users — the estimator regime).
        The raw events are touched once to sketch; the set algebra
        is O(k) array arithmetic per pair."""
        from neo4j_document_pipeline_spark.operators.sketches import (
            kmv_set_ops, kmv_sketch)
        ev = _t(spark, sf, "events")
        sk = kmv_sketch(ev, "event_type", "user_id", k=32)
        t1 = sk.select(F.col("event_type").alias("t1"), "sketch")
        t2 = sk.select(F.col("event_type").alias("t2"), "sketch")
        a = (t1.join(t2.select("t2"), F.col("t1") < F.col("t2"))
             .select("t1", "t2", "sketch"))
        b = (t2.join(t1.select("t1"), F.col("t1") < F.col("t2"))
             .select("t1", "t2", "sketch"))
        out = kmv_set_ops(a, b, ["t1", "t2"], 32)
        return out.select(
            "t1", "t2", "k_used", "n_both",
            F.round("union_est", 4).alias("union_est"),
            F.round("inter_est", 4).alias("inter_est"),
            F.round("jaccard_est", 4).alias("jaccard_est"))
    q["kmv_type_overlap"] = kmv_type_overlap

    # ---- dedup: prefix-filtered EXACT set-similarity join ----
    def prefix_jaccard_pairs(spark, sf):
        """Exact token-set Jaccard pairs at t=0.9 via the SSJoin/PPJoin
        prefix filter (operators/dedup.py prefix_filter_jaccard_pairs):
        tokens ordered by global frequency ascending, candidates only
        from each record's lossless prefix + symmetric length filter,
        exact array verify. Output provably equals the exhaustive
        shared-token join — which is exactly what the oracle runs."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            prefix_filter_jaccard_pairs)
        out = prefix_filter_jaccard_pairs(
            _t(spark, sf, "documents"), "doc_id", "text", threshold=0.9)
        return out.select(
            "id1", "id2", "n1", "n2",
            F.round("jaccard", 6).alias("jaccard"))
    q["prefix_jaccard_pairs"] = prefix_jaccard_pairs

    def containment_doc_pairs(spark, sf):
        """Asymmetric containment pairs (operators/dedup.py::
        containment_pairs): every 7th document gains a derived 'quote'
        doc (first 100 chars, id + 10^6) — a page quoting a snippet of
        a bigger page, the relation Jaccard misses. Output = ordered
        pairs with |A∩B|/|A| >= 0.8; the oracle is the exhaustive
        shared-token join with the same containment arithmetic, so the
        prefix filter's losslessness is what's being proven."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            containment_pairs)
        d = _t(spark, sf, "documents").select("doc_id", "text")
        quotes = (d.filter(F.col("doc_id") % 7 == 0)
                  .select((F.col("doc_id") + 1000000).alias("doc_id"),
                          F.substring("text", 1, 100).alias("text")))
        corpus = d.unionByName(quotes)
        out = containment_pairs(corpus, "doc_id", "text", threshold=0.8)
        return out.select("id_a", "id_b", "n_a", "n_b",
                          F.round("containment", 6).alias("containment"))
    q["containment_doc_pairs"] = containment_doc_pairs

    # ---- temporal: rolling z-score event-rate anomalies ----
    def event_rate_anomalies(spark, sf):
        """Per-type hourly event-rate anomaly scores
        (operators/temporal.py rolling_zscore_anomalies): dense hourly
        grid (silent hours are zero-count rows), trailing-24-bucket
        mean/variance derived from integer sums (bit-replayable), z
        and |z|>=3 flag gated on 8 prior buckets."""
        from neo4j_document_pipeline_spark.operators.temporal import (
            rolling_zscore_anomalies)
        out = rolling_zscore_anomalies(
            _t(spark, sf, "events"), "ts", "event_type",
            bucket="1 hour", window=24, min_periods=8, z_threshold=3.0)
        # NULL stats (not enough priors) surfaced as NaN on both sides
        # — the oracle runner's pandas path renders NULL doubles as
        # NaN, so NaN is the portable "undefined" spelling here
        nan = F.lit(float("nan"))
        return out.select(
            "key", "bucket_ts", "cnt", "n_prior",
            F.coalesce(F.round("mean_prior", 6), nan).alias("mean_prior"),
            F.coalesce(F.round("var_prior", 6), nan).alias("var_prior"),
            F.coalesce(F.round("z", 6), nan).alias("z"), "anomaly")
    q["event_rate_anomalies"] = event_rate_anomalies

    # ---- evaluation: ranking quality (MRR / NDCG@k / P@k / R@k) ----
    def ranking_docs_eval(spark, sf):
        """Per-query ranking metrics (operators/evaluation.py
        ranking_metrics): queries = sources, results = that source's
        docs scored by n_chars (ties broken doc_id asc), graded
        relevance from lang (en=3, de=2, fr=1, else 0). MRR, NDCG@10
        with exponential gains, precision/recall@10, n_rel."""
        from neo4j_document_pipeline_spark.operators.evaluation import (
            ranking_metrics)
        d = _t(spark, sf, "documents")
        res = d.select(F.col("source").alias("query_id"),
                       F.col("doc_id"),
                       F.col("n_chars").cast("double").alias("score"))
        rel = d.select(F.col("source").alias("query_id"),
                       F.col("doc_id"),
                       F.when(F.col("lang") == "en", 3.0)
                       .when(F.col("lang") == "de", 2.0)
                       .when(F.col("lang") == "fr", 1.0)
                       .otherwise(0.0).alias("rel"))
        out = ranking_metrics(res, rel, k=10)
        return out.select(
            "query_id", F.round("mrr", 6).alias("mrr"),
            F.round("ndcg", 6).alias("ndcg"),
            F.round("precision_k", 6).alias("precision_k"),
            F.round("recall_k", 6).alias("recall_k"), "n_rel")
    q["ranking_docs_eval"] = ranking_docs_eval

    # ---- evaluation: per-class precision/recall/F1 ----
    def classification_lang_eval(spark, sf):
        """Per-class classifier report (operators/evaluation.py
        classification_report) over a deterministic noisy predictor:
        pred = 'en' when n_chars % 7 == 0 else the true lang — so
        every class has off-diagonal mass and 'en' over-predicts."""
        from neo4j_document_pipeline_spark.operators.evaluation import (
            classification_report)
        d = _t(spark, sf, "documents")
        pairs = d.select(
            F.col("lang").alias("label"),
            F.when(F.col("n_chars") % 7 == 0, F.lit("en"))
            .otherwise(F.col("lang")).alias("pred"))
        out = classification_report(pairs)
        return out.select(
            "cls", F.round("precision", 6).alias("precision"),
            F.round("recall", 6).alias("recall"),
            F.round("f1", 6).alias("f1"), "support")
    q["classification_lang_eval"] = classification_lang_eval

    # ---- data quality: one-pass column profile ----
    def profile_documents(spark, sf):
        """Column census of the documents table
        (operators/profile.py profile_columns): per column row/null
        counts, lexicographic string min/max, schema-typed numeric
        min/max/mean, and the deterministic sha256-KMV distinct
        estimate (exact below k=64 — lang/source here; the estimator
        regime for doc_id/text/n_chars)."""
        from neo4j_document_pipeline_spark.operators.profile import (
            profile_columns)
        out = profile_columns(_t(spark, sf, "documents"), k=64)
        # non-numeric columns have NULL numeric stats -> NaN on both
        # sides (the oracle runner's pandas path renders NULL doubles
        # as NaN)
        nan = F.lit(float("nan"))
        return out.select(
            "col_name", "n_rows", "n_null",
            F.round("null_frac", 6).alias("null_frac"),
            F.round("distinct_est", 6).alias("distinct_est"),
            "distinct_exact", "min_str", "max_str",
            F.coalesce("min_num", nan).alias("min_num"),
            F.coalesce("max_num", nan).alias("max_num"),
            F.coalesce(F.round("mean_num", 6), nan).alias("mean_num"))
    q["profile_documents"] = profile_documents

    # ---- corpus analytics: n-gram diversity (mode-collapse probe) ----
    def ngram_diversity_sources(spark, sf):
        """Distinct/total n-gram ratios per source for n=1,2,3
        (operators/corpus.py ngram_diversity): the corpus-level
        Self-BLEU complement — duplicated phrasing in a synthetic or
        boilerplate-heavy source drags diversity toward 0 long before
        exact dedup fires. One tagged explode, one aggregate."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            ngram_diversity)
        return (ngram_diversity(
            _t(spark, sf, "documents"), "source", "text", ns=(1, 2, 3))
            .select("source", "n", "total_grams", "distinct_grams",
                    F.round("diversity", 6).alias("diversity")))
    q["ngram_diversity_sources"] = ngram_diversity_sources

    # ---- corpus IR: Okapi BM25 document search ----
    def bm25_doc_search(spark, sf):
        """BM25 relevance of every document to a fixed bag-of-words
        query (operators/corpus.py bm25_scores — Lucene idf form, tf
        saturation k1=1.2, length normalization b=0.75): the
        document-level retrieval scorer; matching tokens are filtered
        BEFORE the tf shuffle, N/avgdl folded in-plan."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            bm25_scores)
        return (bm25_scores(_t(spark, sf, "documents"), "doc_id",
                            "text", "spark join order table")
                .select("doc_id", "n_hit",
                        F.round("score", 6).alias("score")))
    q["bm25_doc_search"] = bm25_doc_search

    # ---- corpus hygiene: benchmark decontamination ----
    def decontam_overlap(spark, sf):
        """GPT-3/PaLM-style decontamination flags: documents from
        source 'src0' act as the benchmark set; every other document is
        scored by what fraction of its distinct word 4-grams appear in
        the benchmark (operators/dedup.py ngram_overlap_flags —
        broadcast bench grams, per-row array_distinct, one hash agg)."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            ngram_overlap_flags)
        d = _t(spark, sf, "documents")
        out = ngram_overlap_flags(
            d.filter(F.col("source") != "src0"),
            d.filter(F.col("source") == "src0"),
            "doc_id", "text", n=4)
        return out.select(
            "doc_id", "n_grams", "n_hit",
            F.round("overlap_frac", 6).alias("overlap_frac"), "flagged")
    q["decontam_overlap"] = decontam_overlap

    # ---- corpus hygiene: Bloom-prefiltered decontamination ----
    def decontam_bloom(spark, sf):
        """The SAME decontamination answer reached through a broadcast
        Bloom filter of the bench grams (operators/dedup.py
        ngram_overlap_flags_bloom): definite-miss grams are dropped
        narrowly (k broadcast joins + bit tests, no shuffle of the
        corpus gram stream) and only survivors reach the exact verify
        join — lossless by the no-false-negative guarantee, so the
        ORACLE here is the exact decontamination SQL itself."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            ngram_overlap_flags_bloom)
        d = _t(spark, sf, "documents")
        out = ngram_overlap_flags_bloom(
            d.filter(F.col("source") != "src0"),
            d.filter(F.col("source") == "src0"),
            "doc_id", "text", n=4,
            bloom_bits=1 << 16, bloom_hashes=3)
        return out.select(
            "doc_id", "n_grams", "n_hit",
            F.round("overlap_frac", 6).alias("overlap_frac"), "flagged")
    q["decontam_bloom"] = decontam_bloom

    # ---- corpus hygiene: CCNet-style cross-document line dedup ----
    def line_dedup_docs(spark, sf):
        """Cross-document boilerplate-line removal (CCNet §4.1): the
        single-line synthetic corpus is first deterministically
        re-segmented into pseudo-lines of 3 words, then every line
        whose trimmed form appears in >= 2 distinct documents is
        removed from all of them (operators/dedup.py
        dedup_lines_across_docs — sha2 line keys, two even shuffles)."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            dedup_lines_across_docs)
        d = _t(spark, sf, "documents")
        toks = F.split(F.col("text"), " ")
        nseg = F.ceil(F.size(toks) / F.lit(3.0)).cast("int")
        segs = F.transform(
            F.sequence(F.lit(1), nseg),
            lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * 3 + 1, 3)))
        ml = d.select("doc_id", F.concat_ws("\n", segs).alias("text"))
        return dedup_lines_across_docs(ml, "doc_id", "text")
    q["line_dedup_docs"] = line_dedup_docs

    # ---- training-data export: reproducible stratified sampling ----
    def stratified_sample_docs(spark, sf):
        """Corpus-mixing downsample: per-language keep rates applied via
        a sha256 hash threshold (operators/sampling.py) — a pure
        function of the data, so the sample is identical across
        partitionings, cluster sizes, and re-runs (df.sample(seed) is
        none of those). Oracle computes the IDENTICAL hash draw."""
        from neo4j_document_pipeline_spark.operators.sampling import (
            stratified_sample)
        d = _t(spark, sf, "documents")
        return stratified_sample(
            d, {"en": 0.5, "zh": 0.9, "de": 0.25}, "lang",
            default_rate=0.1).select("doc_id", "lang")
    q["stratified_sample_docs"] = stratified_sample_docs

    # ---- tokenizer training: distributed BPE vocabulary learning ----

    def bpe_merges_docs(spark, sf):
        """Three BPE merge rounds learned over the document corpus
        (operators/bpe.py): exact-integer pair counts over the word
        vocabulary, deterministic (count DESC, left, right) argmax, one
        literal delimiter-rewrite per round. Oracle unrolls the
        identical rounds as CTEs — same tokenization, same double-space
        rewrite, same tie-breaks."""
        from neo4j_document_pipeline_spark.operators.bpe import bpe_learn
        merges, _ = bpe_learn(_t(spark, sf, "documents"), "text", rounds=3)
        return merges
    q["bpe_merges_docs"] = bpe_merges_docs

    def bpe_vocab_segments(spark, sf):
        """The 100 most frequent words' symbol sequences after those
        three merges — the segmentation the learned tokenizer would
        emit (ties at the boundary break on word, both engines)."""
        from neo4j_document_pipeline_spark.operators.bpe import bpe_learn
        _, vocab = bpe_learn(_t(spark, sf, "documents"), "text", rounds=3)
        return vocab.orderBy(F.desc("freq"), "word").limit(100)
    q["bpe_vocab_segments"] = bpe_vocab_segments

    def predicate_cardinality_kg(spark, sf):
        """KG schema census (operators/kgschema.py) over a five-
        predicate triple mix covering every cardinality class: placed
        (1:N), placed_by / branded (N:1), contains (N:M), same_as
        (1:1). One row per predicate with exact fan-out maxima."""
        from neo4j_document_pipeline_spark.operators.kgschema import (
            predicate_cardinality)
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        p = _t(spark, sf, "part")
        c = _t(spark, sf, "customer")
        sv = lambda pre, col: F.concat(F.lit(pre), F.col(col)  # noqa: E731
                                       .cast("string"))
        triples = (
            o.select(sv("order:", "o_orderkey").alias("subject"),
                     F.lit("placed_by").alias("predicate"),
                     sv("cust:", "o_custkey").alias("object"))
            .unionByName(o.select(
                sv("cust:", "o_custkey").alias("subject"),
                F.lit("placed").alias("predicate"),
                sv("order:", "o_orderkey").alias("object")))
            .unionByName(li.select(
                sv("order:", "l_orderkey").alias("subject"),
                F.lit("contains").alias("predicate"),
                sv("part:", "l_partkey").alias("object")))
            .unionByName(p.select(
                sv("part:", "p_partkey").alias("subject"),
                F.lit("branded").alias("predicate"),
                sv("brand:", "p_brand").alias("object")))
            .unionByName(c.select(
                sv("cust:", "c_custkey").alias("subject"),
                F.lit("same_as").alias("predicate"),
                sv("dup:", "c_custkey").alias("object"))))
        return predicate_cardinality(triples)
    q["predicate_cardinality_kg"] = predicate_cardinality_kg

    def redirect_resolution(spark, sf):
        """URL-canonicalization shape: a deterministic redirect map
        over customer keys (every key not divisible by 16 redirects to
        key-1 — chains up to 15 deep) resolved to terminals by pointer
        doubling (operators/components.py::resolve_pointer_chains,
        ceil(log2 L) joins). Oracle walks the same chains with a
        recursive CTE and keeps the hop that leaves the source set."""
        from neo4j_document_pipeline_spark.operators.components import (
            resolve_pointer_chains)
        c = _t(spark, sf, "customer")
        edges = (c.filter(F.col("c_custkey") % 16 != 0)
                 .select(F.concat(F.lit("u"), F.col("c_custkey")
                                  .cast("string")).alias("src"),
                         F.concat(F.lit("u"), (F.col("c_custkey") - 1)
                                  .cast("string")).alias("dst")))
        return resolve_pointer_chains(edges)
    q["redirect_resolution"] = redirect_resolution

    def hard_negative_mining(spark, sf):
        """Contrastive hard negatives (operators/similarity.py): for
        each of 8 anchor vectors, the 5 most-similar vectors with a
        different label, ranked on the rounded cosine with id
        tie-break — the negatives a triplet loss actually learns
        from."""
        from neo4j_document_pipeline_spark.operators.similarity import (
            hard_negatives)
        e = _t(spark, sf, "embeddings")
        anchors = e.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("aid"), F.col("embedding").alias("av"),
            F.col("label").alias("al"))
        return hard_negatives(e, anchors, "vec_id", "embedding", "label",
                              "aid", "av", "al", k=5)
    q["hard_negative_mining"] = hard_negative_mining

    def feature_propagation_parts(spark, sf):
        """Two rounds of SGC feature smoothing over the co-purchase
        graph (operators/graphalgo.py::feature_propagation): part
        prices in integer cents, self-inclusive neighborhood mean with
        truncating division — bit-exact on any partitioning, so the
        oracle unrolls the identical integer rounds."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            feature_propagation)
        feats = _t(spark, sf, "part").select(
            F.col("p_partkey").cast("string").alias("id"),
            F.floor(F.col("p_retailprice") * 100).alias("f"))
        return feature_propagation(_copurchase_edges(spark, sf), feats,
                                   rounds=2)
    q["feature_propagation_parts"] = feature_propagation_parts

    def rrf_multiquery_fusion(spark, sf):
        """Reciprocal-rank fusion (operators/retrieval.py::rrf_fuse)
        of two query-expansion channels: cosine rankings against vec 0
        and vec 1 (top 20 each, rounded-cosine rank with id tie-break),
        fused at k=60, top 15 — rank-based, so no score normalization
        between channels is needed."""
        from pyspark.sql import Window
        from neo4j_document_pipeline_spark.operators.retrieval import (
            rrf_fuse)
        from neo4j_document_pipeline_spark.operators.similarity import (
            pairwise_cosine)
        e = _t(spark, sf, "embeddings")
        chans = []
        for qid in (0, 1):
            qv = e.filter(F.col("vec_id") == qid).select(
                F.col("embedding").alias("qv"))
            scored = e.crossJoin(F.broadcast(qv)).select(
                "vec_id",
                F.round(pairwise_cosine(F.col("embedding"),
                                        F.col("qv")), 4).alias("s"))
            w = Window.orderBy(F.col("s").desc(), "vec_id")
            chans.append(scored.withColumn("rank", F.row_number().over(w))
                         .filter(F.col("rank") <= 20)
                         .select("vec_id", "rank"))
        return rrf_fuse(chans, id_col="vec_id", k=60, top=15)
    q["rrf_multiquery_fusion"] = rrf_multiquery_fusion

    def negative_triples_branded(spark, sf):
        """Deterministic filtered negative sampling for KG-embedding
        training (operators/kgtrain.py): corrupt the branded-triple
        objects with sha256-drawn brands, drop self-replacements and
        true facts, keep the first 2 surviving attempts per triple.
        The brand pool is densely indexed by row_number over the
        distinct brands (25 — a window over a tiny frame)."""
        from neo4j_document_pipeline_spark.operators.kgtrain import (
            negative_triples)
        from pyspark.sql import Window
        p = _t(spark, sf, "part")
        triples = p.select(
            F.concat(F.lit("part:"), F.col("p_partkey").cast("string"))
            .alias("subject"),
            F.lit("branded").alias("predicate"),
            F.col("p_brand").alias("object"))
        pool = (p.select(F.col("p_brand").alias("entity")).distinct()
                .withColumn("idx", F.row_number().over(
                    Window.orderBy("entity")) - 1))
        n = pool.count()  # tiny frame; the operator itself never counts
        return negative_triples(triples, pool, pool_size=n, n_neg=2,
                                attempts=6)
    q["negative_triples_branded"] = negative_triples_branded

    def neighborhood_samples_parts(spark, sf):
        """Deterministic GraphSAGE neighbor sampling (operators/
        kgtrain.py::sample_neighborhoods) over the part co-purchase
        graph: seeds = parts with key <= 50, fanouts (3, 2). Every
        sampled edge is the top-fanout of a sha256 rank, so the oracle
        unrolls both hops with the IDENTICAL hash ordering — the whole
        draw is bit-replayable."""
        from neo4j_document_pipeline_spark.operators.kgtrain import (
            sample_neighborhoods)
        li = _t(spark, sf, "lineitem")
        pairs = (li.alias("a").join(li.alias("b"),
                                    (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
                 .select(F.col("a.l_partkey").cast("string").alias("src"),
                         F.col("b.l_partkey").cast("string").alias("dst"))
                 .distinct())
        seeds = (li.filter(F.col("l_partkey") <= 50)
                 .select(F.col("l_partkey").cast("string").alias("id"))
                 .distinct())
        return sample_neighborhoods(pairs, seeds, [3, 2])
    q["neighborhood_samples_parts"] = neighborhood_samples_parts

    def _balpart_inputs(spark, sf):
        li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 120)
        edges = (li.alias("a").join(li.alias("b"),
                                    (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
                 .select(F.col("a.l_partkey").cast("string").alias("u"),
                         F.col("b.l_partkey").cast("string").alias("v"))
                 .distinct())
        return edges

    def balanced_partition_parts(spark, sf):
        """Spinner-style balanced 4-way partitioning (operators/
        layout.py::balanced_partitions), 2 rounds over the bounded part
        co-purchase graph. Exact-integer scores make every round
        bit-replayable — the oracle unrolls both rounds as CTEs."""
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions)
        return balanced_partitions(_balpart_inputs(spark, sf), 4, iters=2)
    q["balanced_partition_parts"] = balanced_partition_parts

    def partition_cut_parts(spark, sf):
        """Edge-cut census (operators/layout.py::edge_cut_stats) of the
        committed 2-round assignment — the placement evidence a layout
        decision records: cut fraction + load spread in one row."""
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions, edge_cut_stats)
        edges = _balpart_inputs(spark, sf)
        return edge_cut_stats(edges, balanced_partitions(edges, 4, iters=2))
    q["partition_cut_parts"] = partition_cut_parts

    def sq8_topk_vecs(spark, sf):
        """Asymmetric SQ8 search (operators/similarity.py::sq8_topk):
        the corpus resides as 8-bit codes (4x smaller than float32 —
        the faiss SQ8 memory rung below IVFPQ), the query stays float,
        scores are cosine(query, decode(codes)). The oracle replays the
        IDENTICAL min/max codebook, floor(t*255+0.5) encode, and decode
        in SQL — the quantization arithmetic itself is what's proven,
        not a rerank that hides it."""
        from neo4j_document_pipeline_spark.operators.similarity import (
            sq8_topk)
        e = _t(spark, sf, "embeddings")
        qv = [float(x) for x in
              e.filter(F.col("vec_id") == 0).first()["embedding"]]
        return sq8_topk(e, "vec_id", "embedding", qv, 10, round_scores=4)
    q["sq8_topk_vecs"] = sq8_topk_vecs

    def roc_auc_orders(spark, sf):
        """Exact tie-aware ROC-AUC (operators/evaluation.py::roc_auc)
        of o_totalprice as a score for urgent orders — the rank-sum
        form with ties at half credit; the aggregate-then-order shape
        keeps the global sort on |distinct scores| rows. Oracle runs
        the identical per-score window arithmetic."""
        from neo4j_document_pipeline_spark.operators.evaluation import (
            roc_auc)
        o = _t(spark, sf, "orders").select(
            (F.col("o_orderpriority") == "1-URGENT").cast("int")
            .alias("label"),
            F.round("o_totalprice", -3).alias("score"))
        out = roc_auc(o)
        return out.select(F.round("auc", 6).alias("auc"),
                          "positives", "negatives")
    q["roc_auc_orders"] = roc_auc_orders

    def chi2_lang_terms(spark, sf):
        """Chi-squared term selection (operators/classify.py::
        chi2_terms): top-5 class-discriminative terms per language over
        the documents table, exact-integer contingency counts incl. the
        absent-term grid (a=0 terms CAN top a class). Oracle replays
        the full grid and the (chi2 DESC, term) window."""
        from neo4j_document_pipeline_spark.operators.classify import (
            chi2_terms)
        out = chi2_terms(_t(spark, sf, "documents"), "doc_id", "text",
                         "lang", top_k=5, min_doc_freq=2)
        return out.select("label", "term",
                          F.round("chi2", 6).alias("chi2"),
                          "a", "df_t", "n_class")
    q["chi2_lang_terms"] = chi2_lang_terms

    def psi_lang_drift(spark, sf):
        """PSI distribution drift (operators/profile.py::psi_drift) of
        the language mix between the even- and odd-id document halves —
        the per-batch monitoring census of a continuously-ingesting
        corpus. Smoothed per-category (p-q)·ln(p/q) terms; the oracle
        replays the identical null-safe union + smoothing arithmetic."""
        from neo4j_document_pipeline_spark.operators.profile import (
            psi_drift)
        d = _t(spark, sf, "documents")
        out = psi_drift(d.filter(F.col("doc_id") % 2 == 0),
                        d.filter(F.col("doc_id") % 2 == 1), "lang")
        return out.select("category", "n_base", "n_cur",
                          F.round("p_base", 6).alias("p_base"),
                          F.round("p_cur", 6).alias("p_cur"),
                          F.round("psi_term", 6).alias("psi_term"))
    q["psi_lang_drift"] = psi_lang_drift

    def _matching_edges(spark, sf):
        li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 400)
        return (li.alias("a").join(li.alias("b"),
                                   (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                                   & (F.col("a.l_partkey") < F.col("b.l_partkey")))
                .select(F.col("a.l_partkey").cast("string").alias("u"),
                        F.col("b.l_partkey").cast("string").alias("v"))
                .distinct())

    def matching_parts(spark, sf):
        """Deterministic Luby maximal matching (operators/graphalgo.py::
        maximal_matching) over the bounded part co-purchase graph —
        the pairing step of multilevel coarsening. The oracle unrolls
        4 rounds with the identical edge-priority argmin and returns
        ZERO rows unless the active set is empty after round 4 (loud
        convergence guard, the k_core/k_truss honesty contract)."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            maximal_matching)
        return maximal_matching(_matching_edges(spark, sf))
    q["matching_parts"] = matching_parts

    def coarsen_parts(spark, sf):
        """One multilevel-coarsening contraction (operators/
        graphalgo.py::coarsen_graph) over the same graph: matched pairs
        collapse to their string-least endpoint, coarse edge weights
        count the original canonical edges they aggregate."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            coarsen_graph)
        coarse, _ = coarsen_graph(_matching_edges(spark, sf))
        return coarse
    q["coarsen_parts"] = coarsen_parts

    def multilevel_partition_parts(spark, sf):
        """Multilevel balanced partitioning (operators/layout.py::
        multilevel_partitions, the METIS scheme): one coarsen level
        (matching salt 'part:m0'), 2 Spinner rounds on the coarse
        graph, projection through the node map, 1 refinement round on
        the full graph seeded by the projection. The oracle chains the
        matching, contraction, coarse-round, projection, and
        refine-round CTEs — the entire composition is bit-replayable."""
        from neo4j_document_pipeline_spark.operators.layout import (
            multilevel_partitions)
        return multilevel_partitions(_matching_edges(spark, sf), 4,
                                     levels=1, coarse_iters=2,
                                     refine_iters=1)
    q["multilevel_partition_parts"] = multilevel_partition_parts

    def orders_snapshot_diff(spark, sf):
        """Snapshot change feed (operators/admin.py::table_diff): the
        'old' snapshot drops keys %7==0 and doubles totalprice on
        %5==0; the 'new' snapshot drops %11==0 — so the diff must
        report exactly the adds, removes, and price changes, with the
        changed column named."""
        from neo4j_document_pipeline_spark.operators.admin import (
            table_diff)
        o = _t(spark, sf, "orders")
        old = (o.filter(F.col("o_orderkey") % 7 != 0)
               .withColumn("o_totalprice",
                           F.when(F.col("o_orderkey") % 5 == 0,
                                  F.col("o_totalprice") * 2)
                           .otherwise(F.col("o_totalprice"))))
        new = o.filter(F.col("o_orderkey") % 11 != 0)
        return table_diff(old, new, ["o_orderkey"],
                          ["o_totalprice", "o_orderstatus"])
    q["orders_snapshot_diff"] = orders_snapshot_diff

    def power_law_parts(spark, sf):
        """Degree-tail exponent of the co-purchase graph by discrete
        MLE (operators/graphalgo.py::power_law_alpha) — the skew
        number that decides whether hub caps and salting are
        mandatory. One row; oracle replays the identical formula."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            power_law_alpha)
        return power_law_alpha(_copurchase_edges(spark, sf), dmin=2)
    q["power_law_parts"] = power_law_parts

    def basket_rules_orders(spark, sf):
        """Directed pairwise association rules over order baskets
        (operators/assoc.py): support/confidence/lift from exact
        counts, basket denominator folded in-plan, tail pruned at
        pair_count >= 2 before the ratio math."""
        from neo4j_document_pipeline_spark.operators.assoc import (
            market_basket_rules)
        li = _t(spark, sf, "lineitem").select(
            F.col("l_orderkey").alias("basket"),
            F.col("l_partkey").alias("item"))
        return market_basket_rules(li, min_pair_count=2,
                                   min_confidence=0.08)
    q["basket_rules_orders"] = basket_rules_orders

    # ---- training-data export: quality-weighted draw (A-ES) ----
    def weighted_sample_docs(spark, sf):
        """Weighted sampling WITHOUT replacement: 64 documents drawn
        with probability ~ token count via the deterministic
        Efraimidis–Spirakis key pow(u, 1/w) over the same sha256 hash
        draw (operators/sampling.py::weighted_sample) — reproducible
        across partitionings/cluster sizes. Oracle ranks the IDENTICAL
        key expression."""
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count)
        from neo4j_document_pipeline_spark.operators.sampling import (
            weighted_sample)
        d = _t(spark, sf, "documents").select(
            "doc_id", col_token_count(F.col("text")).alias("n_tok"))
        return weighted_sample(d, 64, "n_tok", id_col="doc_id")
    q["weighted_sample_docs"] = weighted_sample_docs

    # ---- training-data export: temperature-scaled source mixing ----
    def mixture_weights_docs(spark, sf):
        """Per-source pretraining mixture weights at temperature
        alpha = 0.5 with a 1M-token budget (operators/corpus.py::
        mixture_weights): weight ∝ sqrt(source tokens), epochs = the
        implied passes over each source. The smoothed scores are
        fixed-pointed to 1e-6 BEFORE the normalizing sum, so the
        denominator is an exact integer in any summation order —
        the oracle reproduces every ratio bit-for-bit."""
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count)
        from neo4j_document_pipeline_spark.operators.corpus import (
            mixture_weights)
        d = _t(spark, sf, "documents").select(
            "source", col_token_count(F.col("text")).alias("n_tok"))
        return mixture_weights(d, "source", "n_tok", alpha=0.5,
                               budget_tokens=1_000_000)
    q["mixture_weights_docs"] = mixture_weights_docs

    # ---- training-data export: token-budget shard packing ----
    def token_shard_docs(spark, sf):
        """Documents packed into ~4096-token shards in doc_id order via
        the distributed prefix sum (operators/sampling.py token_shards
        — range shuffle + per-partition offsets + one narrow pass, NO
        global-window sort). Oracle is the global-window SQL form of
        the same prefix sum."""
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count)
        from neo4j_document_pipeline_spark.operators.sampling import (
            token_shards)
        d = _t(spark, sf, "documents").select(
            "doc_id", col_token_count(F.col("text")).alias("n_tok"))
        return token_shards(d, budget=4096)
    q["token_shard_docs"] = token_shard_docs

    # ---- textstats: language id (engine function) ----
    def lang_id(spark, sf):
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_lang_id)
        return _t(spark, sf, "documents").select(
            "doc_id", col_lang_id(F.col("text")).alias("lang_pred"))
    q["lang_id"] = lang_id

    # ---- textstats: quality score (engine function) ----
    def quality_scores(spark, sf):
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_quality_score)
        return _t(spark, sf, "documents").select(
            "doc_id", F.round(col_quality_score(F.col("text")), 2).alias("quality"))
    q["quality_scores"] = quality_scores

    # ---- textstats: order-insensitive fingerprint (engine function) ----
    def doc_fingerprints(spark, sf):
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_fingerprint)
        return _t(spark, sf, "documents").select(
            "doc_id", col_fingerprint(F.col("text")).alias("fingerprint"))
    q["doc_fingerprints"] = doc_fingerprints

    # ---- exact dedup groups ----
    def exact_dup_groups(spark, sf):
        d = _t(spark, sf, "documents")
        return (d.groupBy(F.sha2("text", 256).alias("content_hash"))
                .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
                .filter(F.col("n_dups") > 1))
    q["exact_dup_groups"] = exact_dup_groups

    # ---- streaming-shape: fixed-window event aggregation ----
    def events_5min_windows(spark, sf):
        e = _t(spark, sf, "events")
        # bigint epoch seconds, not a timestamp: DuckDB's to_timestamp()
        # yields TIMESTAMPTZ which schema-mismatches Spark's naive
        # timestamp in the driver compare (VERDICT r1 red row).
        win = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long")
        return (e.groupBy(win.alias("win_start"), "event_type")
                .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")))
    q["events_5min_windows"] = events_5min_windows

    # ---- sessionization (gap > 30 min) ----
    def sessionize_events(spark, sf):
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        # microsecond-precision gap: events.ts carries sub-second parts;
        # unix_timestamp() truncates to whole seconds while the DuckDB
        # oracle's epoch() is fractional, so gaps straddling 1800s split
        # sessions differently (VERDICT r1 red row). timestampdiff is
        # exact-integer, works on TIMESTAMP_NTZ, and is timezone-free
        # (oracle uses epoch_us()).
        gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
        newsess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
        sess = F.sum(newsess).over(w.rowsBetween(Window.unboundedPreceding, 0))
        return (e.withColumn("session_id", sess)
                .groupBy("user_id", "session_id")
                .agg(F.count("*").alias("n_events"))
                )
    q["sessionize_events"] = sessionize_events

    # ---- §2.9: Spark-native session_window sessionization ----
    def session_window_events(spark, sf):
        """F.session_window — single hash-agg with in-operator session
        merge (no per-user sort window); [start, last+gap) boundary
        semantics, oracled by the gaps-and-islands SQL with diff >= gap
        starting a new session."""
        from neo4j_document_pipeline_spark.streaming.ingest import (
            session_windows)
        out = session_windows(_t(spark, sf, "events"))
        return out.select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events")
    q["session_window_events"] = session_window_events

    # ---- §2.9: stream-stream interval join (attribution) ----
    def attributed_clicks(spark, sf):
        """Each click paired with every same-user view in the preceding
        12 hours — the watermark-bounded stream-stream join shape
        (streaming/ingest.attribution_pairs), run here on the static
        frame (identical plan semantics; the streaming side is covered
        by tests/test_streaming.py). Timestamps exported as epoch
        micros so the compare is timezone-free."""
        from neo4j_document_pipeline_spark.streaming.ingest import (
            attribution_pairs)
        out = attribution_pairs(_t(spark, sf, "events"),
                                max_delay="12 hours")
        return out.select(
            "user_id", "trig_id",
            F.unix_micros("trig_ts").alias("trig_us"),
            "base_id", F.unix_micros("base_ts").alias("base_us"))
    q["attributed_clicks"] = attributed_clicks

    # ---- §2.9: watermarked exactly-once dedup ----
    def dedup_event_replay(spark, sf):
        """At-least-once delivery simulated by replaying the whole
        events table once; dedup_event_stream collapses the re-delivery
        (event_id key), so the per-type stats equal the clean table's.
        The streaming path (dropDuplicatesWithinWatermark, bounded
        state) is exercised in tests/test_streaming.py."""
        from neo4j_document_pipeline_spark.streaming.ingest import (
            dedup_event_stream)
        e = _t(spark, sf, "events")
        out = dedup_event_stream(e.unionByName(e))
        return out.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.round(F.sum("value"), 4).alias("v"))
    q["dedup_event_replay"] = dedup_event_replay

    # ---- O4: recency ordering ----
    def recent_orders(spark, sf):
        return (_t(spark, sf, "orders")
                .orderBy(F.col("o_orderdate").desc(), "o_orderkey")
                .select("o_orderkey", "o_orderdate").limit(20))
    q["recent_orders"] = recent_orders

    # ---- P4: regex entity search ----
    def regex_part_search(spark, sf):
        p = _t(spark, sf, "part")
        return (p.filter(F.lower(F.col("p_name")).contains("ge"))
                .select("p_partkey", "p_name")
                .orderBy("p_partkey").limit(50))
    q["regex_part_search"] = regex_part_search

    # ---- flagship KG extraction vs frozen golden fixtures ----
    def kg_triples_documents(spark, sf):
        """Spark extraction over the EXACT fixture corpus; the oracle reads
        the frozen golden JSON (fixtures/triples/), so the driver gate now
        asserts the full (doc_id, subject, rel_type, object, object_kind)
        set — the same P/R=1.00 parity the pytest golden gate proves."""
        from neo4j_document_pipeline_spark.functions.text import col_norm_space
        from neo4j_document_pipeline_spark.operators.ingest import (
            chunks_to_triples, documents_to_chunks, pages_to_documents)
        from neo4j_document_pipeline_spark.sources.pages import (
            _FIXTURE_PATHS, make_text)
        from scripts.freeze_fixtures import N_SYNTH
        rows = []
        for i, p in enumerate(_FIXTURE_PATHS):
            with open(p, encoding="utf-8") as f:
                rows.append((f"u{i:04d}", f.read()))
        for i in range(2, N_SYNTH):
            rows.append((f"u{i:04d}", make_text(i)))
        pages = spark.createDataFrame(rows, "url string, text string")
        tr = chunks_to_triples(documents_to_chunks(pages_to_documents(pages)))
        return (tr.select(
            "doc_id",
            col_norm_space(F.col("subject")).alias("subject"),
            "rel_type",
            col_norm_space(F.col("object")).alias("object"),
            "object_kind").distinct())
    q["kg_triples_documents"] = kg_triples_documents

    def minhash_near_dups(spark, sf):
        from neo4j_document_pipeline_spark.operators.dedup import (
            minhash_near_duplicates)
        # deterministic ≤500-doc subset (smallest doc_ids; doc_id is
        # unique) so the oracle can pin the SAME corpus at any sf — a bare
        # .limit(500) is an arbitrary subset and row counts diverge at sf0.1
        d = (_t(spark, sf, "documents").select("doc_id", "text")
             .orderBy("doc_id").limit(500))
        return minhash_near_duplicates(d, "doc_id", "text", jaccard_threshold=0.8) \
            .withColumn("jaccard", F.round("jaccard", 4))
    q["minhash_near_dups"] = minhash_near_dups

    def near_dup_resolution(spark, sf):
        """End-to-end near-dup RESOLUTION over the same ≤500-doc subset
        minhash_near_dups pins: pairs -> transitive clusters -> keep the
        minimum id per cluster. Ids are zero-padded to 9 digits so the
        operator's STRING component minimum equals the oracle's numeric
        one. Oracle = the exact-Jaccard pair kernel + a recursive-CTE
        transitive closure + least(node, min(reachable))."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            resolve_near_duplicates)
        d = (_t(spark, sf, "documents").select("doc_id", "text")
             .orderBy("doc_id").limit(500)
             .select(F.lpad(F.col("doc_id").cast("string"), 9, "0")
                     .alias("doc_id"), "text"))
        return resolve_near_duplicates(d, "doc_id", "text",
                                       jaccard_threshold=0.8)
    q["near_dup_resolution"] = near_dup_resolution

    def leakage_split_docs(spark, sf):
        """Leakage-safe train/val/test assignment over the same padded
        ≤500-doc subset: near-dup CLUSTERS (not documents) take the
        engine's sha256 uniform draw, so near-duplicate pairs can never
        straddle an eval boundary. Oracle = the near-dup-resolution
        recursive closure for the cluster map + the identical hash draw
        + cumulative CASE bounds."""
        from neo4j_document_pipeline_spark.operators.sampling import (
            leakage_safe_split)
        d = (_t(spark, sf, "documents").select("doc_id", "text")
             .orderBy("doc_id").limit(500)
             .select(F.lpad(F.col("doc_id").cast("string"), 9, "0")
                     .alias("doc_id"), "text"))
        return leakage_safe_split(
            d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
            text_col="text", jaccard_threshold=0.8,
        ).select("doc_id", "split_key", "split")
    q["leakage_split_docs"] = leakage_split_docs

    def ngram_jaccard_exact(spark, sf):
        """Exhaustive shared-shingle Jaccard (no LSH recall loss) — the
        all-pairs SQL IS a faithful oracle here, unlike the banded path
        below its design threshold."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            ngram_jaccard_exact as nje)
        d = (_t(spark, sf, "documents").select("doc_id", "text")
             .orderBy("doc_id").limit(500))
        return nje(d, "doc_id", "text", threshold=0.4) \
            .withColumn("jaccard", F.round("jaccard", 4))
    q["ngram_jaccard_exact"] = ngram_jaccard_exact

    def tfidf_name_links(spark, sf):
        """North-star entity-linking scorer: TF-IDF cosine over
        normalized-name char-3-gram shingles, EXHAUSTIVE candidates
        (cos>0 iff a shingle is shared), so all-pairs SQL is a faithful
        oracle (operators/linking.py::tfidf_cosine_links_exact — the
        same scoring link_entities(score='tfidf') applies after LSH
        blocking)."""
        from neo4j_document_pipeline_spark.operators.linking import (
            tfidf_cosine_links_exact)
        p = (_t(spark, sf, "part")
             .orderBy("p_partkey").limit(300)
             .select(F.lpad(F.col("p_partkey").cast("string"), 9, "0")
                     .alias("pid"), "p_name"))
        return (tfidf_cosine_links_exact(p, "pid", "p_name",
                                         threshold=0.7)
                .select("id1", "id2", F.round("sim", 4).alias("sim")))
    q["tfidf_name_links"] = tfidf_name_links

    def fuzzy_name_pairs(spark, sf):
        """Edit-distance similarity join over customer names
        (operators/fuzzyjoin.py edit_distance_pairs): every unordered
        pair within Levenshtein distance 1, via the LOSSLESS q-gram /
        length-band blocking — so the oracle is the EXHAUSTIVE
        cross-join SQL, checking blocking against ground truth rather
        than a replay of itself."""
        from neo4j_document_pipeline_spark.operators.fuzzyjoin import (
            edit_distance_pairs)
        return edit_distance_pairs(
            _t(spark, sf, "customer"), "c_name", max_dist=1, q=2)
    q["fuzzy_name_pairs"] = fuzzy_name_pairs

    def simhash_signatures(spark, sf):
        from neo4j_document_pipeline_spark.operators.dedup import (
            simhash_signatures as sigs)
        d = (_t(spark, sf, "documents").select("doc_id", "text")
             .orderBy("doc_id").limit(500))
        return sigs(d, "doc_id", "text")
    q["simhash_signatures"] = simhash_signatures

    def embedding_near_dups(spark, sf):
        from neo4j_document_pipeline_spark.operators.dedup import (
            embedding_near_duplicates)
        e = _t(spark, sf, "embeddings")
        # driver embeddings are random (max pairwise cosine ~0.51) — use a
        # threshold that exercises the pair path while staying selective
        return embedding_near_duplicates(e, "vec_id", "embedding", threshold=0.35) \
            .withColumn("cos", F.round("cos", 4))
    q["embedding_near_dups"] = embedding_near_dups

    def node_tokens_index(spark, sf):
        # the write-time FTS inverted index (S10 Lucene-analogue) over a
        # deterministic part-derived nodes frame: distinct (tok, entity)
        # postings with exact per-token document frequency
        from neo4j_document_pipeline_spark.operators.retrieval import (
            build_node_tokens)
        p = _t(spark, sf, "part").select(
            F.col("p_partkey").cast("string").alias("entity_id"),
            F.col("p_name").alias("name"))
        return build_node_tokens(p).select(
            "tok", "entity_id", F.col("df").cast("long").alias("df"))
    q["node_tokens_index"] = node_tokens_index

    def salted_distinct_users(spark, sf):
        # explicit skew-salting operator: two-phase distinct-user count
        # must equal the plain COUNT(DISTINCT) the oracle computes
        from neo4j_document_pipeline_spark.operators.skew import (
            salted_aggregate)
        ev = _t(spark, sf, "events").select("event_type", "user_id")
        out = salted_aggregate(
            ev, ["event_type"],
            [F.collect_set("user_id").alias("s")],
            [F.size(F.array_distinct(F.flatten(F.collect_list("s"))))
             .alias("n_users")])
        return out.select("event_type",
                          F.col("n_users").cast("long").alias("n_users"))
    q["salted_distinct_users"] = salted_distinct_users

    def salted_join_orders(spark, sf):
        # salted fact x replicated-dim join == the plain equi-join
        from neo4j_document_pipeline_spark.operators.skew import salted_join
        o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
        c = _t(spark, sf, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_name")
        return salted_join(o, c, "o_custkey", buckets=4) \
            .select("o_orderkey", "c_name")
    q["salted_join_orders"] = salted_join_orders

    def connected_components_demo(spark, sf):
        # oracle-checked: recursive-CTE transitive closure in DuckDB over
        # the same deterministic edge subset (l_orderkey < 60)
        from neo4j_document_pipeline_spark.operators.components import (
            connected_components)
        li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 60)
        edges = li.select(
            F.concat(F.lit("o"), F.lpad(F.col("l_orderkey").cast("string"), 9, "0")).alias("u"),
            F.concat(F.lit("p"), F.lpad(F.col("l_partkey").cast("string"), 9, "0")).alias("v"))
        return connected_components(edges).withColumnRenamed("id", "node")
    q["connected_components_demo"] = connected_components_demo

    def incremental_components_orders(spark, sf):
        """O(delta) component maintenance (operators/components.py::
        incremental_components): commit CC over the l_orderkey<40 edge
        set, then merge the 40..59 batch incrementally. The oracle is
        the FULL transitive closure over the union — so the quotient-
        graph merge is proven bit-identical to a full recompute."""
        from neo4j_document_pipeline_spark.operators.components import (
            connected_components, incremental_components)
        li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 60)
        edges = li.select(
            F.concat(F.lit("o"), F.lpad(F.col("l_orderkey").cast("string"), 9, "0")).alias("u"),
            F.concat(F.lit("p"), F.lpad(F.col("l_partkey").cast("string"), 9, "0")).alias("v"),
            (F.col("l_orderkey") < 40).alias("_base"))
        labels = connected_components(
            edges.filter("_base").drop("_base")).localCheckpoint()
        delta = edges.filter(~F.col("_base")).drop("_base")
        return (incremental_components(labels, delta)
                .withColumnRenamed("id", "node"))
    q["incremental_components_orders"] = incremental_components_orders

    def pagerank_parts(spark, sf):
        """5-iteration PageRank over the part co-purchase graph (parts
        sharing an order). Ids are zero-padded so the operator's string
        least/greatest canonicalization matches the oracle's numeric
        one; the symmetrized graph has no dangling nodes, so 5 unrolled
        CTE iterations in DuckDB compute the identical power method."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            pagerank)
        edges = _copurchase_edges(spark, sf, pad=True)
        return (pagerank(edges, damping=0.85, iters=5)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.round("rank", 6).alias("rank")))
    q["pagerank_parts"] = pagerank_parts

    def pagerank_seeded_parts(spark, sf):
        """Weighted + personalized PageRank over the same co-purchase
        graph: edge weight = number of shared orders (parallel
        duplicates SUM in the operator, count(*) in the oracle),
        teleport restricted to parts with id <= 50 (the operator keeps
        only seeds present in the graph; the oracle's seed-count CTE
        does the same). Symmetrized graph => no dangling mass, so 5
        unrolled CTE iterations of r = 0.15*tele + 0.85*sum(r*w/wout)
        are the identical computation."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            pagerank)
        edges = _copurchase_edges(spark, sf, pad=True, weight="one")
        seeds = [str(i).zfill(9) for i in range(0, 51)]
        return (pagerank(edges, damping=0.85, iters=5,
                         weight_col="w", seeds=seeds)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.round("rank", 6).alias("rank")))
    q["pagerank_seeded_parts"] = pagerank_seeded_parts

    def node_similarity_parts(spark, sf):
        """Shared-neighbor Jaccard over a bounded co-purchase graph
        (orders < 400 keep the exact pair set oracle-sized): candidate
        pairs from the wedge join, intersection = wedge count, union
        from true degrees. Zero-padding makes the operator's string
        canonicalization match the oracle's numeric one."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            node_similarity)
        edges = _copurchase_edges(spark, sf, max_orderkey=400, pad=True)
        return (node_similarity(edges, min_sim=0.25)
                .select(F.col("a").cast("bigint").alias("part_a"),
                        F.col("b").cast("bigint").alias("part_b"),
                        "shared",
                        F.round("jaccard", 6).alias("jaccard")))
    q["node_similarity_parts"] = node_similarity_parts

    def node_similarity_weighted_parts(spark, sf):
        """Weighted node similarity over the same bounded co-purchase
        graph: each co-order occurrence carries weight 1 and the
        operator's duplicate-summing canonicalization turns them into
        co-purchase counts, so the oracle's edge weight is a plain
        count(*) GROUP BY. Weighted Jaccard = Σmin / (Σa + Σb − Σmin)."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            node_similarity)
        edges = _copurchase_edges(spark, sf, max_orderkey=400, pad=True,
                                  weight="one")
        return (node_similarity(edges, min_sim=0.25, weight_col="w")
                .select(F.col("a").cast("bigint").alias("part_a"),
                        F.col("b").cast("bigint").alias("part_b"),
                        "shared",
                        F.round("jaccard", 6).alias("wjaccard")))
    q["node_similarity_weighted_parts"] = node_similarity_weighted_parts

    def node_similarity_metric_parts(spark, sf):
        """The other two GDS similarity metrics over the unweighted
        co-purchase graph in ONE wedge pass (metric="all"): overlap
        (containment — 1.0 when one neighborhood swallows the other)
        and cosine (degree-normalized) side by side; the oracle
        recomputes each denominator in SQL from the same kernel."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            node_similarity)
        edges = _copurchase_edges(spark, sf, max_orderkey=400, pad=True)
        return (node_similarity(edges, metric="all")
                .filter(F.col("overlap") >= 0.5)
                .select(F.col("a").cast("bigint").alias("part_a"),
                        F.col("b").cast("bigint").alias("part_b"),
                        "shared",
                        F.round("overlap", 6).alias("overlap"),
                        F.round("cosine", 6).alias("cosine")))
    q["node_similarity_metric_parts"] = node_similarity_metric_parts

    def lpa_parts(spark, sf):
        """Deterministic synchronous label propagation (3 rounds) over
        the bounded co-purchase graph: each round every part adopts its
        neighbors' most frequent label, smallest label on ties — exactly
        replayable in SQL as three unrolled join+argmax CTEs. Zero-pad
        makes the operator's string tie-break match numeric order."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            label_propagation)
        edges = _copurchase_edges(spark, sf, max_orderkey=300, pad=True)
        return (label_propagation(edges, iters=3)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.col("community").cast("bigint")
                        .alias("community")))
    q["lpa_parts"] = lpa_parts

    def lpa_weighted_parts(spark, sf):
        """Weighted LPA (2 rounds): votes are summed co-purchase counts
        (exact integers in doubles, so the max-weight/min-label
        tie-break is identical across engines). The weights emerge from
        the operator's duplicate-summing canonicalization; the oracle
        builds them as count(*) GROUP BY."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            label_propagation)
        edges = _copurchase_edges(spark, sf, max_orderkey=300, pad=True,
                                  weight="one")
        return (label_propagation(edges, iters=2, weight_col="w")
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.col("community").cast("bigint")
                        .alias("community")))
    q["lpa_weighted_parts"] = lpa_weighted_parts

    def katz_parts(spark, sf):
        """3-iteration Katz centrality (x = β + α·A·x from x0 = β)
        over the bounded co-purchase graph — degree-unnormalized
        endorsement centrality beside PageRank's mass-conserving one.
        Oracle unrolls the identical three rounds as CTEs."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            katz_centrality)
        edges = _copurchase_edges(spark, sf, max_orderkey=300)
        return (katz_centrality(edges, alpha=0.05, iters=3)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.round("katz", 6).alias("katz")))
    q["katz_parts"] = katz_parts

    def neighborhood_parts(spark, sf):
        """HyperBall neighborhood function over the bounded co-purchase
        graph: per part and radius r=0..2, a DETERMINISTIC KMV bottom-k
        sketch (k=16) of the ball B(v,r) — exact below k, (k-1)/h_k
        above (operators/graphalgo.py::neighborhood_sketches). The
        sketch hash is the engine's sha256 draw, so the oracle unrolls
        the identical bottom-k-union rounds bit-for-bit."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            neighborhood_sketches)
        edges = _copurchase_edges(spark, sf, max_orderkey=300)
        return (neighborhood_sketches(edges, 2, k=16)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        "r", "n_min",
                        F.round("estimate", 4).alias("estimate")))
    q["neighborhood_parts"] = neighborhood_parts

    def harmonic_parts(spark, sf):
        """Approximate harmonic centrality from the same HyperBall
        sketches: H(v) = Σ_r (|B(v,r)|-|B(v,r-1)|)/r — shell sizes
        discounted by distance (graphalgo.py::
        harmonic_centrality_sketch). Oracle computes the identical
        shell arithmetic from the unrolled sketch rounds."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            harmonic_centrality_sketch)
        edges = _copurchase_edges(spark, sf, max_orderkey=300)
        return (harmonic_centrality_sketch(edges, 2, k=16)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.round("harmonic", 6).alias("harmonic")))
    q["harmonic_parts"] = harmonic_parts

    def neighborhood_function_parts(spark, sf):
        """The distance distribution N(r) from the same sketches —
        per radius, total (node, reachable)-pair estimate; the curve
        whose saturation is the effective diameter. Ball estimates are
        fixed-pointed to 4dp BEFORE summing (graphalgo.py::
        neighborhood_function) so the aggregate is an exact integer,
        immune to float summation order on either engine."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            neighborhood_function)
        edges = _copurchase_edges(spark, sf, max_orderkey=300)
        return neighborhood_function(edges, 2, k=16)
    q["neighborhood_function_parts"] = neighborhood_function_parts

    def lpa_modularity(spark, sf):
        """Newman modularity of the 3-round LPA communities over the
        same bounded co-purchase graph — the quality score that says
        whether a community split is better than chance (Q = Σ l_c/m −
        (d_c/2m)²). The scalar m is folded in-plan (broadcast 1-row
        agg), so the whole score is one job. Oracle = the lpa_parts
        CTE chain plus the same three community aggregates."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            label_propagation, modularity)
        edges = _copurchase_edges(spark, sf, max_orderkey=300, pad=True)
        asg = label_propagation(edges, iters=3)
        return (modularity(edges, asg)
                .select(F.col("community").cast("bigint")
                        .alias("community"),
                        "n_nodes", "l_in", "deg_sum",
                        # + 0.0 folds IEEE -0.0 into +0.0 (a tiny
                        # negative term rounds to -0.0 in DuckDB but
                        # +0.0 here; -0.0 + 0.0 = +0.0 in both)
                        (F.round("q_term", 6) + F.lit(0.0))
                        .alias("q_term")))
    q["lpa_modularity"] = lpa_modularity

    def conductance_parts(spark, sf):
        """Per-community conductance of the same 3-round LPA split —
        cut/min(vol, 2m−vol) from the modularity aggregates
        (operators/graphalgo.py::conductance): which communities are
        tight vs leaky. All φ inputs are exact integers; the oracle
        replays the LPA chain plus the same arithmetic."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            conductance, label_propagation)
        edges = _copurchase_edges(spark, sf, max_orderkey=300, pad=True)
        asg = label_propagation(edges, iters=3)
        return (conductance(edges, asg)
                .select(F.col("community").cast("bigint")
                        .alias("community"),
                        "n_nodes", "volume", "cut",
                        F.round("conductance", 6).alias("conductance")))
    q["conductance_parts"] = conductance_parts

    def graph_summary_parts(spark, sf):
        """One-row structural profile of the FULL co-purchase graph
        (operators/graphalgo.py::graph_summary): node/edge counts,
        degree range, density, and Newman degree assortativity — the
        hub-to-leaf vs core-core mixing readout. Every aggregate is an
        exact integer sum, so the float formula is bit-reproducible."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            graph_summary)
        edges = _copurchase_edges(spark, sf)
        return (graph_summary(edges)
                .select("n_nodes", "n_edges", "min_degree", "max_degree",
                        F.round("avg_degree", 6).alias("avg_degree"),
                        F.round("density", 6).alias("density"),
                        F.round("assortativity", 6)
                        .alias("assortativity")))
    q["graph_summary_parts"] = graph_summary_parts

    def bfs_parts(spark, sf):
        """Multi-source BFS hop distances from parts 0-4 over a bounded
        co-purchase graph: every node settled once at its minimum hop.
        Oracle = recursive CTE with UNION dedupe; min(dist) per node is
        the same BFS distance because shorter walks always appear."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            bfs_distances)
        edges = _copurchase_edges(spark, sf, max_orderkey=300)
        return (bfs_distances(edges, [str(i) for i in range(5)],
                              max_hops=3)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        "dist"))
    q["bfs_parts"] = bfs_parts

    def random_walk_parts(spark, sf):
        """DeepWalk-style walk corpus over the bounded co-purchase
        graph: 2 deterministic 3-step walks from every node, next hop
        = the neighbor minimizing the per-(walk, step) sha256 draw
        (operators/graphalgo.py::random_walks). Zero-pad keeps the
        hash preimages and the (hash, neighbor) tie-break ordering
        identical in both engines; the oracle unrolls the three steps
        with the same argmin."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            random_walks)
        edges = _copurchase_edges(spark, sf, max_orderkey=300, pad=True)
        return (random_walks(edges, walk_len=3, walks_per_node=2)
                .select(F.col("start").cast("bigint").alias("start_id"),
                        "rep", "step",
                        F.col("node").cast("bigint").alias("node_id")))
    q["random_walk_parts"] = random_walk_parts

    # ---- graph representation: walk-PPMI factors ----
    def walk_ppmi_parts(spark, sf):
        """Positive-PMI co-occurrence factors from the deterministic
        walk corpus (operators/graphalgo.py::walk_ppmi) — the matrix
        skip-gram implicitly factorizes (Levy & Goldberg 2014), i.e.
        the DeepWalk representation in closed form: pairs within
        window 2 on the same walk, ln(cooc·T/(na·nb)) > 0 rows."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            walk_ppmi)
        edges = _copurchase_edges(spark, sf, max_orderkey=300, pad=True)
        return (walk_ppmi(edges, walk_len=3, walks_per_node=2, window=2)
                .select(F.col("node").cast("bigint").alias("node_id"),
                        F.col("context").cast("bigint")
                        .alias("context_id"),
                        "cooc", F.round("ppmi", 6).alias("ppmi")))
    q["walk_ppmi_parts"] = walk_ppmi_parts

    def link_prediction_parts(spark, sf):
        """KG-completion candidates over the bounded co-purchase graph:
        non-adjacent pairs with >= 2 shared neighbors, scored by
        common count, Adamic-Adar (1/ln(center degree) — a wedge
        center's degree is always >= 2 so ln never hits 0), and
        preferential attachment. Zero-pad keeps pair orientation
        consistent; ln ulps are absorbed by 6dp rounding."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            link_prediction)
        edges = _copurchase_edges(spark, sf, max_orderkey=400, pad=True)
        return (link_prediction(edges, min_common=2)
                .select(F.col("a").cast("bigint").alias("part_a"),
                        F.col("b").cast("bigint").alias("part_b"),
                        "common",
                        F.round("adamic_adar", 6).alias("adamic_adar"),
                        "pref_attach"))
    q["link_prediction_parts"] = link_prediction_parts

    def hits_parts(spark, sf):
        """2-iteration HITS over the co-purchase graph oriented
        low-part -> high-part (a real direction both engines derive
        from the same numeric comparison, no padding needed — ids are
        only join keys here). Oracle unrolls both half-steps per
        iteration with an explicit L2-norm scalar CTE; 6dp rounding
        absorbs float-sum ordering ulps."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            hits)
        edges = _copurchase_edges(spark, sf, max_orderkey=300)
        return (hits(edges, iters=2)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.round("hub", 6).alias("hub"),
                        F.round("auth", 6).alias("auth")))
    q["hits_parts"] = hits_parts

    def npmi_parts(spark, sf):
        """NPMI collocation strength of part pairs over orders as
        contexts: lift is exact integer-ratio arithmetic (bit-stable
        across engines); npmi's ln() agrees within ulps, absorbed by
        6dp rounding. Zero-padding keeps the pair orientation (a < b on
        strings) equal to the oracle's numeric one."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            npmi_pairs)
        occ = (_t(spark, sf, "lineitem")
               .filter(F.col("l_orderkey") < 400)
               .select(F.col("l_orderkey").cast("string").alias("ctx"),
                       F.lpad(F.col("l_partkey").cast("string"), 9, "0")
                       .alias("item")))
        return (npmi_pairs(occ, min_pairs=1)
                .select(F.col("a").cast("bigint").alias("part_a"),
                        F.col("b").cast("bigint").alias("part_b"),
                        "n_pair",
                        F.round("lift", 6).alias("lift"),
                        F.round("npmi", 6).alias("npmi")))
    q["npmi_parts"] = npmi_parts

    def shortest_path_parts(spark, sf):
        """Hop-bounded weighted shortest distances from parts 0-4 over
        the co-purchase graph, edge weight a deterministic function of
        the endpoints ((u+v)%7+1, exact small integers so float minima
        agree bit-for-bit). Oracle = three unrolled Bellman-Ford
        relaxation rounds (relax-all == the operator's frontier form)."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            shortest_paths)
        edges = _copurchase_edges(spark, sf, max_orderkey=300,
                                  weight="endpoint")
        return (shortest_paths(edges, [str(i) for i in range(5)],
                               max_hops=3)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.round("dist", 6).alias("dist")))
    q["shortest_path_parts"] = shortest_path_parts

    def k_core_parts(spark, sf):
        """3-core of the bounded co-purchase graph. k-core peeling is an
        anti-monotone DELETION fixpoint, which recursive CTEs (monotone
        accumulation only) cannot express in general — but a BOUNDED
        number of rounds can be unrolled, and on this subgraph peeling
        provably converges within 3 rounds at every shipped sf (0/2/1
        rounds at sf 0.001/0.01/0.1). Both sides assert that bound
        loudly rather than silently truncating: the operator runs with
        max_iters=4 (3 peels + the empty-low confirmation — it RAISES
        if a 4th peel would be needed), and the oracle unrolls 3 peel
        rounds then returns ZERO rows (a loud hash/row mismatch) unless
        the post-round-3 low set is empty. Full brute-force peeling
        parity also in tests/test_graphalgo.py::
        test_k_core_matches_brute_force."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            k_core)
        edges = _copurchase_edges(spark, sf, max_orderkey=400)
        return (k_core(edges, k=3, max_iters=4)
                .select(F.col("id").cast("bigint").alias("part_id")))
    q["k_core_parts"] = k_core_parts

    def k_truss_parts(spark, sf):
        """4-truss of the bounded co-purchase graph — every surviving
        edge sits in >= 2 triangles of the subgraph. The same honesty
        contract as k_core_parts: support peeling converges within 2
        rounds at every shipped sf (2/1/1 at sf 0.001/0.01/0.1), the
        operator runs max_iters=3 (2 peels + the empty-low
        confirmation — RAISES if a 3rd peel would be needed), and the
        oracle unrolls 2 peel rounds then returns ZERO rows (loud
        mismatch) unless the post-round-2 low set is empty. Zero-pad
        keeps the canonical edge orientation numeric both sides."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            k_truss)
        edges = _copurchase_edges(spark, sf, max_orderkey=300, pad=True)
        return (k_truss(edges, k=4, max_iters=3)
                .select(F.col("u").cast("bigint").alias("part_u"),
                        F.col("v").cast("bigint").alias("part_v")))
    q["k_truss_parts"] = k_truss_parts

    def triangle_parts(spark, sf):
        """Degree-oriented triangle count of the same co-purchase graph
        — the wedge join is bounded by the orientation, the oracle is
        the canonical a<b<c triple join."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            triangle_count)
        return triangle_count(_copurchase_edges(spark, sf))
    q["triangle_parts"] = triangle_parts

    def clustering_parts(spark, sf):
        """Local clustering coefficient per part over the co-purchase
        graph: 2·T(v)/(d(v)·(d(v)-1)) from the same degree-oriented
        wedge join as triangle_parts, each triangle exploded to its
        three corners (graphalgo.py::clustering_coefficients). Oracle
        = the canonical a<b<c triple join, corners UNION ALL'd."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            clustering_coefficients)
        return (clustering_coefficients(_copurchase_edges(spark, sf))
                .select(F.col("id").cast("bigint").alias("part_id"),
                        "degree", "triangles",
                        F.round("coeff", 6).alias("coeff")))
    q["clustering_parts"] = clustering_parts

    # ---- A5: unique-text union across channels ----
    def unique_texts_union(spark, sf):
        p = _t(spark, sf, "part").select(F.col("p_name").alias("txt"))
        s = _t(spark, sf, "supplier").select(F.col("s_name").alias("txt"))
        e = _t(spark, sf, "events").select(F.col("event_type").alias("txt"))
        return p.union(s).union(e).distinct()
    q["unique_texts_union"] = unique_texts_union

    # ---- A9: sources-list accumulation (sorted set per group) ----
    def sources_accumulation(spark, sf):
        e = _t(spark, sf, "events")
        # join to a scalar string: the external driver checker canonicalizes
        # via pandas sort_values, which crashes on raw array columns
        # (unhashable list — VERDICT r1 red row).
        buckets = F.array_join(
            F.array_sort(F.collect_set(F.col("user_id") % 10)), ",")
        return e.groupBy("event_type").agg(buckets.alias("buckets"))
    q["sources_accumulation"] = sources_accumulation

    # ---- exact-dedup keep-min rows (U3 complement) ----
    def dedup_exact_keep(spark, sf):
        from neo4j_document_pipeline_spark.operators.dedup import dedup_exact
        return dedup_exact(_t(spark, sf, "documents"), "doc_id", "text") \
            .select("doc_id", "n_chars")
    q["dedup_exact_keep"] = dedup_exact_keep

    # ---- P2-shaped kind dispatch over events (when/otherwise routing) ----
    def event_kind_dispatch(spark, sf):
        e = _t(spark, sf, "events")
        kind = (F.when(F.col("value") >= 100, "high")
                .when(F.col("value") >= 10, "mid")
                .otherwise("low"))
        return (e.withColumn("kind", kind)
                .groupBy("event_type", "kind").agg(F.count("*").alias("n")))
    q["event_kind_dispatch"] = event_kind_dispatch

    # ---- temporal KG: SCD2 entity-property history ----
    def scd2_customer_status(spark, sf):
        """SCD2 compaction (operators/temporalkg.py::scd2_history) of
        per-customer order-status observations: each order is an
        observation (entity='cust:<key>', property='status',
        value=o_orderstatus, ts=o_orderdate); runs of equal values
        collapse into validity intervals with version ordinals. The
        oracle replays the same max-per-ts resolution + LAG change
        filter + LEAD interval close in DuckDB windows."""
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            scd2_history)
        o = _t(spark, sf, "orders")
        obs = o.select(
            F.concat(F.lit("cust:"), F.col("o_custkey").cast("string"))
            .alias("entity"),
            F.lit("status").alias("property"),
            F.col("o_orderstatus").alias("value"),
            F.col("o_orderdate").alias("ts"))
        return scd2_history(obs)
    q["scd2_customer_status"] = scd2_customer_status

    # ---- temporal KG: functional-predicate contradiction census ----
    def fact_conflicts_orders(spark, sf):
        """Conflict census (operators/temporalkg.py::fact_conflicts)
        over a deliberately collapsed fact space: subject =
        order:<o_orderkey % 97>, predicate='status' — the modulo makes
        distinct orders collide so the same (subject, predicate) key
        carries contradicting status values, exactly the shape a
        re-crawled page set produces. Array column joined to a sorted
        comma string for the driver's pandas canonicalizer."""
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            fact_conflicts)
        o = _t(spark, sf, "orders")
        t = o.select(
            F.concat(F.lit("order:"),
                     (F.col("o_orderkey") % 97).cast("string"))
            .alias("subject"),
            F.lit("status").alias("predicate"),
            F.col("o_orderstatus").alias("object"))
        return (fact_conflicts(t)
                .select("subject", "predicate", "n_objects",
                        F.array_join("objects", ",").alias("objects"),
                        "n_assertions"))
    q["fact_conflicts_orders"] = fact_conflicts_orders

    # ---- temporal KG: truth discovery (2-round exact-integer Sums) ----
    def truth_discovery_orders(spark, sf):
        """Fixed-round Sums voting (operators/temporalkg.py::
        truth_discovery, Pasternack & Roth 2010) resolving the same
        collapsed-order conflicts: source = u<o_custkey % 40> asserts
        fact order:<o_orderkey % 150> has value o_orderstatus. Two
        unnormalized rounds in exact int64 (bit-reproducible across
        engines); the oracle unrolls belief -> trust -> belief as
        CTEs with the identical distinct-claims edge set."""
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            truth_discovery)
        o = _t(spark, sf, "orders")
        claims = o.select(
            F.concat(F.lit("u"), (F.col("o_custkey") % 40).cast("string"))
            .alias("source"),
            F.concat(F.lit("order:"),
                     (F.col("o_orderkey") % 150).cast("string")).alias("fact"),
            F.col("o_orderstatus").alias("value"))
        return truth_discovery(claims, rounds=2)
    q["truth_discovery_orders"] = truth_discovery_orders

    # ---- Luby maximal independent set (deterministic waves) ----
    def mis_parts(spark, sf):
        """Deterministic Luby MIS (operators/graphalgo.py::
        maximal_independent_set) over the bounded co-purchase graph.
        Same honesty contract as k_core_parts: selection converges in
        4/3/2 waves at sf 0.001/0.01/0.1; the operator runs
        max_iters=5 (4 waves + the empty-active confirmation — RAISES
        if a 5th wave is needed) and the oracle unrolls 4 waves then
        returns ZERO rows (loud mismatch) unless the post-wave-4
        active set is empty. Priorities are sha256('v1:'||id)||':'||id
        — identical strings both engines, so the min-neighbor
        comparisons replay bit-for-bit."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            maximal_independent_set)
        edges = _copurchase_edges(spark, sf, max_orderkey=400)
        return (maximal_independent_set(edges, salt="v1", max_iters=5)
                .select(F.col("id").cast("bigint").alias("part_id"),
                        F.col("round").cast("int").alias("wave")))
    q["mis_parts"] = mis_parts

    # ---- bipartite butterfly (4-cycle) census ----
    def butterfly_orders(spark, sf):
        """Butterfly census (operators/graphalgo.py::butterfly_count)
        of the bounded part-order bipartite graph (left = part,
        right = order, l_orderkey < 3000): one row of exact
        combinatorial counts — wedge pairs from the right-anchored
        self-join, butterflies = sum C(shared, 2). The oracle is the
        identical wedge SQL."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            butterfly_count)
        li = (_t(spark, sf, "lineitem")
              .filter(F.col("l_orderkey") < 3000)
              .select(F.col("l_partkey").alias("l"),
                      F.col("l_orderkey").alias("r")))
        return butterfly_count(li)
    q["butterfly_orders"] = butterfly_orders

    # ---- Fellegi–Sunter probabilistic record linkage ----
    def fs_link_customers(spark, sf):
        """Fellegi–Sunter pair scoring (operators/erlink.py) over
        customers blocked on c_custkey % 31: three comparison fields
        (nation, market segment, acctbal thousand-bucket), u
        probabilities from the EXACT corpus value histogram, caller m
        probabilities, log2 weights + Bayes posterior. The oracle
        replays the identical histogram/agreement/weight arithmetic."""
        from neo4j_document_pipeline_spark.operators.erlink import (
            fellegi_sunter_scores)
        c = _t(spark, sf, "customer")
        rec = c.select(
            "c_custkey",
            F.col("c_nationkey").cast("string").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal") / 1000).cast("bigint")
            .cast("string").alias("bal"))
        blk = rec.select(F.col("c_custkey"),
                         (F.col("c_custkey") % 31).alias("_blk"))
        pairs = (blk.select(F.col("c_custkey").alias("id1"), "_blk")
                 .join(blk.select(F.col("c_custkey").alias("id2"), "_blk"),
                       "_blk")
                 .filter(F.col("id1") < F.col("id2"))
                 .select("id1", "id2"))
        return fellegi_sunter_scores(
            rec, pairs, "c_custkey", ["nat", "seg", "bal"],
            {"nat": 0.95, "seg": 0.9, "bal": 0.8}, prior=0.01)
    q["fs_link_customers"] = fs_link_customers

    # ---- semi-naive transitive closure (RDFS rdfs11) ----
    def closure_parts(spark, sf):
        """Transitive closure (operators/reasoning.py::
        transitive_closure, datalog semi-naive evaluation) of the
        binary-tree ancestor relation p_partkey -> p_partkey DIV 2
        (2 <= key < 512): all (descendant, ancestor) pairs with the
        minimal edge distance. Tree depth <= 8 at every shipped sf;
        the operator runs max_iters=12 (raises if unconverged); the
        oracle is DuckDB's native recursive CTE with min(dist)."""
        from neo4j_document_pipeline_spark.operators.reasoning import (
            transitive_closure)
        p = _t(spark, sf, "part").filter(
            (F.col("p_partkey") >= 2) & (F.col("p_partkey") < 512))
        edges = p.select(F.col("p_partkey").alias("src"),
                         F.shiftright(F.col("p_partkey"), 1).alias("dst"))
        return (transitive_closure(edges, max_iters=12)
                .select(F.col("src").cast("bigint").alias("src"),
                        F.col("dst").cast("bigint").alias("dst"),
                        F.col("dist").cast("int").alias("dist")))
    q["closure_parts"] = closure_parts

    # ---- RDFS rdfs9 type inference over the nation/region ontology ----
    def type_inference_customers(spark, sf):
        """Type propagation (operators/reasoning.py::infer_types):
        customers asserted their nation as type; subclass edges
        nation -> region -> 'world'. Every customer gains the two
        inferred ancestor types (direct=false). The closure here is
        provably depth 2, so the oracle unrolls it as
        sub UNION sub∘sub."""
        from neo4j_document_pipeline_spark.operators.reasoning import (
            infer_types)
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        inst = (c.join(n, c.c_nationkey == n.n_nationkey)
                .select(F.col("c_custkey").alias("entity"),
                        F.col("n_name").alias("type")))
        sub = (n.join(r, n.n_regionkey == r.r_regionkey)
               .select(F.col("n_name").alias("src"),
                       F.col("r_name").alias("dst")).distinct()
               .union(r.select(F.col("r_name").alias("src"),
                               F.lit("world").alias("dst")).distinct()))
        return infer_types(inst, sub)
    q["type_inference_customers"] = type_inference_customers

    # ---- Z-order (Morton) clustering keys ----
    def zorder_orders(spark, sf):
        """Exact-integer Morton keys (operators/layout.py::zorder_key)
        over (o_custkey, floor(o_totalprice)), 8 bits per column with
        in-plan min/max scaling; the oracle replays the identical
        integer bucket DIV + bit interleave."""
        from neo4j_document_pipeline_spark.operators.layout import (
            zorder_key)
        o = _t(spark, sf, "orders").select(
            "o_orderkey", F.col("o_custkey").alias("ck"),
            F.floor(F.col("o_totalprice")).cast("bigint").alias("pr"))
        return zorder_key(o, ["ck", "pr"], bits=8).select(
            "o_orderkey", "zkey")
    q["zorder_orders"] = zorder_orders

    # ---- Z-order skipping evidence: per-column bucket span ----
    def zorder_span_stats(spark, sf):
        """The evidence half (operators/layout.py::
        zorder_partition_stats): bucket orders rows by the top 4 bits
        of their Morton key (what a range partitioner on z cuts) and
        report each column's mean per-bucket min/max span fraction —
        the file-skipping number Z-order buys BOTH columns at once."""
        from neo4j_document_pipeline_spark.operators.layout import (
            zorder_partition_stats)
        o = _t(spark, sf, "orders").select(
            F.col("o_custkey").alias("ck"),
            F.floor(F.col("o_totalprice")).cast("bigint").alias("pr"))
        return zorder_partition_stats(o, ["ck", "pr"], bits=8,
                                      prefix_bits=4)
    q["zorder_span_stats"] = zorder_span_stats

    # ---- first-order Markov transition census ----
    def markov_event_transitions(spark, sf):
        """Per-user event-sequence transition matrix (operators/
        sequences.py::event_transitions): one LEAD window per user
        ordered by (ts, event_id), exact pair counts, row-normalized
        probabilities. The oracle replays the identical window."""
        from neo4j_document_pipeline_spark.operators.sequences import (
            event_transitions)
        return event_transitions(_t(spark, sf, "events"))
    q["markov_event_transitions"] = markov_event_transitions

    # ---- Brandes betweenness centrality (pivot-sampled) ----
    def betweenness_parts(spark, sf):
        """Brandes betweenness (operators/graphalgo.py::
        betweenness_centrality) from 30 fixed pivot sources
        (Brandes–Pich sampling — the 100-TB estimator shape) over the
        modular co-purchase graph (l_partkey % 400, l_orderkey <
        2000 — dense at every shipped sf; source eccentricity 2/3/3
        at sf 0.001/0.01/0.1). Same honesty contract as mis/k_core:
        the operator runs max_depth=5 (raises if a 6th BFS level is
        needed) and the oracle unrolls 5 forward-σ levels + 5
        backward-δ levels and returns ZERO rows unless level 6 is
        empty."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            betweenness_centrality)
        li = (_t(spark, sf, "lineitem")
              .filter(F.col("l_orderkey") < 2000)
              .select("l_orderkey", (F.col("l_partkey") % 400).alias("p")))
        a, b = li.alias("a"), li.alias("b")
        edges = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                        & (F.col("a.p") < F.col("b.p")))
                 .select(F.col("a.p").cast("string").alias("u"),
                         F.col("b.p").cast("string").alias("v")))
        return (betweenness_centrality(
            edges, [str(i) for i in range(30)], max_depth=5)
            .select(F.col("id").cast("bigint").alias("part_id"),
                    "betweenness"))
    q["betweenness_parts"] = betweenness_parts

    # ---- smoothed target encoding (encoder table) ----
    def target_encode_priority(spark, sf):
        """Smoothed target-mean encoder (operators/features.py::
        target_encode, Micci-Barreca 2001): per order priority, the
        rate of 'F' orders shrunk toward the global rate with
        pseudo-count alpha=10. Binary integer target keeps every sum
        exact int64 — bit-deterministic encoder."""
        from neo4j_document_pipeline_spark.operators.features import (
            target_encode)
        o = _t(spark, sf, "orders").select(
            F.col("o_orderpriority").alias("cat"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            .alias("t"))
        return target_encode(o, "cat", "t", alpha=10.0)
    q["target_encode_priority"] = target_encode_priority

    # ---- z-score standardization with in-plan moments ----
    def zscore_customers(spark, sf):
        """standard_scale (operators/features.py): account-balance
        z-scores with mean/stddev_pop folded into the plan as one
        broadcast aggregate row."""
        from neo4j_document_pipeline_spark.operators.features import (
            standard_scale)
        c = _t(spark, sf, "customer").select("c_custkey", "c_acctbal")
        return standard_scale(c, ["c_acctbal"]).select(
            "c_custkey", "c_acctbal_z")
    q["zscore_customers"] = zscore_customers

    # ---- calibration reliability bins ----
    def calibration_orders(spark, sf):
        """Reliability-diagram bins (operators/evaluation.py::
        calibration_bins, Guo et al. 2017): a deterministic synthetic
        score (o_orderkey % 1000 / 1000) against the 'F'-status label,
        10 fixed-width bins with exact-integer accuracy."""
        from neo4j_document_pipeline_spark.operators.evaluation import (
            calibration_bins)
        o = _t(spark, sf, "orders").select(
            ((F.col("o_orderkey") % 1000).cast("double") / 1000)
            .alias("score"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            .alias("label"))
        return calibration_bins(o, n_bins=10)
    q["calibration_orders"] = calibration_orders

    # ---- KL-divergence novelty scores ----
    def kl_novelty_docs(spark, sf):
        """Per-document KL(doc || corpus) unigram novelty (operators/
        corpus.py::kl_novelty_scores) over the documents table; the
        oracle replays the identical factored sum with the engine's
        tokenizer."""
        from neo4j_document_pipeline_spark.operators.corpus import (
            kl_novelty_scores)
        d = _t(spark, sf, "documents")
        return kl_novelty_scores(d, "doc_id", "text")
    q["kl_novelty_docs"] = kl_novelty_docs

    # ---- exact-arithmetic PCA power iteration ----
    def pca_project_vecs(spark, sf):
        """Top-principal-component projections (operators/
        clustering.py::pca_project): 3 fixed power-iteration rounds
        with integer-quantized vectors, n-scaled exact centering,
        decimal(38,0) w sums and a deterministic sign convention —
        bit-reproducible, so the oracle replays every round and the
        proj integers hash-match exactly."""
        from neo4j_document_pipeline_spark.operators.clustering import (
            pca_project)
        e = _t(spark, sf, "embeddings")
        return pca_project(e, "vec_id", "embedding", rounds=3, dim=64)
    q["pca_project_vecs"] = pca_project_vecs

    # ---- domain-level hygiene (operators/domains.py) ----
    def _synth_url(d):
        # deterministic per-doc URL: sha256-drawn site id with half the
        # mass folded onto 4 hot domains (head-domain skew), mixed-case
        # scheme/host, userinfo, ports, two-level suffixes, and a
        # hostless relative reference every 97th doc — every URL shape
        # the host/domain extractor must normalize. The oracle builds
        # the IDENTICAL string in SQL.
        h8 = F.conv(F.substring(
            F.sha2(F.concat(F.lit("dom:"),
                            F.col("doc_id").cast("string")), 256),
            1, 8), 16, 10).cast("long")
        hraw = h8 % 64
        hid = F.when(hraw < 32, hraw % 4).otherwise(hraw)
        sub = (F.when(hid % 3 == 0, "https://WWW.")
               .when(hid % 3 == 1, "http://user:pw@news.")
               .otherwise("https://"))
        sfx = (F.when(hid % 4 == 0, ".co.uk")
               .when(hid % 4 == 1, ".com")
               .when(hid % 4 == 2, ".org")
               .otherwise(".com.au"))
        port = F.when(hid % 5 == 0, ":8080").otherwise("")
        url = F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(F.lit("/relative/"), F.col("doc_id").cast("string"))
        ).otherwise(F.concat(
            sub, F.lit("site"), hid.cast("string"), sfx, port,
            F.lit("/d/"), F.col("doc_id").cast("string")))
        return d.withColumn("url", url)

    def domain_census_docs(spark, sf):
        """Registered-domain corpus census (operators/domains.py::
        domain_census) over synthesized skewed URLs: docs, tokens and
        corpus share per registrant — subdomains fold into their
        registered domain, hostless urls group under NULL."""
        from neo4j_document_pipeline_spark.operators.domains import (
            domain_census)
        d = _synth_url(_t(spark, sf, "documents"))
        return domain_census(d, "url", "text")
    q["domain_census_docs"] = domain_census_docs

    def domain_cap_docs(spark, sf):
        """Per-domain document cap (operators/domains.py::
        domain_cap_sample, cap=5): the head-domain flattening pass —
        keep the 5 smallest deterministic hash draws per registered
        domain (two-phase skew-bounded selection; the oracle ranks the
        identical key in one window)."""
        from neo4j_document_pipeline_spark.operators.domains import (
            domain_cap_sample)
        d = _synth_url(_t(spark, sf, "documents"))
        return (domain_cap_sample(d, "url", "doc_id", 5)
                .select("doc_id", "domain"))
    q["domain_cap_docs"] = domain_cap_docs

    def domain_block_flags(spark, sf):
        """Blocklist + corpus-share-ceiling keep flags (operators/
        domains.py::domain_filter_flags): site0.co.uk and site2.org
        blocklisted, any registrant above 10% of documents flagged
        over_share (the synthesized hot domains trip it; cold ones
        pass)."""
        from neo4j_document_pipeline_spark.operators.domains import (
            domain_filter_flags)
        d = _synth_url(_t(spark, sf, "documents"))
        return domain_filter_flags(
            d, "url", "doc_id",
            blocklist=["site0.co.uk", "site2.org"], max_share=0.10)
    q["domain_block_flags"] = domain_block_flags

    # ---- DAG layering over the part ancestor graph ----
    def dag_levels_parts(spark, sf):
        """Longest-path topological levels (operators/reasoning.py::
        topological_levels, level-synchronous Kahn peeling with loud
        cycle detection): the part-key DAG with halving edges
        p -> p DIV 2 AND skip edges p -> p DIV 4, so a node is
        reachable by chains of different lengths and the level must be
        the LONGEST one. The oracle enumerates all source-anchored
        paths with a recursive CTE and takes max(depth)."""
        from neo4j_document_pipeline_spark.operators.reasoning import (
            topological_levels)
        p = _t(spark, sf, "part")
        half = (p.filter((F.col("p_partkey") >= 2)
                         & (F.col("p_partkey") < 512))
                .select(F.col("p_partkey").alias("src"),
                        F.shiftright(F.col("p_partkey"), 1).alias("dst")))
        skip = (p.filter((F.col("p_partkey") >= 4)
                         & (F.col("p_partkey") < 512))
                .select(F.col("p_partkey").alias("src"),
                        F.shiftright(F.col("p_partkey"), 2).alias("dst")))
        return (topological_levels(half.union(skip), max_iters=12)
                .select(F.col("node").cast("bigint").alias("node"),
                        F.col("level").cast("int").alias("level")))
    q["dag_levels_parts"] = dag_levels_parts

    # ---- hashing-trick features over documents ----
    def hashed_tf_docs(spark, sf):
        """Signed feature hashing (operators/features.py::hashed_tf,
        Weinberger et al. 2009): sparse (doc_id, bucket, weight) rows
        at dim=64 — the no-vocabulary vectorizer; bucket and sign both
        derive from one sha256 per token, so the oracle replays the
        identical arithmetic."""
        from neo4j_document_pipeline_spark.operators.features import (
            hashed_tf)
        d = _t(spark, sf, "documents")
        return hashed_tf(d, "doc_id", "text", dim=64)
    q["hashed_tf_docs"] = hashed_tf_docs

    # ---- mutual-best entity alignment over embeddings ----
    def rbm_alignment_vecs(spark, sf):
        """Reciprocal best match (operators/similarity.py::
        reciprocal_best_match): mutual top-1 cosine pairs between two
        halves of the embeddings table (vec_id < 50 vs 50..149) — the
        high-precision seed-pair extractor for cross-KG entity
        alignment; ranking is rounded-4dp cosine with id tie-breaks,
        exactly SQL-replayable."""
        from neo4j_document_pipeline_spark.operators.similarity import (
            reciprocal_best_match)
        e = _t(spark, sf, "embeddings")
        left = (e.filter(F.col("vec_id") < 50)
                .select(F.col("vec_id").alias("lid"),
                        F.col("embedding").alias("lv")))
        right = (e.filter((F.col("vec_id") >= 50)
                          & (F.col("vec_id") < 150))
                 .select(F.col("vec_id").alias("rid"),
                         F.col("embedding").alias("rv")))
        return reciprocal_best_match(left, right)
    q["rbm_alignment_vecs"] = rbm_alignment_vecs

    # ---- CDC feed + apply over synthesized snapshot churn ----
    def _orders_snapshots(spark, sf):
        # deterministic churn on orders: every 13th key deleted, every
        # 7th repriced, every 11th cloned as an insert at key + 10^9
        old = _t(spark, sf, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice")
        survivors = old.filter(F.col("o_orderkey") % 13 != 0)
        repriced = survivors.select(
            "o_orderkey", "o_orderstatus",
            F.when(F.col("o_orderkey") % 7 == 0,
                   F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice")).alias("o_totalprice"))
        inserts = old.filter(F.col("o_orderkey") % 11 == 0).select(
            (F.col("o_orderkey") + F.lit(1000000000)).alias("o_orderkey"),
            "o_orderstatus", "o_totalprice")
        return old, repriced.unionByName(inserts)

    def cdc_feed_orders(spark, sf):
        """Value-carrying change feed (operators/admin.py::
        table_changes) between two synthesized orders snapshots:
        churn-sized upsert/delete rows with the NEW values; the oracle
        is the full-outer null-safe compare in SQL."""
        from neo4j_document_pipeline_spark.operators.admin import (
            table_changes)
        old, new = _orders_snapshots(spark, sf)
        feed = table_changes(old, new, ["o_orderkey"],
                             ["o_orderstatus", "o_totalprice"])
        # presentation only: a NULL double fetched through pandas
        # becomes NaN on the DuckDB side, which can never hash-match
        # Spark's None — sentinel the delete rows' price in BOTH
        # engines (the operator itself keeps real NULLs)
        return feed.select("o_orderkey", "op", "o_orderstatus",
                           F.coalesce(F.col("o_totalprice"),
                                      F.lit(-1.0))
                           .alias("o_totalprice"))
    q["cdc_feed_orders"] = cdc_feed_orders

    def cdc_roundtrip_orders(spark, sf):
        """CDC sufficiency law (operators/admin.py::apply_changes):
        applying the table_changes feed to the OLD snapshot must
        reconstruct the NEW snapshot row for row — the oracle builds
        the new snapshot directly from the churn rules, so the
        feed+apply path is checked against an independent
        construction."""
        from neo4j_document_pipeline_spark.operators.admin import (
            apply_changes, table_changes)
        old, new = _orders_snapshots(spark, sf)
        feed = table_changes(old, new, ["o_orderkey"],
                             ["o_orderstatus", "o_totalprice"])
        return apply_changes(old, feed, ["o_orderkey"],
                             ["o_orderstatus", "o_totalprice"])
    q["cdc_roundtrip_orders"] = cdc_roundtrip_orders

    # ---- recrawl dedup: latest snapshot per normalized url ----
    def latest_snapshot_urls(spark, sf):
        """URL-level recrawl dedup (operators/dedup.py::
        latest_snapshot_per_url): three messy variants of the same
        canonical url (tracking param + upper-case scheme/host,
        trailing-slash + fragment) collide under col_normalize_url and
        the newest warc_ts survives. The oracle groups by the CLEAN
        base url built directly, so a normalizer that failed to fold
        any variant would change the group count and mismatch."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            latest_snapshot_per_url)
        d = _t(spark, sf, "documents")
        base = F.concat(
            F.lit("https://site"), (F.col("doc_id") % 37).cast("string"),
            F.lit(".com/p/"), (F.col("doc_id") % 111).cast("string"))
        upper = F.concat(
            F.lit("HTTPS://SITE"), (F.col("doc_id") % 37).cast("string"),
            F.lit(".COM/p/"), (F.col("doc_id") % 111).cast("string"),
            F.lit("?utm_source=x"))
        slashfrag = F.concat(base, F.lit("/#frag"))
        url = (F.when(F.col("doc_id") % 3 == 0, base)
               .when(F.col("doc_id") % 3 == 1, upper)
               .otherwise(slashfrag))
        snap = d.select(
            "doc_id", url.alias("url"),
            F.timestamp_seconds(F.lit(1735689600)
                                + F.col("doc_id")).alias("warc_ts"))
        return (latest_snapshot_per_url(snap, "url", "warc_ts")
                .select("url_norm", "doc_id", "warc_ts"))
    q["latest_snapshot_urls"] = latest_snapshot_urls

    return q


# ---------------------------------------------------------------------------
# oracle_sql()
# ---------------------------------------------------------------------------

def _c4_filter_sql() -> str:
    """The c4_filter_docs oracle: the identical page reconstruction
    (5-word pseudo-lines, residue-keyed punctuation drop + injected
    rule-trigger lines) and the identical C4 rules, with the bad-word
    regex built from the ENGINE's C4_BADWORDS so oracle and operator
    cannot drift (whole-word, case-insensitive — RE2 == Java here)."""
    from neo4j_document_pipeline_spark.operators.corpus import (
        C4_BADWORDS)
    bad = r"(?i)\b(" + "|".join(C4_BADWORDS) + r")\b"
    line_ok = (
        "l -> regexp_matches(l, '[.!?\"]$') "
        r"AND len(regexp_extract_all(l, '\S+')) >= 5 "
        r"AND NOT regexp_matches(l, '(?i)\bjavascript\b')")
    return (
        "WITH pg AS (SELECT doc_id, "
        "  array_to_string(list_transform(range(1, "
        "    CAST(ceil(len(ws) / 5.0) AS BIGINT) + 1), "
        "    i -> array_to_string(ws[(i-1)*5+1 : (i-1)*5+5], ' ') || "
        "      CASE WHEN (doc_id + i) % 3 = 0 THEN '' ELSE '.' END), "
        "    chr(10)) "
        "  || CASE WHEN doc_id % 13 = 0 THEN chr(10) || "
        "    'lorem ipsum dolor sit amet okay.' ELSE '' END "
        "  || CASE WHEN doc_id % 17 = 0 THEN chr(10) || "
        "    'var config = { \"mode\": 1 };' ELSE '' END "
        "  || CASE WHEN doc_id % 19 = 0 THEN chr(10) || "
        "    'win big at the casino tonight folks.' ELSE '' END "
        "  || CASE WHEN doc_id % 7 = 0 THEN chr(10) || "
        "    'please enable javascript to view this page.' ELSE '' END "
        "  AS text FROM (SELECT doc_id, string_split(text, ' ') AS ws "
        "  FROM documents)), "
        "f AS (SELECT doc_id, "
        "  len(string_split(text, chr(10))) AS lines_total, "
        "  list_filter(list_transform(string_split(text, chr(10)), "
        f"    l -> trim(l)), {line_ok}) AS kept, "
        "  contains(lower(text), 'lorem ipsum') AS has_lorem, "
        "  contains(text, '{') AS has_brace, "
        f"  regexp_matches(text, '{bad}') AS has_badword FROM pg), "
        "s AS (SELECT doc_id, lines_total, len(kept) AS lines_kept, "
        "  len(regexp_extract_all(array_to_string(kept, chr(10)), "
        "    '[.!?]')) AS sentences_kept, "
        "  has_lorem, has_brace, has_badword, "
        "  array_to_string(kept, chr(10)) AS text_clean FROM f) "
        "SELECT doc_id, lines_total, lines_kept, sentences_kept, "
        "  has_lorem, has_brace, has_badword, "
        "  (lines_kept > 0 AND sentences_kept >= 3 AND NOT has_lorem "
        "   AND NOT has_brace AND NOT has_badword) AS keep, text_clean "
        "FROM s")


def _pii_redaction_sql() -> str:
    """Built from the ENGINE's PII_PATTERNS so oracle and operator
    cannot drift (the patterns are Java/RE2-compatible by contract)."""
    from neo4j_document_pipeline_spark.functions.textstats import (
        PII_PATTERNS)
    em, em_r = PII_PATTERNS["email"]
    ip, ip_r = PII_PATTERNS["ipv4"]
    ph, ph_r = PII_PATTERNS["phone"]
    return (
        "WITH s AS (SELECT doc_id, text || ' contact user' || "
        "doc_id::VARCHAR || '@example.com from 192.168.' || "
        "(doc_id % 200)::VARCHAR || '.7 tel +60 12-345 67' || "
        "lpad((doc_id % 90)::VARCHAR, 2, '0') || '89' AS t "
        "FROM documents) "
        "SELECT doc_id, "
        f"len(regexp_extract_all(t, '{em}')) AS n_email, "
        f"len(regexp_extract_all(t, '{ip}')) AS n_ipv4, "
        f"len(regexp_extract_all(t, '{ph}')) AS n_phone, "
        "regexp_replace(regexp_replace(regexp_replace(t, "
        f"'{em}', '{em_r}', 'g'), '{ip}', '{ip_r}', 'g'), "
        f"'{ph}', '{ph_r}', 'g') AS redacted FROM s")


def _fs_link_sql() -> str:
    """fs_link_customers oracle: the identical exact-histogram u
    probabilities, clamped log2 likelihood-ratio weights and Bayes
    posterior over the same %31 blocking."""
    fields = [("nat", 0.95), ("seg", 0.9), ("bal", 0.8)]
    u_subs = []
    for f, _ in fields:
        u_subs.append(
            f"greatest(least((SELECT coalesce(sum(c * (c - 1.0)), 0) FROM "
            f"(SELECT count(*)::DOUBLE AS c FROM r WHERE {f} IS NOT NULL "
            f"GROUP BY {f})) / (nn * (nn - 1)), 1 - 1e-9), 1e-9) AS u_{f}")
    agree, weights = [], []
    for f, m in fields:
        agree.append(
            f"CASE WHEN {f}1 IS NULL OR {f}2 IS NULL THEN -1 "
            f"WHEN {f}1 = {f}2 THEN 1 ELSE 0 END AS agree_{f}")
        weights.append(
            f"CASE WHEN {f}1 IS NULL OR {f}2 IS NULL THEN 0.0 "
            f"WHEN {f}1 = {f}2 THEN log2({m!r} / u_{f}) "
            f"ELSE log2({1.0 - m!r} / (1 - u_{f})) END")
    w = " + ".join(f"({x})" for x in weights)
    return (
        "WITH r AS (SELECT c_custkey AS id, c_nationkey::VARCHAR AS nat, "
        "c_mktsegment AS seg, "
        "(floor(c_acctbal / 1000)::BIGINT)::VARCHAR AS bal FROM customer), "
        "n AS (SELECT count(*)::DOUBLE AS nn FROM r), "
        "uu AS (SELECT " + ", ".join(u_subs) + " FROM n), "
        "p AS (SELECT a.id AS id1, b.id AS id2, "
        "a.nat AS nat1, b.nat AS nat2, a.seg AS seg1, b.seg AS seg2, "
        "a.bal AS bal1, b.bal AS bal2 FROM r a JOIN r b "
        "ON (a.id % 31) = (b.id % 31) AND a.id < b.id), "
        "sc AS (SELECT id1, id2, " + ", ".join(agree) + ", "
        f"({w}) AS match_weight FROM p, uu) "
        "SELECT id1, id2, agree_nat, agree_seg, agree_bal, match_weight, "
        "pow(2, match_weight + log2(0.01 / 0.99)) / "
        "(pow(2, match_weight + log2(0.01 / 0.99)) + 1) "
        "AS match_probability FROM sc")


def _betweenness_sql(depth: int = 5, n_seeds: int = 30) -> str:
    """betweenness_parts oracle: ``depth`` unrolled forward BFS-σ
    levels (exact int64 path counts, anti-joined against the settled
    set) + ``depth`` unrolled backward Brandes-δ levels, then the
    Brandes–Pich normalized estimator. Returns ZERO rows (loud
    row-count mismatch) unless level depth+1 is empty."""
    seeds = ", ".join(f"({i})" for i in range(n_seeds))
    p = [
        "WITH base AS (SELECT DISTINCT a.l_partkey % 400 AS u, "
        "b.l_partkey % 400 AS v FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey "
        "AND (a.l_partkey % 400) < (b.l_partkey % 400) "
        "WHERE a.l_orderkey < 2000 AND b.l_orderkey < 2000), "
        "e AS (SELECT u, v FROM base UNION ALL SELECT v, u FROM base), "
        f"seeds(s) AS (VALUES {seeds}), "
        "l0 AS (SELECT CAST(s AS BIGINT) AS s, CAST(s AS BIGINT) AS v, "
        "1::BIGINT AS sigma FROM seeds), "
        "t0 AS (SELECT s, v FROM l0), ",
    ]
    for k in range(1, depth + 2):
        p.append(
            f"l{k} AS (SELECT x.s, x.v, sum(x.sigma)::BIGINT AS sigma "
            f"FROM (SELECT f.s, e.v AS v, f.sigma FROM l{k-1} f "
            f"JOIN e ON e.u = f.v) x "
            f"ANTI JOIN t{k-1} t ON x.s = t.s AND x.v = t.v "
            f"GROUP BY 1, 2), ")
        if k <= depth:
            p.append(f"t{k} AS (SELECT s, v FROM t{k-1} "
                     f"UNION ALL SELECT s, v FROM l{k}), ")
    p.append(f"conv AS (SELECT count(*) = 0 AS ok FROM l{depth + 1}), ")
    p.append(f"d{depth} AS (SELECT s, v, sigma, 0.0::DOUBLE AS delta "
             f"FROM l{depth}), ")
    for lev in range(depth - 1, 0, -1):
        p.append(
            f"d{lev} AS (SELECT c.s, c.v, c.sigma, coalesce(sum("
            f"(c.sigma::DOUBLE / n.sigma) * (1.0 + n.delta)), 0.0) "
            f"AS delta FROM l{lev} c LEFT JOIN "
            f"(SELECT dn.s, e.u AS pv, dn.sigma, dn.delta "
            f"FROM d{lev + 1} dn JOIN e ON e.v = dn.v) n "
            f"ON n.s = c.s AND n.pv = c.v GROUP BY 1, 2, 3), ")
    unions = " UNION ALL ".join(
        f"SELECT s, v, delta FROM d{k}" for k in range(1, depth + 1))
    p.append(f"allv AS ({unions}), ")
    p.append("nn AS (SELECT count(DISTINCT u)::BIGINT AS n FROM e), ")
    p.append("kk AS (SELECT count(*)::BIGINT AS k FROM seeds "
             "WHERE CAST(s AS BIGINT) IN (SELECT u FROM e)), ")
    p.append("agg AS (SELECT v, sum(delta) AS sd FROM allv GROUP BY 1) ")
    p.append("SELECT v AS part_id, "
             "sd * n / (k * (n - 1.0) * (n - 2.0)) AS betweenness "
             "FROM agg, nn, kk WHERE (SELECT ok FROM conv)")
    return "".join(p)


def _pca_sql(rounds: int = 3, dim: int = 64) -> str:
    """pca_project_vecs oracle: the identical quantize / n-scaled
    centering / unrolled power-iteration rounds — int64 dot products,
    HUGEINT w sums (== Spark's decimal(38,0)), the same double
    renormalization and first-max sign convention."""
    rng = f"range(1, {dim + 1})"
    p = [
        "WITH q AS (SELECT vec_id AS vid, list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)) "
        "AS qv FROM embeddings WHERE embedding IS NOT NULL), "
        "stn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q), "
        "sts AS (SELECT list(sm ORDER BY d) AS S FROM ("
        "SELECT r.d AS d, CAST(sum(qv[r.d]) AS BIGINT) AS sm "
        f"FROM q, unnest({rng}) AS r(d) GROUP BY r.d)), "
        f"pts AS (SELECT vid, list_transform({rng}, "
        "d -> n * qv[d] - S[d]) AS y FROM q, stn, sts), "
        f"v0 AS (SELECT list_transform({rng}, "
        "d -> CAST(1 AS BIGINT)) AS v), ",
    ]
    for r in range(1, rounds + 1):
        p.append(
            f"t{r} AS (SELECT vid, y, list_reduce(list_transform({rng}, "
            f"d -> y[d] * v[d]), (a, b) -> a + b) AS t "
            f"FROM pts, v{r - 1}), ")
        p.append(
            f"w{r} AS (SELECT list(sm ORDER BY d) AS w FROM ("
            "SELECT r.d AS d, sum(CAST(y[r.d] AS HUGEINT) "
            "* CAST(t AS HUGEINT)) AS sm "
            f"FROM t{r}, unnest({rng}) AS r(d) GROUP BY r.d)), ")
        p.append(
            f"v{r} AS (SELECT CASE WHEN m = 0 THEN "
            "list_transform(w, x -> CAST(0 AS BIGINT)) "
            "ELSE list_transform(w, x -> CAST(floor("
            "CAST(x AS DOUBLE) * sgn / CAST(m AS DOUBLE) * 10000.0 "
            "+ 0.5) AS BIGINT)) END AS v FROM ("
            "SELECT w, list_aggregate(list_transform(w, "
            "x -> abs(x)), 'max') AS m, "
            "CASE WHEN list_filter(w, x -> abs(x) = "
            "list_aggregate(list_transform(w, y2 -> abs(y2)), 'max')"
            ")[1] < 0 THEN -1.0 ELSE 1.0 END AS sgn "
            f"FROM w{r})), ")
    body = "".join(p).rstrip(", ") + " "
    return (body
            + f"SELECT vid AS vec_id, CAST(list_reduce(list_transform("
            f"{rng}, d -> y[d] * v[d]), (a, b) -> a + b) AS BIGINT) "
            f"AS proj FROM pts, v{rounds}")


def _zorder_ctes() -> str:
    """Shared zorder CTE chain: identical integer bucket DIV + Morton
    bit interleave (8 bits x 2 cols) over orders."""
    terms = []
    for j in range(8):
        terms.append(f"(((bck >> {j}) & 1) << {2 * j})")
        terms.append(f"(((bpr >> {j}) & 1) << {2 * j + 1})")
    z = " | ".join(terms)
    return (
        "WITH o AS (SELECT o_orderkey, o_custkey AS ck, "
        "floor(o_totalprice)::BIGINT AS pr FROM orders), "
        "s AS (SELECT min(ck) AS mnck, max(ck) AS mxck, "
        "min(pr) AS mnpr, max(pr) AS mxpr FROM o), "
        "b AS (SELECT o_orderkey, ck, pr, "
        "((ck - mnck) * 256) // (mxck - mnck + 1) AS bck, "
        "((pr - mnpr) * 256) // (mxpr - mnpr + 1) AS bpr FROM o, s), "
        f"z AS (SELECT o_orderkey, ck, pr, ({z})::BIGINT AS zkey FROM b)")


# Deterministic-walk CTE chain shared by the walk oracles: the
# IDENTICAL hash-argmin transitions, three steps unrolled; ties break
# on (hash, neighbor) like the operator's min(struct). Ends in
# w(start, rep, step, node) over the bounded padded co-purchase graph.
_SQL_WALK_CTES = (
    "WITH base AS ("
    "  SELECT DISTINCT lpad(CAST(a.l_partkey AS VARCHAR), 9, '0')"
    "  AS u, lpad(CAST(b.l_partkey AS VARCHAR), 9, '0') AS v"
    "  FROM lineitem a JOIN lineitem b"
    "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    "  WHERE a.l_orderkey < 300),"
    "e AS (SELECT u, v FROM base UNION ALL SELECT v, u FROM base),"
    "wr AS (SELECT start, rep FROM"
    "  (SELECT DISTINCT u AS start FROM e),"
    "  (SELECT unnest([0, 1]) AS rep)),"
    "n1 AS (SELECT start, rep, v AS cur FROM ("
    "  SELECT wr.start, wr.rep, e.v, row_number() OVER ("
    "  PARTITION BY wr.start, wr.rep ORDER BY"
    "  ('0x' || substr(sha256('v1:' || wr.start || ':' || wr.rep"
    "  || ':1:' || wr.start || ':' || e.v), 1, 8))::UBIGINT, e.v)"
    "  AS rn FROM wr JOIN e ON e.u = wr.start) WHERE rn = 1),"
    "n2 AS (SELECT start, rep, v AS cur FROM ("
    "  SELECT n1.start, n1.rep, e.v, row_number() OVER ("
    "  PARTITION BY n1.start, n1.rep ORDER BY"
    "  ('0x' || substr(sha256('v1:' || n1.start || ':' || n1.rep"
    "  || ':2:' || n1.cur || ':' || e.v), 1, 8))::UBIGINT, e.v)"
    "  AS rn FROM n1 JOIN e ON e.u = n1.cur) WHERE rn = 1),"
    "n3 AS (SELECT start, rep, v AS cur FROM ("
    "  SELECT n2.start, n2.rep, e.v, row_number() OVER ("
    "  PARTITION BY n2.start, n2.rep ORDER BY"
    "  ('0x' || substr(sha256('v1:' || n2.start || ':' || n2.rep"
    "  || ':3:' || n2.cur || ':' || e.v), 1, 8))::UBIGINT, e.v)"
    "  AS rn FROM n2 JOIN e ON e.u = n2.cur) WHERE rn = 1),"
    "w AS (SELECT start, rep, 0 AS step, start AS node FROM wr"
    " UNION ALL SELECT start, rep, 1, cur FROM n1"
    " UNION ALL SELECT start, rep, 2, cur FROM n2"
    " UNION ALL SELECT start, rep, 3, cur FROM n3)"
)


def _domain_sql_ctes() -> str:
    """Shared CTE chain for the domain-hygiene oracles (no leading
    WITH): the identical URL synthesis, then the identical host /
    registered-domain extraction as functions/textstats.py
    col_url_host + col_registered_domain — the two-level-suffix set is
    read from the ENGINE so oracle and operator cannot drift."""
    from neo4j_document_pipeline_spark.functions.textstats import (
        TWO_LEVEL_SUFFIXES)
    sfx = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    last2 = r"regexp_extract(host, '([^.]+\.[^.]+)$', 1)"
    last3 = r"regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)"
    return (
        "hsrc AS (SELECT doc_id, text, "
        "  ('0x' || substr(sha256('dom:' || doc_id), 1, 8))::UBIGINT "
        "  % 64 AS hraw FROM documents), "
        "hh AS (SELECT doc_id, text, "
        "  CASE WHEN hraw < 32 THEN hraw % 4 ELSE hraw END AS hid "
        "  FROM hsrc), "
        "urls AS (SELECT doc_id, text, "
        "  CASE WHEN doc_id % 97 = 0 THEN '/relative/' || doc_id "
        "  ELSE (CASE hid % 3 WHEN 0 THEN 'https://WWW.' "
        "        WHEN 1 THEN 'http://user:pw@news.' "
        "        ELSE 'https://' END) "
        "    || 'site' || hid "
        "    || (CASE hid % 4 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com' "
        "        WHEN 2 THEN '.org' ELSE '.com.au' END) "
        "    || (CASE WHEN hid % 5 = 0 THEN ':8080' ELSE '' END) "
        "    || '/d/' || doc_id END AS url FROM hh), "
        "hosts AS (SELECT doc_id, text, nullif(regexp_replace("
        "  lower(regexp_replace(regexp_extract(url, "
        "  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), "
        "  '^[^/?#]*@', '')), ':[0-9]*$', ''), '') AS host FROM urls), "
        "doms AS (SELECT doc_id, text, "
        "  CASE WHEN regexp_matches(host, '^[0-9.]+$') THEN host "
        f"  WHEN {last2} = '' THEN host "
        f"  WHEN {last2} IN ({sfx}) AND {last3} <> '' THEN {last3} "
        f"  ELSE {last2} END AS domain FROM hosts)"
    )


def oracle_sql() -> dict[str, str]:
    num_case = " ".join(
        f"WHEN '{w}' THEN '{d}'" for w, d in [
            ("one", "1"), ("two", "2"), ("three", "3"), ("four", "4"),
            ("five", "5"), ("six", "6"), ("seven", "7"), ("eight", "8"),
            ("nine", "9"), ("ten", "10")])
    en_arr = "[" + ", ".join(f"'{w}'" for w in _EN_SW) + "]"
    ms_arr = "[" + ", ".join(f"'{w}'" for w in _MS_SW) + "]"

    # 3-word-gram shingle sets under the engine's tokenization — the exact
    # verification kernel of minhash_near_duplicates (operators/dedup.py)
    # same deterministic ≤500-doc subset the Spark queries pin
    doc_subset = "(SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 500)"
    shingle_cte = (
        "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks "
        f"FROM {doc_subset}), "
        "g AS (SELECT doc_id, CASE WHEN len(toks) = 0 THEN []::varchar[] "
        "ELSE list_distinct(list_transform(range(1, greatest(len(toks)-2, 1)+1), "
        "i -> array_to_string(toks[i:i+2], ' '))) END AS grams FROM t)")

    # near-dup resolution: the padded-id variant of the shingle kernel
    # + recursive transitive closure + least(node, min(reachable)) —
    # padding makes the operator's STRING component min numeric-correct
    neardup_resolve_sql = (
        "WITH RECURSIVE t AS (SELECT lpad(doc_id::varchar, 9, '0') AS doc_id, "
        "regexp_extract_all(lower(text), '[a-z0-9]+') AS toks "
        f"FROM {doc_subset}), "
        "g AS (SELECT doc_id, CASE WHEN len(toks) = 0 THEN []::varchar[] "
        "ELSE list_distinct(list_transform(range(1, greatest(len(toks)-2, 1)+1), "
        "i -> array_to_string(toks[i:i+2], ' '))) END AS grams FROM t), "
        "pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2 "
        "  FROM g a JOIN g b ON a.doc_id < b.doc_id "
        "  WHERE CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0 "
        "  THEN len(list_intersect(a.grams, b.grams))::double "
        "  / len(list_distinct(list_concat(a.grams, b.grams))) ELSE 0.0 END >= 0.8), "
        "e2 AS (SELECT id1 AS u, id2 AS v FROM pr "
        "  UNION SELECT id2, id1 FROM pr), "
        "reach AS ("
        "  SELECT u AS node, v AS r FROM e2 "
        "  UNION "
        "  SELECT reach.node, e.v FROM reach JOIN e2 e ON reach.r = e.u "
        "  WHERE e.v <> reach.node) "
        "SELECT node AS doc_id, least(node, min(r)) AS keep_id, "
        "node = least(node, min(r)) AS is_kept FROM reach GROUP BY node")

    # leakage-safe split: the SAME recursive cluster map, left-joined
    # onto the full padded subset; the CLUSTER key (not the document)
    # takes the sha256 draw; cumulative CASE bounds 0.8 / 0.9 match the
    # engine's float boundaries exactly at 2^-32 hash granularity (no
    # representable u lies between 0.9 and python's 0.8+0.1)
    _neardup_ctes = neardup_resolve_sql[:neardup_resolve_sql.rindex(
        "SELECT node AS doc_id")]
    leakage_split_sql = (
        _neardup_ctes +
        ", cm AS (SELECT node AS doc_id, least(node, min(r)) AS keep_id "
        "FROM reach GROUP BY node), "
        "keyed AS (SELECT t.doc_id, coalesce(cm.keep_id, t.doc_id) AS "
        "split_key FROM t LEFT JOIN cm USING (doc_id)), "
        "drawn AS (SELECT doc_id, split_key, "
        "('0x' || substr(sha256('v1:' || split_key), 1, 8))::UBIGINT "
        "/ 4294967296.0 AS u FROM keyed) "
        "SELECT doc_id, split_key, CASE WHEN u < 0.8 THEN 'train' "
        "WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split FROM drawn")

    # distributed BPE learning: unrolled merge rounds. Each round =
    # one pair aggregation over the double-space symbol strings + one
    # deterministic argmax + one literal replace — the IDENTICAL
    # construction operators/bpe.py runs (replace() is left-to-right
    # non-overlapping in both engines; single-space flanks around the
    # double-space delimiter make one pass canonical greedy BPE)
    def _bpe_rounds(rounds: int) -> str:
        ctes = [
            "w AS (SELECT word, count(*) AS freq FROM "
            f"(SELECT unnest({_SQL_TOKENS}) AS word FROM documents) "
            "GROUP BY word), "
            "v0 AS (SELECT word, freq, '  ' || "
            "regexp_replace(word, '(.)', '\\1  ', 'g') || '</w>  ' AS s "
            "FROM w)"]
        for r in range(1, rounds + 1):
            p = f"v{r - 1}"
            ctes.append(
                f"p{r} AS (SELECT pr.l AS lft, pr.r AS rgt, "
                "sum(freq)::BIGINT AS cnt FROM (SELECT freq, "
                "unnest(list_transform(range(1, len(string_split(trim(s), "
                "'  '))), i -> {'l': string_split(trim(s), '  ')[i], "
                "'r': string_split(trim(s), '  ')[i+1]})) AS pr "
                f"FROM {p}) GROUP BY 1, 2), "
                f"b{r} AS (SELECT lft, rgt, lft || rgt AS merged, cnt "
                f"FROM p{r} ORDER BY cnt DESC, lft, rgt LIMIT 1), "
                f"v{r} AS (SELECT word, freq, replace(s, "
                "' ' || b.lft || '  ' || b.rgt || ' ', "
                f"' ' || b.merged || ' ') AS s FROM {p}, b{r} b)")
        return "WITH " + ", ".join(ctes)

    bpe_merges_sql = (
        _bpe_rounds(3) + " " +
        " UNION ALL ".join(
            f"SELECT {r} AS round, lft AS \"left\", rgt AS \"right\", "
            f"merged, cnt AS pair_count FROM b{r}"
            for r in range(1, 4)))
    bpe_vocab_sql = (
        _bpe_rounds(3) +
        " SELECT word, replace(trim(s), '  ', ' ') AS segmented, freq "
        "FROM v3 ORDER BY freq DESC, word LIMIT 100")

    # simhash: 64 per-bit tf-weighted majority votes over
    # md5_number_lower('42:'||tok) — the identical token hash the engine
    # computes (low 8 md5 digest bytes, little-endian)
    bit_acc = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS a{i}"
        for i in range(64))
    sig_sum = " + ".join(
        f"CASE WHEN a{i} > 0 THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END"
        for i in range(64))
    simhash_sql = (
        "WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks "
        f"FROM {doc_subset}), "
        "u AS (SELECT doc_id, md5_number_lower('42:' || unnest(toks)) AS h FROM d), "
        f"acc AS (SELECT doc_id, {bit_acc} FROM u GROUP BY doc_id), "
        f"sig AS (SELECT doc_id, ({sig_sum}) AS s FROM acc) "
        "SELECT d.doc_id AS id, coalesce(CASE WHEN s >= 9223372036854775808::HUGEINT "
        "THEN (s - 18446744073709551616::HUGEINT)::BIGINT ELSE s::BIGINT END, 0) AS simhash "
        "FROM d LEFT JOIN sig USING (doc_id)")

    # k-core: 3 unrolled peel rounds (enough at every shipped sf — see
    # k_core_parts docstring) + a loud convergence guard: if the low set
    # after round 3 is non-empty the oracle returns ZERO rows, forcing a
    # row-count mismatch instead of silently blessing a half-peeled set
    kcore_rounds = []
    for r in range(1, 4):
        p = f"e{r - 1}"
        kcore_rounds.append(
            f"low{r} AS (SELECT id FROM (SELECT u AS id FROM {p} "
            f"UNION ALL SELECT v FROM {p}) GROUP BY id "
            f"HAVING count(*) < 3), "
            f"e{r} AS (SELECT u, v FROM {p} "
            f"WHERE u NOT IN (SELECT id FROM low{r}) "
            f"AND v NOT IN (SELECT id FROM low{r}))")
    # Luby MIS: 4 unrolled deterministic waves + a loud convergence
    # guard (zero rows unless the post-wave-4 active set is empty);
    # priorities sha256('v1:'||id)||':'||id match Spark's sha2 hex
    mis_rounds = []
    for r in range(4):
        mis_rounds.append(
            f"adj{r} AS MATERIALIZED (SELECT a.id AS id, b.p AS nbr_p, b.id AS nbr "
            f"FROM me JOIN a{r} a ON me.u = a.id "
            f"JOIN a{r} b ON me.v = b.id "
            f"UNION ALL "
            f"SELECT b.id, a.p, a.id "
            f"FROM me JOIN a{r} a ON me.u = a.id "
            f"JOIN a{r} b ON me.v = b.id), "
            f"sel{r} AS MATERIALIZED (SELECT a.id FROM a{r} a LEFT JOIN "
            f"(SELECT id, min(nbr_p) AS mp FROM adj{r} GROUP BY id) m "
            f"USING (id) WHERE m.mp IS NULL OR a.p < m.mp), "
            f"rem{r} AS MATERIALIZED (SELECT id FROM sel{r} UNION "
            f"SELECT adj.nbr FROM adj{r} adj JOIN sel{r} s "
            f"ON adj.id = s.id), "
            f"a{r + 1} AS MATERIALIZED (SELECT id, p FROM a{r} "
            f"WHERE id NOT IN (SELECT id FROM rem{r}))")
    mis_sql = (
        "WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem "
        "WHERE l_orderkey < 400), "
        "me AS MATERIALIZED (SELECT DISTINCT a.l_partkey::VARCHAR AS u, "
        "b.l_partkey::VARCHAR AS v "
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey), "
        "a0 AS MATERIALIZED (SELECT id, sha256('v1:' || id) || ':' || id AS p FROM ("
        "SELECT DISTINCT u AS id FROM me "
        "UNION SELECT v FROM me)), "
        + ", ".join(mis_rounds) + " "
        "SELECT id::BIGINT AS part_id, wave FROM ("
        + " UNION ALL ".join(
            f"SELECT id, {r} AS wave FROM sel{r}" for r in range(4))
        + ") WHERE (SELECT count(*) FROM a4) = 0")

    # k-truss: 2 unrolled support-peel rounds + a loud convergence
    # guard (zero rows unless the post-round-2 low set is empty)
    truss_rounds = []
    for r in range(1, 3):
        p = f"te{r - 1}"
        truss_rounds.append(
            f"t{r} AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
            f"FROM {p} e1 JOIN {p} e2 ON e1.u = e2.u AND e1.v < e2.v "
            f"JOIN {p} e3 ON e3.u = e1.v AND e3.v = e2.v), "
            f"s{r} AS (SELECT u, v, count(*) AS s FROM ("
            f"SELECT least(a, b) AS u, greatest(a, b) AS v FROM t{r} "
            f"UNION ALL SELECT least(a, c), greatest(a, c) FROM t{r} "
            f"UNION ALL SELECT b, c FROM t{r}) GROUP BY u, v), "
            f"te{r} AS (SELECT e.u, e.v FROM {p} e "
            f"LEFT JOIN s{r} USING (u, v) WHERE coalesce(s{r}.s, 0) >= 2)")
    truss_sql = (
        "WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem "
        "WHERE l_orderkey < 300), "
        "te0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey), "
        + ", ".join(truss_rounds) + ", "
        "t3 AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
        "FROM te2 e1 JOIN te2 e2 ON e1.u = e2.u AND e1.v < e2.v "
        "JOIN te2 e3 ON e3.u = e1.v AND e3.v = e2.v), "
        "s3 AS (SELECT u, v, count(*) AS s FROM ("
        "SELECT least(a, b) AS u, greatest(a, b) AS v FROM t3 "
        "UNION ALL SELECT least(a, c), greatest(a, c) FROM t3 "
        "UNION ALL SELECT b, c FROM t3) GROUP BY u, v), "
        "low3 AS (SELECT e.u FROM te2 e LEFT JOIN s3 USING (u, v) "
        "WHERE coalesce(s3.s, 0) < 2) "
        "SELECT u AS part_u, v AS part_v FROM te2 "
        "WHERE (SELECT count(*) FROM low3) = 0")

    kcore_sql = (
        "WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem "
        "WHERE l_orderkey < 400), "
        "e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey), "
        + ", ".join(kcore_rounds) + ", "
        "low4 AS (SELECT id FROM (SELECT u AS id FROM e3 "
        "UNION ALL SELECT v FROM e3) GROUP BY id "
        "HAVING count(*) < 3) "
        "SELECT DISTINCT id AS part_id FROM "
        "(SELECT u AS id FROM e3 UNION ALL SELECT v FROM e3) "
        "WHERE (SELECT count(*) FROM low4) = 0")

    # embedding near-dup: the SAME seeded hyperplanes the engine uses
    # (np.random.RandomState(42), 12 planes x dim 64), two 6-bit sign
    # bands, union of band self-joins, exact cosine rerank in double
    import numpy as _np
    _planes = _np.random.RandomState(42).normal(size=(12, 64))
    bit_cols = ", ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in _planes[p]) + "]) >= 0 "
        f"THEN 1 ELSE 0 END AS bit{p}"
        for p in range(12))
    bk1 = " + ".join(f"bit{i} * {1 << i}" for i in range(6))
    bk2 = " + ".join(f"bit{6 + i} * {1 << i}" for i in range(6))
    emb_neardup_sql = (
        "WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"s AS (SELECT id, v, {bit_cols} FROM base), "
        f"k AS (SELECT id, v, ({bk1}) AS bk1, ({bk2}) AS bk2 FROM s), "
        "cand AS ("
        "  SELECT a.id AS id1, b.id AS id2, a.v AS v1, b.v AS v2 "
        "  FROM k a JOIN k b ON a.bk1 = b.bk1 AND a.id < b.id "
        "  UNION "
        "  SELECT a.id, b.id, a.v, b.v "
        "  FROM k a JOIN k b ON a.bk2 = b.bk2 AND a.id < b.id) "
        "SELECT id1, id2, round(c, 4) AS cos FROM ("
        "  SELECT id1, id2, CASE WHEN sqrt(list_dot_product(v1, v1)) = 0 "
        "  OR sqrt(list_dot_product(v2, v2)) = 0 THEN 0.0 "
        "  ELSE list_dot_product(v1, v2) / "
        "  (sqrt(list_dot_product(v1, v1)) * sqrt(list_dot_product(v2, v2))) END AS c "
        "  FROM cand) WHERE c >= 0.35")

    # golden fixtures are frozen PER TOKENIZER (chunk boundaries depend
    # on it): point the oracle at the set matching the ACTIVE tokenizer,
    # exactly like tests/test_golden_triples.py — a cl100k run must never
    # compare against regex-fallback-frozen triples
    from neo4j_document_pipeline_spark.functions.tokenizer import TOKENIZER
    from scripts.freeze_fixtures import FIXTURE_DIRS
    fixture_dir = FIXTURE_DIRS.get(
        TOKENIZER, f"/root/repo/fixtures/triples_{TOKENIZER}")

    return {
        "kg_triples_documents":
            "SELECT DISTINCT doc_id, t.subject AS subject, t.predicate AS rel_type, "
            "t.object AS object, t.object_kind AS object_kind "
            "FROM (SELECT doc_id, unnest(triples) AS t "
            f"FROM read_json_auto('{fixture_dir}/*.json'))",
        "minhash_near_dups":
            f"{shingle_cte} "
            "SELECT id1, id2, round(j, 4) AS jaccard FROM ("
            "  SELECT a.doc_id AS id1, b.doc_id AS id2, "
            "  CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0 "
            "  THEN len(list_intersect(a.grams, b.grams))::double "
            "  / len(list_distinct(list_concat(a.grams, b.grams))) ELSE 0.0 END AS j "
            "  FROM g a JOIN g b ON a.doc_id < b.doc_id) "
            "WHERE j >= 0.8",
        "near_dup_resolution": neardup_resolve_sql,
        "leakage_split_docs": leakage_split_sql,
        "bpe_merges_docs": bpe_merges_sql,
        "bpe_vocab_segments": bpe_vocab_sql,
        "predicate_cardinality_kg":
            # the same five-predicate mix, distinct-collapsed, with the
            # two-level fan-out maxima and the relational class CASE
            "WITH tr AS ("
            "  SELECT 'order:' || o_orderkey AS s, 'placed_by' AS p, "
            "         'cust:' || o_custkey AS o FROM orders "
            "  UNION ALL SELECT 'cust:' || o_custkey, 'placed', "
            "         'order:' || o_orderkey FROM orders "
            "  UNION ALL SELECT 'order:' || l_orderkey, 'contains', "
            "         'part:' || l_partkey FROM lineitem "
            "  UNION ALL SELECT 'part:' || p_partkey, 'branded', "
            "         'brand:' || p_brand FROM part "
            "  UNION ALL SELECT 'cust:' || c_custkey, 'same_as', "
            "         'dup:' || c_custkey FROM customer), "
            "t AS (SELECT DISTINCT s, p, o FROM tr), "
            "base AS (SELECT p, count(*)::BIGINT AS n_triples, "
            "  count(DISTINCT s)::BIGINT AS n_subjects, "
            "  count(DISTINCT o)::BIGINT AS n_objects FROM t GROUP BY p), "
            "od AS (SELECT p, max(d)::BIGINT AS max_out FROM ("
            "  SELECT p, s, count(*) AS d FROM t GROUP BY p, s) GROUP BY p), "
            "idg AS (SELECT p, max(d)::BIGINT AS max_in FROM ("
            "  SELECT p, o, count(*) AS d FROM t GROUP BY p, o) GROUP BY p) "
            "SELECT base.p AS predicate, n_triples, n_subjects, n_objects, "
            "max_out, max_in, "
            "round(n_triples::DOUBLE / n_subjects, 4) AS avg_out, "
            "CASE WHEN max_out = 1 AND max_in = 1 THEN '1:1' "
            "WHEN max_out = 1 THEN 'N:1' WHEN max_in = 1 THEN '1:N' "
            "ELSE 'N:M' END AS card_class "
            "FROM base JOIN od USING (p) JOIN idg USING (p)",
        "redirect_resolution":
            "WITH RECURSIVE e AS (SELECT 'u' || c_custkey AS src, "
            "'u' || (c_custkey - 1) AS dst FROM customer "
            "WHERE c_custkey % 16 <> 0), "
            "r AS (SELECT src, dst FROM e "
            "UNION ALL SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src) "
            "SELECT src, dst AS resolved FROM r "
            "WHERE dst NOT IN (SELECT src FROM e)",
        "hard_negative_mining":
            # identical rounded-cosine ranking with id tie-break
            "SELECT anchor_id, vec_id, label, score, rnk FROM ("
            "  SELECT a.vec_id AS anchor_id, c.vec_id, c.label, "
            "  round(list_cosine_similarity(c.embedding, a.embedding), 4) "
            "    AS score, "
            "  row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            "    round(list_cosine_similarity(c.embedding, a.embedding), 4) "
            "    DESC, c.vec_id) AS rnk "
            "  FROM embeddings c JOIN embeddings a ON a.vec_id < 8 "
            "  AND c.label <> a.label) WHERE rnk <= 5",
        "feature_propagation_parts":
            # two unrolled integer rounds: string-lexicographic edge
            # canonicalization (the operator's least/greatest on cast
            # ids), floor-cents quantization, truncating // division
            "WITH ce AS (SELECT DISTINCT "
            "  least(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS u, "
            "  greatest(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS v "
            "  FROM lineitem a JOIN lineitem b "
            "  ON a.l_orderkey = b.l_orderkey "
            "  AND a.l_partkey < b.l_partkey), "
            "bid AS (SELECT u, v FROM ce UNION ALL SELECT v, u FROM ce), "
            "deg AS (SELECT u AS id, count(*)::BIGINT AS d "
            "  FROM bid GROUP BY u), "
            "f0 AS (SELECT p_partkey::VARCHAR AS id, "
            "  CAST(floor(p_retailprice * 100) AS BIGINT) AS f FROM part), "
            "s1 AS (SELECT b.u AS id, sum(g.f)::BIGINT AS s "
            "  FROM bid b JOIN f0 g ON b.v = g.id GROUP BY b.u), "
            "f1 AS (SELECT f.id, "
            "  (f.f + coalesce(s.s, 0)) // (1 + coalesce(d.d, 0)) AS f "
            "  FROM f0 f LEFT JOIN s1 s USING (id) "
            "  LEFT JOIN deg d USING (id)), "
            "s2 AS (SELECT b.u AS id, sum(g.f)::BIGINT AS s "
            "  FROM bid b JOIN f1 g ON b.v = g.id GROUP BY b.u) "
            "SELECT f.id, "
            "  ((f.f + coalesce(s.s, 0)) // (1 + coalesce(d.d, 0)))"
            "::BIGINT AS f "
            "FROM f1 f LEFT JOIN s2 s USING (id) "
            "LEFT JOIN deg d USING (id)",
        "rrf_multiquery_fusion":
            "WITH ch AS ("
            + " UNION ALL ".join(
                "SELECT vec_id, rank FROM ("
                "  SELECT c.vec_id, row_number() OVER (ORDER BY "
                "  round(list_cosine_similarity(c.embedding, q.embedding), 4)"
                "  DESC, c.vec_id) AS rank "
                f"  FROM embeddings c, embeddings q WHERE q.vec_id = {qid})"
                " WHERE rank <= 20"
                for qid in (0, 1))
            + ") SELECT vec_id, "
            "round(sum(1.0 / (60.0 + rank)), 6) AS rrf_score, "
            "count(*)::BIGINT AS n_channels FROM ch GROUP BY vec_id "
            "ORDER BY rrf_score DESC, vec_id LIMIT 15",
        "negative_triples_branded":
            # identical sha256 index draw, dense row_number pool,
            # self/true-fact filters, first-2-survivors ranking
            "WITH tr AS (SELECT DISTINCT 'part:' || p_partkey AS s, "
            "  'branded' AS p, p_brand AS o FROM part), "
            "pool AS (SELECT entity, row_number() OVER (ORDER BY entity) "
            "  - 1 AS idx FROM (SELECT DISTINCT p_brand AS entity "
            "  FROM part)), "
            "att AS (SELECT s, p, o, j AS attempt FROM tr, range(6) r(j)), "
            "drawn AS (SELECT s, p, o, attempt, "
            "  ('0x' || substr(sha256('v1:' || s || '|' || p || '|' || o "
            "  || '|' || attempt), 1, 8))::UBIGINT "
            "  % (SELECT count(*) FROM pool) AS idx FROM att), "
            "cand AS (SELECT d.s, d.p, d.o, d.attempt, "
            "  pool.entity AS neg_object FROM drawn d JOIN pool "
            "  USING (idx)), "
            "flt AS (SELECT * FROM cand WHERE neg_object <> o "
            "  AND NOT EXISTS (SELECT 1 FROM tr t2 WHERE t2.s = cand.s "
            "  AND t2.p = cand.p AND t2.o = cand.neg_object)), "
            "rk AS (SELECT s, p, neg_object, attempt, row_number() OVER ("
            "  PARTITION BY s, p, o ORDER BY attempt) AS rn FROM flt) "
            "SELECT s AS subject, p AS predicate, neg_object, attempt "
            "FROM rk WHERE rn <= 2",
        "orders_snapshot_diff":
            "WITH old AS (SELECT o_orderkey, CASE WHEN o_orderkey % 5 = 0 "
            "  THEN o_totalprice * 2 ELSE o_totalprice END AS tp, "
            "  o_orderstatus AS st FROM orders WHERE o_orderkey % 7 <> 0), "
            "nw AS (SELECT o_orderkey, o_totalprice AS tp, "
            "  o_orderstatus AS st FROM orders WHERE o_orderkey % 11 <> 0) "
            "SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey, "
            "CASE WHEN o.o_orderkey IS NULL THEN 'added' "
            "  WHEN n.o_orderkey IS NULL THEN 'removed' "
            "  ELSE 'changed' END AS change, "
            "CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL "
            "  THEN []::VARCHAR[] ELSE list_filter(["
            "  CASE WHEN o.tp IS DISTINCT FROM n.tp "
            "    THEN 'o_totalprice' END, "
            "  CASE WHEN o.st IS DISTINCT FROM n.st "
            "    THEN 'o_orderstatus' END], x -> x IS NOT NULL) "
            "END AS changed_cols "
            "FROM old o FULL OUTER JOIN nw n USING (o_orderkey) "
            "WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL "
            "OR o.tp IS DISTINCT FROM n.tp OR o.st IS DISTINCT FROM n.st",
        "power_law_parts":
            # same string-canonical distinct edges, degrees >= dmin=2,
            # CSN discrete MLE with the dmin-0.5 offset
            "WITH ce AS (SELECT DISTINCT "
            "  least(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS u, "
            "  greatest(a.l_partkey::VARCHAR, b.l_partkey::VARCHAR) AS v "
            "  FROM lineitem a JOIN lineitem b "
            "  ON a.l_orderkey = b.l_orderkey "
            "  AND a.l_partkey < b.l_partkey), "
            "deg AS (SELECT id, count(*) AS d FROM ("
            "  SELECT u AS id FROM ce UNION ALL SELECT v FROM ce) "
            "  GROUP BY id HAVING count(*) >= 2) "
            "SELECT count(*)::BIGINT AS n_tail, 2 AS dmin, "
            "round(1.0 + count(*) / sum(ln(d / 1.5)), 6) AS alpha "
            "FROM deg",
        "basket_rules_orders":
            "WITH b AS (SELECT DISTINCT l_orderkey AS bk, "
            "  l_partkey AS it FROM lineitem), "
            "n AS (SELECT count(DISTINCT bk) AS nb FROM b), "
            "ic AS (SELECT it, count(*) AS c FROM b GROUP BY it), "
            "pr AS (SELECT x.it AS antecedent, y.it AS consequent, "
            "  count(*)::BIGINT AS pair_count "
            "  FROM b x JOIN b y ON x.bk = y.bk AND x.it <> y.it "
            "  GROUP BY 1, 2 HAVING count(*) >= 2) "
            "SELECT antecedent, consequent, pair_count, support, "
            "confidence, lift FROM ("
            "  SELECT pr.antecedent, pr.consequent, pr.pair_count, "
            "  round(pr.pair_count / n.nb, 6) AS support, "
            "  round(pr.pair_count / ca.c, 6) AS confidence, "
            "  round((pr.pair_count / ca.c) / (cb.c / CAST(n.nb AS "
            "  DOUBLE)), 6) AS lift "
            "  FROM pr JOIN ic ca ON pr.antecedent = ca.it "
            "  JOIN ic cb ON pr.consequent = cb.it, n) "
            "WHERE confidence >= 0.08",
        "tfidf_name_links":
            "WITH sub AS (SELECT lpad(p_partkey::varchar, 9, '0') AS id, p_name "
            "  FROM part ORDER BY p_partkey LIMIT 300), "
            "nk AS (SELECT id, array_to_string(list_transform(list_filter("
            "  string_split_regex(regexp_replace(lower(p_name), '[^a-z0-9 ]+', ' ', 'g'), ' '), "
            f"  x -> x <> ''), x -> CASE x {num_case} ELSE x END), ' ') AS k FROM sub), "
            "s AS (SELECT id, '  ' || k || '  ' AS pad FROM nk WHERE k <> ''), "
            "g AS (SELECT id, list_distinct(list_transform(range(1, length(pad)-1), "
            "  i -> substring(pad, i, 3))) AS grams FROM s), "
            "post AS (SELECT id, unnest(grams) AS shingle FROM g), "
            "dfreq AS (SELECT shingle, count(*) AS df FROM post GROUP BY shingle), "
            # N derived from the subset itself — at small sfs LIMIT 300
            # yields fewer rows and the Spark kernel's df.count() must
            # see the same corpus size (review finding r3)
            "w AS (SELECT id, p.shingle, "
            "  ln(((SELECT count(*) FROM sub) + 1.0)/(df+1.0)) + 1.0 AS w "
            "  FROM post p JOIN dfreq USING (shingle)), "
            "norms AS (SELECT id, sum(w*w) AS n2 FROM w GROUP BY id), "
            "dots AS (SELECT a.id AS id1, b.id AS id2, sum(a.w*b.w) AS dot "
            "  FROM w a JOIN w b ON a.shingle = b.shingle AND a.id < b.id "
            "  GROUP BY a.id, b.id) "
            "SELECT id1, id2, round(sim, 4) AS sim FROM ("
            "  SELECT id1, id2, dot/sqrt(na.n2*nb.n2) AS sim FROM dots "
            "  JOIN norms na ON id1 = na.id JOIN norms nb ON id2 = nb.id) "
            "WHERE sim >= 0.7",
        "fuzzy_name_pairs":
            # the EXHAUSTIVE ground truth the blocked operator must
            # equal (its q-gram/length-band blocking is lossless by
            # the Gravano 2001 count-filter bound)
            "WITH n AS (SELECT DISTINCT c_name FROM customer "
            "  WHERE c_name IS NOT NULL) "
            "SELECT a.c_name AS name_a, b.c_name AS name_b, "
            "levenshtein(a.c_name, b.c_name) AS dist "
            "FROM n a JOIN n b ON a.c_name < b.c_name "
            "WHERE levenshtein(a.c_name, b.c_name) <= 1",
        "ngram_jaccard_exact":
            f"{shingle_cte} "
            "SELECT id1, id2, round(j, 4) AS jaccard FROM ("
            "  SELECT a.doc_id AS id1, b.doc_id AS id2, "
            "  CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0 "
            "  THEN len(list_intersect(a.grams, b.grams))::double "
            "  / len(list_distinct(list_concat(a.grams, b.grams))) ELSE 0.0 END AS j "
            "  FROM g a JOIN g b ON a.doc_id < b.doc_id) "
            "WHERE j >= 0.4",
        "simhash_signatures": simhash_sql,
        "embedding_near_dups": emb_neardup_sql,
        "agg_docs_by_lang":
            "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
        "agg_events_by_type":
            "SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value "
            "FROM events GROUP BY event_type",
        "distinct_users_per_type":
            "SELECT event_type, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type",
        "pricing_summary":
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "topk_parts_per_brand":
            "SELECT p_brand, p_partkey, p_retailprice, rk FROM ("
            "  SELECT p_brand, p_partkey, p_retailprice, "
            "  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk"
            "  FROM part) WHERE rk <= 3",
        "round_robin_events":
            "SELECT event_id, user_id, rk FROM ("
            "  SELECT event_id, user_id, value, "
            "  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk"
            "  FROM events) ORDER BY rk, value DESC, event_id LIMIT 50",
        "first_event_per_type":
            "SELECT event_type, event_id, round(value, 4) AS value FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk"
            "  FROM events) WHERE rk = 1",
        "minmax_order_price":
            "SELECT o_orderkey, round(CASE WHEN mx - mn < 1e-12 THEN 0.5 "
            "ELSE (o_totalprice - mn) / (mx - mn) END, 6) AS price_n FROM ("
            "  SELECT o_orderkey, o_totalprice, min(o_totalprice) OVER () AS mn, "
            "  max(o_totalprice) OVER () AS mx FROM orders)",
        "hybrid_blend":
            "WITH vec AS (SELECT user_id AS id, sum(value) AS vec FROM events GROUP BY user_id), "
            "kw AS (SELECT o_custkey AS id, count(*)::double AS kw FROM orders GROUP BY o_custkey), "
            "raw AS (SELECT coalesce(vec.id, kw.id) AS id, coalesce(vec, 0.0) AS vec, "
            "  coalesce(kw, 0.0) AS kw FROM vec FULL OUTER JOIN kw USING (id)), "
            "n AS (SELECT id, CASE WHEN max(vec) OVER () - min(vec) OVER () < 1e-12 THEN 0.5 "
            "  ELSE (vec - min(vec) OVER ()) / (max(vec) OVER () - min(vec) OVER ()) END AS vec_n, "
            "  CASE WHEN max(kw) OVER () - min(kw) OVER () < 1e-12 THEN 0.5 "
            "  ELSE (kw - min(kw) OVER ()) / (max(kw) OVER () - min(kw) OVER ()) END AS kw_n FROM raw) "
            "SELECT id, round(0.6 * vec_n + 0.4 * kw_n, 6) AS score FROM n "
            "ORDER BY score DESC, id LIMIT 25",
        "two_hop_customer_region":
            "SELECT r_name, count(*) AS n_customers FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
        "order_customer_lookup":
            "SELECT o_orderkey, coalesce(c_name, '?') AS cust FROM orders "
            "LEFT JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey LIMIT 100",
        "parts_never_ordered":
            "SELECT p_partkey, p_name FROM part WHERE p_partkey NOT IN "
            "(SELECT l_partkey FROM lineitem)",
        "dedup_docs_normalized":
            "SELECT doc_id, sha256(norm_key) AS key_hash FROM ("
            "  SELECT doc_id, norm_key, row_number() OVER (PARTITION BY norm_key ORDER BY doc_id) AS rk FROM ("
            "    SELECT doc_id, array_to_string(list_transform("
            "      list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' '), x -> x <> ''), "
            f"      x -> CASE x {num_case} ELSE x END), ' ') AS norm_key FROM documents)) "
            "WHERE rk = 1",
        "doc_content_hash":
            "SELECT doc_id, sha256(text) AS content_hash FROM documents",
        "canonicalize_docs":
            "SELECT doc_id, sha256(regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(regexp_replace(text, "
            "'\\r\\n', chr(10), 'g'), '\\r', chr(10), 'g'), '\\n{3,}', chr(10)||chr(10), 'g'), "
            "'[ \\t]+$', '', 'gm'), '[ \\t]{2,}', ' ', 'g'), "
            "'^\\s+|\\s+$', '', 'g')) AS canon_hash FROM documents",
        "safe_label_sources":
            "SELECT label, count(*) AS n FROM ("
            "  SELECT left(regexp_replace(replace(regexp_replace("
            "  coalesce(nullif(source, ''), 'Entity'), '^\\s+|\\s+$', '', 'g'), "
            "  ' ', '_'), '[^A-Za-z0-9_]', '_', 'g'), 64) AS label FROM documents) "
            "GROUP BY label",
        "embedding_decontam":
            # the IDENTICAL broadcast-exact kernel: every corpus x bench
            # cosine at 4dp, best qualifying match per corpus row
            "WITH b AS (SELECT vec_id AS bench_id, embedding AS bv "
            "FROM embeddings WHERE vec_id < 25),"
            "c AS (SELECT vec_id, embedding AS cv FROM embeddings "
            "WHERE vec_id >= 25),"
            "s AS (SELECT c.vec_id, b.bench_id,"
            "  round(list_cosine_similarity(c.cv, b.bv), 4) AS cos "
            "FROM c, b)"
            "SELECT vec_id, bench_id, cos FROM ("
            "  SELECT vec_id, bench_id, cos, row_number() OVER ("
            "    PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rn"
            "  FROM s WHERE cos >= 0.35) WHERE rn = 1",
        "cosine_topk":
            "SELECT vec_id, round(list_cosine_similarity(embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)), 4) AS score "
            "FROM embeddings ORDER BY score DESC, vec_id LIMIT 10",
        # identical regex chain (RE2-safe: no lookaheads) over the same
        # synthesized messy url — exercises fragment strip, multi-tracking-
        # param removal, separator repair, host lowering, default port,
        # trailing slash
        "url_normalize":
            r"WITH m AS (SELECT doc_id, regexp_replace("
            r"trim('HTTPS://Example.COM:443/' || doc_id || '/?utm_source=x&q=1&utm_b=2#frag'), "
            r"'#.*$', '') AS u FROM documents), "
            r"hq AS (SELECT doc_id, regexp_extract(u, '^([^?]*)', 1) AS head, "
            r"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            r"regexp_replace(u, '^[^?]*', ''), "
            r"'([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\1', 'g'), "
            r"'&&+', '&', 'g'), "
            r"'\?&', '?'), "
            r"'[?&]+$', '') AS q FROM m), "
            r"s AS (SELECT doc_id, head || q AS s5 FROM hq) "
            r"SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
            r"CASE WHEN regexp_extract(s5, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) = '' THEN s5 "
            r"ELSE lower(regexp_extract(s5, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) "
            r"|| regexp_replace(s5, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') END, "
            r"'^(https://[^/?#:]*):443([/?#].*)?$', '\1\2'), "
            r"'^(http://[^/?#:]*):80([/?#].*)?$', '\1\2'), "
            r"'^([^?]*[^/?])/$', '\1') AS url_norm FROM s",
        # IVF at nprobe == n_cells is exact, so the brute-force cosine SQL
        # is its oracle too
        "ivf_topk_full":
            "SELECT vec_id, round(list_cosine_similarity(embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)), 4) AS score "
            "FROM embeddings ORDER BY score DESC, vec_id LIMIT 10",
        # per-label IVF probing every cell of the queried label is exact
        # within that label
        "ivf_label_topk":
            "SELECT vec_id, round(list_cosine_similarity(embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)), 4) AS score "
            "FROM embeddings WHERE vec_id % 3 = 1 "
            "ORDER BY score DESC, vec_id LIMIT 10",
        # PQ with exact rerank over the full candidate set is exact too
        "pq_topk_rerank":
            "SELECT vec_id, round(list_cosine_similarity(embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)), 4) AS score "
            "FROM embeddings ORDER BY score DESC, vec_id LIMIT 10",
        # hyperplane LSH probing every bucket is exact as well
        "lsh_topk_full":
            "SELECT vec_id, round(list_cosine_similarity(embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)), 4) AS score "
            "FROM embeddings ORDER BY score DESC, vec_id LIMIT 10",
        "pairwise_topk":
            "WITH l AS (SELECT vec_id AS lid, embedding AS lv FROM embeddings "
            "  WHERE vec_id < 50), "
            "r AS (SELECT vec_id AS rid, embedding AS rv FROM embeddings "
            "  WHERE vec_id >= 50 AND vec_id < 150), "
            "s AS (SELECT lid, rid, list_cosine_similarity(lv, rv) AS sc "
            "  FROM l CROSS JOIN r), "
            "k AS (SELECT lid, rid, sc, row_number() OVER ("
            "  PARTITION BY lid ORDER BY sc DESC, rid) AS rank FROM s) "
            "SELECT lid, rid, round(sc, 4) AS score, rank FROM k "
            "WHERE rank <= 3",
        "token_counts":
            f"SELECT doc_id, len({_SQL_TOKENS}) AS n_tok FROM documents",
        "doc_repetition":
            # lines: trimmed non-empty split on \n; grams: inclusive
            # 3-word slices (toks[i:i+2]) exactly like the shingle CTE
            "SELECT doc_id, "
            "round(CASE WHEN len(l) > 0 THEN "
            "(len(l) - len(list_distinct(l)))::double / len(l) "
            "ELSE 0.0 END, 6) AS dup_line_frac, "
            "round(CASE WHEN len(toks) >= 3 THEN "
            "(len(g) - len(list_distinct(g)))::double / len(g) "
            "ELSE 0.0 END, 6) AS dup_trigram_frac FROM ("
            "  SELECT doc_id, toks, "
            "  list_filter(list_transform(string_split(text, chr(10)), "
            "  x -> trim(x)), x -> x <> '') AS l, "
            "  list_transform(range(1, greatest(len(toks) - 2, 1) + 1), "
            "  i -> array_to_string(toks[i:i+2], ' ')) AS g "
            f"  FROM (SELECT doc_id, text, {_SQL_TOKENS} AS toks "
            "   FROM documents))",
        "gopher_topgram":
            # most frequent n-gram per doc at n = 2, 3 — explode +
            # count + argmax (ties to smallest gram), exact-integer
            # fraction; the operator's sorted-run scan has identical
            # semantics by construction
            "WITH tt AS (SELECT doc_id,"
            f" {_SQL_TOKENS} AS toks FROM documents),"
            "b2 AS (SELECT doc_id, len(toks) AS ntok,"
            " length(array_to_string(toks, ' ')) AS total, toks"
            " FROM tt WHERE len(toks) >= 2),"
            "g2 AS (SELECT doc_id, total,"
            " array_to_string(toks[r.i:r.i+1], ' ') AS gram"
            " FROM b2, unnest(range(1, ntok)) AS r(i)),"
            "c2 AS (SELECT doc_id, total, gram, count(*) AS cnt"
            " FROM g2 GROUP BY 1, 2, 3),"
            "r2 AS (SELECT doc_id, 2 AS n, gram AS top_gram,"
            " cnt AS top_count,"
            " round(cnt * length(gram) / CAST(total AS DOUBLE), 6)"
            " AS top_char_frac FROM (SELECT *, row_number() OVER ("
            " PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rk"
            " FROM c2) WHERE rk = 1),"
            "b3 AS (SELECT doc_id, len(toks) AS ntok,"
            " length(array_to_string(toks, ' ')) AS total, toks"
            " FROM tt WHERE len(toks) >= 3),"
            "g3 AS (SELECT doc_id, total,"
            " array_to_string(toks[r.i:r.i+2], ' ') AS gram"
            " FROM b3, unnest(range(1, ntok - 1)) AS r(i)),"
            "c3 AS (SELECT doc_id, total, gram, count(*) AS cnt"
            " FROM g3 GROUP BY 1, 2, 3),"
            "r3 AS (SELECT doc_id, 3 AS n, gram AS top_gram,"
            " cnt AS top_count,"
            " round(cnt * length(gram) / CAST(total AS DOUBLE), 6)"
            " AS top_char_frac FROM (SELECT *, row_number() OVER ("
            " PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rk"
            " FROM c3) WHERE rk = 1)"
            "SELECT * FROM r2 UNION ALL SELECT * FROM r3",
        "dup_span_docs":
            # identical construction: k=8 gram postings keyed by the 16
            # hex-char sha256 head, corpus count >= 2 flags positions,
            # gaps > k break islands, spans sum per doc
            "WITH d AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '') AS toks FROM documents), "
            "g AS (SELECT doc_id, len(toks) AS n_tok, "
            "CASE WHEN len(toks) >= 8 THEN "
            "list_transform(range(1, len(toks) - 6), "
            "i -> substr(sha256(array_to_string(toks[i:i+7], ' ')), 1, 16)) "
            "ELSE []::VARCHAR[] END AS gk FROM d), "
            "p AS (SELECT doc_id, r.i AS pos, gk[r.i] AS gkey "
            "FROM g, unnest(range(1, len(gk) + 1)) AS r(i)), "
            "c AS (SELECT gkey FROM p GROUP BY gkey "
            "HAVING count(*) >= 2), "
            "f AS (SELECT p.doc_id, p.pos FROM p JOIN c USING (gkey)), "
            "i AS (SELECT doc_id, pos, CASE WHEN "
            "lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
            "OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8 "
            "THEN 1 ELSE 0 END AS brk FROM f), "
            "s AS (SELECT doc_id, pos, sum(brk) OVER ("
            "PARTITION BY doc_id ORDER BY pos) AS island FROM i), "
            "sp AS (SELECT doc_id, min(pos) AS s0, max(pos) + 7 AS e0 "
            "FROM s GROUP BY doc_id, island), "
            "a AS (SELECT doc_id, count(*) AS n_spans, "
            "CAST(sum(e0 - s0 + 1) AS BIGINT) AS dup_tokens "
            "FROM sp GROUP BY doc_id) "
            "SELECT g.doc_id, g.n_tok, "
            "CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans, "
            "CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens, "
            "round(CASE WHEN g.n_tok > 0 THEN "
            "coalesce(a.dup_tokens, 0) / CAST(g.n_tok AS DOUBLE) "
            "ELSE 0.0 END, 6) AS dup_frac "
            "FROM g LEFT JOIN a USING (doc_id)",
        "cms_user_counts":
            # identical construction: first 15 hex digits of
            # sha256('v1:<row>:<user_id>') mod 64, counted per
            # (event_type, row, bucket)
            "SELECT event_type, r.d AS r, "
            "CAST(('0x' || substr(sha256('v1:' || CAST(r.d AS VARCHAR) "
            "|| ':' || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT "
            "% 64 AS BIGINT) AS b, count(*) AS cnt "
            "FROM events, unnest(range(0, 4)) AS r(d) "
            "WHERE user_id IS NOT NULL GROUP BY 1, 2, 3",
        "cms_hot_users":
            "WITH cells AS (SELECT event_type, r.d AS r, "
            "CAST(('0x' || substr(sha256('v1:' || CAST(r.d AS VARCHAR) "
            "|| ':' || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT "
            "% 64 AS BIGINT) AS b, count(*) AS cnt "
            "FROM events, unnest(range(0, 4)) AS r(d) "
            "WHERE user_id IS NOT NULL GROUP BY 1, 2, 3), "
            "k AS (SELECT DISTINCT event_type, user_id FROM events "
            "WHERE user_id < 40), "
            "p AS (SELECT k.event_type, k.user_id, r.d AS r, "
            "CAST(('0x' || substr(sha256('v1:' || CAST(r.d AS VARCHAR) "
            "|| ':' || CAST(k.user_id AS VARCHAR)), 1, 15))::UBIGINT "
            "% 64 AS BIGINT) AS b FROM k, unnest(range(0, 4)) AS r(d)) "
            "SELECT p.event_type, p.user_id, "
            "CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS estimate "
            "FROM p LEFT JOIN cells ON p.event_type = cells.event_type "
            "AND p.r = cells.r AND p.b = cells.b "
            "GROUP BY 1, 2",
        "bloom_user_filter":
            "SELECT event_type, CAST(pos // 32 AS BIGINT) AS w, "
            "bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits "
            "FROM (SELECT event_type, "
            "CAST(('0x' || substr(sha256('v1:b' || CAST(r.d AS VARCHAR) "
            "|| ':' || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT "
            "% 512 AS BIGINT) AS pos "
            "FROM events, unnest(range(0, 3)) AS r(d) "
            "WHERE user_id IS NOT NULL) GROUP BY 1, 2",
        "bloom_member_probe":
            "WITH words AS (SELECT event_type, "
            "CAST(pos // 32 AS BIGINT) AS w, "
            "bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits "
            "FROM (SELECT event_type, "
            "CAST(('0x' || substr(sha256('v1:b' || CAST(r.d AS VARCHAR) "
            "|| ':' || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT "
            "% 512 AS BIGINT) AS pos "
            "FROM events, unnest(range(0, 3)) AS r(d) "
            "WHERE user_id IS NOT NULL) GROUP BY 1, 2), "
            "k AS (SELECT DISTINCT event_type, user_id FROM events "
            "WHERE user_id < 40 "
            "UNION SELECT DISTINCT event_type, user_id + 1000000 "
            "FROM events WHERE user_id < 15), "
            "p AS (SELECT k.event_type, k.user_id, "
            "CAST(('0x' || substr(sha256('v1:b' || CAST(r.d AS VARCHAR) "
            "|| ':' || CAST(k.user_id AS VARCHAR)), 1, 15))::UBIGINT "
            "% 512 AS BIGINT) AS pos "
            "FROM k, unnest(range(0, 3)) AS r(d)) "
            "SELECT p.event_type, p.user_id, "
            "bool_and(coalesce((words.bits & (CAST(1 AS BIGINT) << "
            "CAST(p.pos % 32 AS INT))) <> 0, false)) AS member "
            "FROM p LEFT JOIN words ON p.event_type = words.event_type "
            "AND CAST(p.pos // 32 AS BIGINT) = words.w "
            "GROUP BY 1, 2",
        "kmeans_vec_clusters":
            # metric stays RAW: the doubles are bit-identical across
            # engines by construction; rounding here would reintroduce
            # skew (Spark HALF_UP on decimal repr vs DuckDB binary round)
            "WITH " + _sql_kmeans_ctes("vec_id") +
            " SELECT vid AS vec_id, cid AS cluster_id, m AS metric FROM a2",
        "semantic_dedup_vecs":
            # kmeans over lpad'ed ids (matching the Spark query's input)
            # -> within-cluster integer-exact cosine pairs at 4dp ->
            # recursive transitive closure, min-id survivor
            "WITH RECURSIVE "
            + _sql_kmeans_ctes("lpad(CAST(vec_id AS VARCHAR), 9, '0')") +
            # RAW cosine (no rounding): exact int dot/norms + IEEE
            # sqrt/division are bit-identical across engines; rounding
            # would reintroduce HALF_UP-vs-binary boundary skew
            ", pr AS (SELECT a.vid AS id1, b.vid AS id2 "
            "FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vid < b.vid "
            "WHERE (CASE WHEN "
            "list_reduce(list_transform(range(1, 65), "
            "d -> a.qv[d] * a.qv[d]), (x, y) -> x + y) = 0 OR "
            "list_reduce(list_transform(range(1, 65), "
            "d -> b.qv[d] * b.qv[d]), (x, y) -> x + y) = 0 THEN 0.0 "
            "ELSE CAST(list_reduce(list_transform(range(1, 65), "
            "d -> a.qv[d] * b.qv[d]), (x, y) -> x + y) AS DOUBLE) / "
            "(sqrt(CAST(list_reduce(list_transform(range(1, 65), "
            "d -> a.qv[d] * a.qv[d]), (x, y) -> x + y) AS DOUBLE)) * "
            "sqrt(CAST(list_reduce(list_transform(range(1, 65), "
            "d -> b.qv[d] * b.qv[d]), (x, y) -> x + y) AS DOUBLE))) "
            "END) >= 0.35), "
            "e2 AS (SELECT id1 AS u, id2 AS v FROM pr "
            "UNION SELECT id2, id1 FROM pr), "
            "reach AS (SELECT u AS node, v AS r FROM e2 "
            "UNION SELECT reach.node, e.v FROM reach JOIN e2 e "
            "ON reach.r = e.u WHERE e.v <> reach.node) "
            "SELECT node AS vid, least(node, min(r)) AS keep_id, "
            "node = least(node, min(r)) AS is_kept "
            "FROM reach GROUP BY node",
        "asof_click_view":
            "WITH c AS (SELECT event_id, user_id, ts FROM events "
            "  WHERE event_type = 'click'), "
            "v AS (SELECT event_id AS view_id, user_id, ts FROM events "
            "  WHERE event_type = 'view') "
            "SELECT c.event_id, c.user_id, c.ts, "
            "v.view_id, v.ts AS view_ts "
            "FROM c ASOF JOIN v "
            "ON c.user_id = v.user_id AND c.ts >= v.ts",
        "winnow_docs":
            # identical 3-gram construction and sha256-head hash; the
            # window min runs over 4 consecutive 1-based positions,
            # kept for pos <= max(n - window + 1, 1)
            "WITH d AS (SELECT doc_id, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
            "  list_transform(range(1, len(toks) - 1), "
            "  i -> array_to_string(toks[i:i+2], ' ')) "
            "  ELSE []::VARCHAR[] END AS grams FROM d), "
            "e AS (SELECT doc_id, len(grams) AS n, "
            "  unnest(grams) AS gram, "
            "  unnest(range(1, len(grams) + 1)) AS pos FROM g), "
            "h AS (SELECT doc_id, n, pos, ('0x' || "
            "  substr(sha256('v1:' || gram), 1, 8))::UBIGINT AS hv "
            "  FROM e), "
            "w AS (SELECT doc_id, pos, n, min(hv) OVER ("
            "  PARTITION BY doc_id ORDER BY pos "
            "  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin "
            "  FROM h) "
            "SELECT DISTINCT doc_id, wmin AS fp FROM w "
            "WHERE pos <= greatest(n - 3, 1)",
        "pii_redaction": _pii_redaction_sql(),
        "c4_filter_docs": _c4_filter_sql(),
        "hist_price_cells":
            # identical floor-bucket arithmetic (double division, so
            # the same IEEE result on both engines)
            "SELECT o_orderpriority, CAST(floor((CAST(o_totalprice AS "
            "DOUBLE) - 0.0) / 25000.0) AS BIGINT) AS bucket, "
            "count(*) AS cnt FROM orders "
            "WHERE o_totalprice IS NOT NULL GROUP BY 1, 2",
        "hist_price_quantiles":
            # running/total counts over the cells, then per q the
            # smallest bucket whose running count reaches rank
            # ceil(q*total); est = bucket lower edge
            "WITH cells AS (SELECT o_orderpriority, "
            "  CAST(floor((CAST(o_totalprice AS DOUBLE) - 0.0) "
            "    / 25000.0) AS BIGINT) AS bucket, count(*) AS cnt "
            "  FROM orders WHERE o_totalprice IS NOT NULL "
            "  GROUP BY 1, 2), "
            "c AS (SELECT *, sum(cnt) OVER (PARTITION BY "
            "    o_orderpriority ORDER BY bucket) AS cum, "
            "  sum(cnt) OVER (PARTITION BY o_orderpriority) AS tot "
            "  FROM cells), "
            "g AS (SELECT o_orderpriority, "
            "  CAST(max(tot) AS BIGINT) AS total, "
            "  min(CASE WHEN cum >= greatest(1, ceil(0.5 * tot)) "
            "    THEN bucket END) AS b0, "
            "  min(CASE WHEN cum >= greatest(1, ceil(0.9 * tot)) "
            "    THEN bucket END) AS b1, "
            "  min(CASE WHEN cum >= greatest(1, ceil(0.99 * tot)) "
            "    THEN bucket END) AS b2 "
            "  FROM c GROUP BY 1) "
            "SELECT o_orderpriority, q, bucket, "
            "  0.0 + bucket * 25000.0 AS est, total FROM ("
            "  SELECT o_orderpriority, 0.5 AS q, b0 AS bucket, total "
            "    FROM g "
            "  UNION ALL SELECT o_orderpriority, 0.9, b1, total FROM g "
            "  UNION ALL SELECT o_orderpriority, 0.99, b2, total "
            "    FROM g)",
        "scc_event_graph":
            # exact SCCs by recursive-CTE transitive closure on the
            # same transition graph: scc(v) = min(v, min w with v->*w
            # and w->*v). Closure is the ORACLE's luxury (O(n^2) pairs
            # on the bounded state graph); the operator never builds it
            "WITH RECURSIVE e AS (SELECT user_id, ts, event_id, "
            "  event_type || ':' || CAST(extract(hour FROM ts) "
            "  AS VARCHAR) AS node FROM events), "
            "p AS (SELECT node AS src, lead(node) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id) AS dst "
            "  FROM e), "
            # DISTINCT over UNION ALL, not bare UNION: inside a WITH
            # RECURSIVE list DuckDB gives union-CTEs recursive
            # semantics and the plain-UNION dedupe is lost
            "n AS (SELECT DISTINCT id FROM ("
            "  SELECT src AS id FROM p WHERE dst IS NOT NULL "
            "  UNION ALL "
            "  SELECT dst FROM p WHERE dst IS NOT NULL)), "
            "g AS (SELECT DISTINCT src, dst FROM p "
            "  WHERE dst IS NOT NULL AND src <> dst), "
            "reach(src, dst) AS ("
            "  SELECT src, dst FROM g "
            "  UNION "
            "  SELECT r.src, g.dst FROM reach r "
            "  JOIN g ON r.dst = g.src), "
            "m AS (SELECT a.src AS id, min(a.dst) AS s FROM reach a "
            "  JOIN reach b ON a.src = b.dst AND a.dst = b.src "
            "  GROUP BY 1) "
            "SELECT n.id AS node, least(n.id, coalesce(m.s, n.id)) "
            "AS scc FROM n LEFT JOIN m USING (id)",
        "interleave_docs_order":
            # the identical hash draw, per-group rank, stride virtual
            # time (rank - 0.5)/weight, and vt-ordered global position
            "WITH b AS (SELECT doc_id, lang, "
            "  ('0x' || substr(sha256('v1:' || doc_id), 1, 8))::UBIGINT"
            "  / 4294967296.0 AS u FROM documents), "
            "r AS (SELECT doc_id, lang, CAST(row_number() OVER ("
            "  PARTITION BY lang ORDER BY u, doc_id) AS BIGINT) "
            "  AS grp_rank FROM b), "
            "v AS (SELECT doc_id, lang, grp_rank, "
            "  (CAST(grp_rank AS DOUBLE) - 0.5) / (CASE lang "
            "    WHEN 'en' THEN 4.0 WHEN 'zh' THEN 1.0 "
            "    WHEN 'de' THEN 1.0 WHEN 'es' THEN 2.0 "
            "    WHEN 'fr' THEN 2.0 END) AS vt FROM r) "
            "SELECT doc_id, lang, grp_rank, vt, "
            "  CAST(row_number() OVER (ORDER BY vt, lang, doc_id) "
            "  AS BIGINT) AS pos FROM v",
        "gopher_quality_docs":
            # identical shape statistics: raw \S+ words, char lengths,
            # '#'/'...'/'…' symbol count, [a-zA-Z] word fraction,
            # non-empty trimmed lines for bullet/ellipsis fractions,
            # engine-tokenized distinct stop-word hits; all ratios are
            # int/int double division so the bits match
            "WITH w AS (SELECT doc_id, "
            "  regexp_extract_all(text, '\\S+') AS words, "
            "  len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS nsym, "
            "  list_filter(list_transform(string_split(text, chr(10)), "
            "    l -> trim(l)), l -> l <> '') AS lines, "
            f"  len(list_intersect(list_distinct({_SQL_TOKENS}), "
            "    ['the','be','to','of','and','that','have','with'])) "
            "  AS n_stop FROM documents), "
            "s AS (SELECT doc_id, len(words) AS n_words, "
            "  CASE WHEN len(words) > 0 THEN "
            "    list_sum(list_transform(words, x -> length(x)))"
            "    ::DOUBLE / len(words) ELSE 0.0 END AS mwl, "
            "  CASE WHEN len(words) > 0 THEN "
            "    nsym / len(words) ELSE 0.0 END AS symr, "
            "  CASE WHEN len(words) > 0 THEN "
            "    len(list_filter(words, x -> "
            "    regexp_matches(x, '[a-zA-Z]'))) / len(words) "
            "    ELSE 0.0 END AS alphaf, "
            "  CASE WHEN len(lines) > 0 THEN "
            "    len(list_filter(lines, l -> substr(l, 1, 1) IN "
            "    ('•', '-', '*'))) / len(lines) ELSE 0.0 END AS bulf, "
            "  CASE WHEN len(lines) > 0 THEN "
            "    len(list_filter(lines, l -> l LIKE '%...' OR "
            "    l LIKE '%…')) / len(lines) ELSE 0.0 END AS ellf, "
            "  n_stop FROM w) "
            "SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len, "
            "round(symr, 6) AS symbol_ratio, "
            "round(alphaf, 6) AS alpha_word_frac, "
            "round(bulf, 6) AS bullet_line_frac, "
            "round(ellf, 6) AS ellipsis_line_frac, n_stopwords, keep "
            "FROM (SELECT *, n_stop AS n_stopwords, "
            "  (n_words >= 40 AND n_words <= 100000 "
            "   AND mwl >= 3.0 AND mwl <= 10.0 AND symr <= 0.1 "
            "   AND alphaf >= 0.8 AND bulf <= 0.9 AND ellf <= 0.3 "
            "   AND n_stop >= 1) AS keep FROM s)",
        "jaccard_decontam_docs":
            # identical tokenization, inclusive 2-gram slices, per-doc
            # distinct grams; candidates = shared-shingle pairs only;
            # best match = max jaccard, ties -> greatest bench id
            "WITH d AS (SELECT doc_id, source, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "g AS (SELECT doc_id, source, CASE WHEN len(toks) >= 2 "
            "  THEN list_distinct(list_transform(range(1, len(toks)), "
            "  i -> array_to_string(toks[i:i+1], ' '))) "
            "  ELSE []::VARCHAR[] END AS grams FROM d), "
            "b AS (SELECT doc_id AS bench_id, len(grams) AS bn, "
            "  unnest(grams) AS gram FROM g WHERE source = 'src0'), "
            "t AS (SELECT doc_id, grams FROM g WHERE source <> 'src0'), "
            "e AS (SELECT doc_id, unnest(grams) AS gram FROM t), "
            "p AS (SELECT e.doc_id, b.bench_id, max(b.bn) AS bn, "
            "  count(*) AS inter FROM e JOIN b USING (gram) "
            "  GROUP BY 1, 2), "
            "j AS (SELECT p.doc_id, p.bench_id, "
            "  p.inter / (len(t.grams) + p.bn - p.inter) AS jac, "
            "  row_number() OVER (PARTITION BY p.doc_id "
            "  ORDER BY p.inter / (len(t.grams) + p.bn - p.inter) "
            "  DESC, p.bench_id DESC) AS rn "
            "  FROM p JOIN t USING (doc_id)) "
            "SELECT t.doc_id, len(t.grams) AS n_grams, j.bench_id, "
            "round(coalesce(j.jac, 0.0), 6) AS jaccard, "
            "coalesce(j.jac, 0.0) >= 0.1 AS flagged "
            "FROM t LEFT JOIN (SELECT * FROM j WHERE rn = 1) j "
            "USING (doc_id)",
        "kmv_type_overlap":
            # replay the per-type bottom-32 sketches, then the
            # theta-sketch set algebra verbatim: K = 32 smallest of
            # the sketch union, n_both = K members present in both
            # sketches, union_est = 31/h_k past saturation
            "WITH h AS (SELECT DISTINCT event_type, "
            "  ('0x' || substr(sha256('v1:' || user_id), 1, 8))::UBIGINT"
            "  / 4294967296.0 AS u FROM events "
            "  WHERE user_id IS NOT NULL), "
            "r AS (SELECT event_type, u, row_number() OVER ("
            "  PARTITION BY event_type ORDER BY u) AS rn FROM h), "
            "s AS (SELECT event_type, list_sort(list(u)) AS sk "
            "  FROM r WHERE rn <= 32 GROUP BY 1), "
            "p AS (SELECT a.event_type AS t1, b.event_type AS t2, "
            "  a.sk AS sa, b.sk AS sb, "
            "  (list_sort(list_distinct(a.sk || b.sk)))[1:32] AS kk "
            "  FROM s a JOIN s b ON a.event_type < b.event_type), "
            "e AS (SELECT t1, t2, len(kk) AS k_used, "
            "  len(list_filter(kk, x -> list_contains(sa, x) AND "
            "  list_contains(sb, x))) AS n_both, "
            "  CASE WHEN len(kk) < 32 THEN len(kk)::DOUBLE "
            "  ELSE 31.0 / kk[-1] END AS union_est FROM p) "
            "SELECT t1, t2, k_used, n_both, "
            "round(union_est, 4) AS union_est, "
            "round((n_both / k_used) * union_est, 4) AS inter_est, "
            "round(n_both / k_used, 4) AS jaccard_est FROM e",
        "prefix_jaccard_pairs":
            # the exhaustive join IS the spec the prefix filter must
            # equal: distinct engine tokens, shared-token candidate
            # pairs, exact intersect/union verify at t=0.9
            "WITH d AS (SELECT doc_id, "
            f"list_distinct({_SQL_TOKENS}) AS toks FROM documents), "
            "e AS (SELECT doc_id, unnest(toks) AS tok FROM d), "
            "p AS (SELECT a.doc_id AS id1, b.doc_id AS id2 "
            "  FROM e a JOIN e b USING (tok) "
            "  WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
            "v AS (SELECT id1, id2, len(x.toks) AS n1, "
            "  len(y.toks) AS n2, "
            "  len(list_intersect(x.toks, y.toks))::DOUBLE "
            "  / len(list_distinct(x.toks || y.toks)) AS jac "
            "  FROM p JOIN d x ON x.doc_id = p.id1 "
            "  JOIN d y ON y.doc_id = p.id2) "
            "SELECT id1, id2, n1, n2, round(jac, 6) AS jaccard "
            "FROM v WHERE jac >= 0.9",
        "matching_parts":
            f"WITH {_sql_matching_ctes(6)} "
            "SELECT u, v, round FROM ("
            + " UNION ALL ".join(
                f"SELECT u, v, {r} AS round FROM sel{r}"
                for r in range(6))
            + ") WHERE (SELECT count(*) FROM pe6) = 0",
        "coarsen_parts":
            f"WITH {_sql_matching_ctes(6)}, "
            "m AS (SELECT u, v FROM ("
            + " UNION ALL ".join(
                f"SELECT u, v FROM sel{r}" for r in range(6))
            + ") WHERE (SELECT count(*) FROM pe6) = 0), "
            "pm AS (SELECT u AS id, least(u, v) AS s FROM m "
            "  UNION ALL SELECT v, least(u, v) FROM m), "
            "nodes AS (SELECT DISTINCT u AS id FROM me "
            "  UNION SELECT v FROM me), "
            "nm AS (SELECT nodes.id, coalesce(pm.s, nodes.id) AS s "
            "  FROM nodes LEFT JOIN pm ON pm.id = nodes.id) "
            "SELECT least(a.s, b.s) AS u, greatest(a.s, b.s) AS v, "
            "count(*)::BIGINT AS weight FROM me "
            "JOIN nm a ON a.id = me.u JOIN nm b ON b.id = me.v "
            "WHERE a.s <> b.s GROUP BY 1, 2",
        "multilevel_partition_parts":
            f"WITH {_sql_matching_ctes(6, 'part:m0')}, "
            "m AS (SELECT u, v FROM ("
            + " UNION ALL ".join(
                f"SELECT u, v FROM sel{r}" for r in range(6))
            + ") WHERE (SELECT count(*) FROM pe6) = 0), "
            "pm AS (SELECT u AS id, least(u, v) AS s FROM m "
            "  UNION ALL SELECT v, least(u, v) FROM m), "
            "menodes AS (SELECT DISTINCT u AS id FROM me "
            "  UNION SELECT v FROM me), "
            "nm AS (SELECT menodes.id, coalesce(pm.s, menodes.id) AS s "
            "  FROM menodes LEFT JOIN pm ON pm.id = menodes.id), "
            # coarse edges carry ORIGINAL adjacency counts; supernode
            # sizes carry member counts — the weight-aware coarse score
            "me2 AS (SELECT least(a.s, b.s) AS u, "
            "  greatest(a.s, b.s) AS v, count(*)::BIGINT AS weight "
            "  FROM me "
            "  JOIN nm a ON a.id = me.u JOIN nm b ON b.id = me.v "
            "  WHERE a.s <> b.s GROUP BY 1, 2), "
            "szs AS (SELECT s AS id, count(*)::BIGINT AS size FROM nm "
            "  GROUP BY s), "
            + _sql_balpart_rounds(
                "cg", "me2", 4, 2,
                "SELECT id, (('0x' || substr(sha256('part:' || id), 1, 8))"
                "::UBIGINT % 4)::INT AS part FROM cgnodes",
                weighted=True, size_cte="szs") + ", "
            "proj AS (SELECT nm.id, p.part FROM nm "
            "  JOIN cgp2 p ON p.id = nm.s), "
            + _sql_balpart_rounds(
                "f", "me", 4, 1,
                # init semantics: nodes absent from the projection (a
                # contracted ISOLATED pair has no coarse edges, so its
                # supernode never gets a coarse part) fall back to the
                # hash bucket, exactly like balanced_partitions(init=)
                "SELECT fnodes.id, coalesce(proj.part, "
                "(('0x' || substr(sha256('part:' || fnodes.id), 1, 8))"
                "::UBIGINT % 4)::INT) AS part "
                "FROM fnodes LEFT JOIN proj ON proj.id = fnodes.id") + " "
            "SELECT id, part FROM fp1",
        "psi_lang_drift":
            # identical arithmetic: per-side category counts, null-safe
            # full outer, Laplace 0.5 smoothing over the union size k
            "WITH b AS (SELECT lang AS category, count(*)::BIGINT AS "
            "  n_base FROM documents WHERE doc_id % 2 = 0 GROUP BY 1), "
            "c AS (SELECT lang AS category, count(*)::BIGINT AS n_cur "
            "  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1), "
            "j AS (SELECT coalesce(b.category, c.category) AS category, "
            "  coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur "
            "  FROM b FULL OUTER JOIN c "
            "  ON b.category IS NOT DISTINCT FROM c.category), "
            "t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc, "
            "  count(*) AS k FROM j) "
            "SELECT category, n_base, n_cur, "
            "round((n_base + 0.5) / (tb + 0.5 * k), 6) AS p_base, "
            "round((n_cur + 0.5) / (tc + 0.5 * k), 6) AS p_cur, "
            "round(((n_base + 0.5) / (tb + 0.5 * k) "
            "  - (n_cur + 0.5) / (tc + 0.5 * k)) "
            "  * ln(((n_base + 0.5) / (tb + 0.5 * k)) "
            "  / ((n_cur + 0.5) / (tc + 0.5 * k))), 6) AS psi_term "
            "FROM j, t",
        "roc_auc_orders":
            # identical aggregated Mann-Whitney form: per-score (p, n),
            # negatives strictly below via a running window, ties n/2
            "WITH base AS (SELECT CASE WHEN o_orderpriority = '1-URGENT' "
            "  THEN 1 ELSE 0 END AS lab, round(o_totalprice, -3) AS s "
            "  FROM orders), "
            "per AS (SELECT s, sum(lab)::BIGINT AS p, "
            "  sum(1 - lab)::BIGINT AS n FROM base GROUP BY s), "
            "c AS (SELECT p, n, coalesce(sum(n) OVER (ORDER BY s "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "  AS nb FROM per) "
            "SELECT round(sum(p::DOUBLE * (nb::DOUBLE + n::DOUBLE / 2.0)) "
            "  / (sum(p) * sum(n))::DOUBLE, 6) AS auc, "
            "sum(p)::BIGINT AS positives, sum(n)::BIGINT AS negatives "
            "FROM c",
        "chi2_lang_terms":
            # identical full-grid contingency arithmetic in exact ints,
            # chi2 = N*diff*diff/den as the same double expression
            "WITH base AS (SELECT doc_id, lang, "
            f"  list_distinct({_SQL_TOKENS}) AS toks FROM documents "
            "  WHERE lang IS NOT NULL), "
            "nn AS (SELECT count(*)::BIGINT AS n_total FROM base), "
            "cls AS (SELECT lang AS label, count(*)::BIGINT AS n_class "
            "  FROM base GROUP BY 1), "
            "tl AS (SELECT tok AS term, lang AS label, "
            "  count(*)::BIGINT AS a FROM ("
            "  SELECT doc_id, lang, unnest(toks) AS tok FROM base) "
            "  GROUP BY 1, 2), "
            "dft AS (SELECT term, sum(a)::BIGINT AS df_t FROM tl "
            "  GROUP BY term HAVING sum(a) >= 2), "
            "grid AS (SELECT dft.term, cls.label, dft.df_t, "
            "  cls.n_class, coalesce(tl.a, 0)::BIGINT AS a "
            "  FROM dft CROSS JOIN cls LEFT JOIN tl "
            "  ON tl.term = dft.term AND tl.label = cls.label), "
            "sc AS (SELECT label, term, a, df_t, n_class, "
            "  CASE WHEN (df_t) * (n_total - df_t) * (n_class) "
            "    * (n_total - n_class) > 0 THEN "
            "  n_total::DOUBLE "
            "  * (a * (n_total - df_t - n_class + a) "
            "     - (df_t - a) * (n_class - a))::DOUBLE "
            "  * (a * (n_total - df_t - n_class + a) "
            "     - (df_t - a) * (n_class - a))::DOUBLE "
            "  / ((df_t) * (n_total - df_t) * (n_class) "
            "     * (n_total - n_class))::DOUBLE ELSE 0.0 END AS chi2 "
            "  FROM grid CROSS JOIN nn) "
            "SELECT label, term, round(chi2, 6) AS chi2, a, df_t, "
            "n_class FROM (SELECT *, row_number() OVER ("
            "  PARTITION BY label ORDER BY chi2 DESC, term) AS rn "
            "  FROM sc) WHERE rn <= 5",
        "sq8_topk_vecs":
            # identical SQ8 arithmetic: per-dim double min/max codebook,
            # floor(t*255+0.5) encode clamped to 0..255 (degenerate dim
            # -> 0), decode mn + c/255*span, cosine vs the float query
            "WITH s AS (SELECT vec_id, list_transform(embedding, "
            "  x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
            "dims AS (SELECT r.d AS d, min(v[r.d]) AS mn, "
            "  max(v[r.d]) AS mx "
            "  FROM s, unnest(range(1, 65)) AS r(d) GROUP BY r.d), "
            "st AS (SELECT list(mn ORDER BY d) AS mins, "
            "  list(mx - mn ORDER BY d) AS spans FROM dims), "
            "dec AS (SELECT vec_id, list_transform(range(1, 65), "
            "  d -> CASE WHEN spans[d] > 0 THEN mins[d] + "
            "  greatest(0, least(255, CAST(floor((v[d] - mins[d]) "
            "  / spans[d] * 255.0 + 0.5) AS BIGINT))) / 255.0 * spans[d] "
            "  ELSE mins[d] END) AS dv FROM s, st), "
            "q AS (SELECT list_transform(embedding, "
            "  x -> CAST(x AS DOUBLE)) AS qv FROM embeddings "
            "  WHERE vec_id = 0) "
            "SELECT vec_id, round(list_cosine_similarity(dv, qv), 4) "
            "AS score FROM dec, q "
            "ORDER BY score DESC, vec_id LIMIT 10",
        "balanced_partition_parts":
            f"WITH {_sql_balpart_ctes()} SELECT id, part FROM p2",
        "partition_cut_parts":
            f"WITH {_sql_balpart_ctes()}, "
            "au AS (SELECT id AS u, part AS pu FROM p2), "
            "av AS (SELECT id AS v, part AS pv FROM p2), "
            "cut AS (SELECT sum(CASE WHEN pu <> pv THEN 1 ELSE 0 END)"
            "::BIGINT AS cut_edges, count(*) AS total_edges "
            "  FROM pairs JOIN au USING (u) JOIN av USING (v)), "
            "loads AS (SELECT count(*)::INT AS n_parts, max(l) AS max_load, "
            "  min(l) AS min_load FROM (SELECT part, count(*) AS l "
            "  FROM p2 GROUP BY part)) "
            "SELECT cut_edges, total_edges, "
            "round(cut_edges::DOUBLE / total_edges, 6) AS cut_fraction, "
            "0::BIGINT AS uncovered_edges, "
            "n_parts, max_load, min_load FROM cut, loads",
        "neighborhood_samples_parts":
            # both hops unrolled with the identical sha256 rank:
            # u = hex8(sha256('v1:<hop>:<root>:<src>:<dst>')) / 2^32,
            # ties by dst string; fanouts 3 then 2
            "WITH pairs AS ("
            "  SELECT DISTINCT a.l_partkey::varchar AS u, "
            "         b.l_partkey::varchar AS v "
            "  FROM lineitem a JOIN lineitem b "
            "  ON a.l_orderkey = b.l_orderkey "
            "  AND a.l_partkey < b.l_partkey), "
            "e AS (SELECT u AS src, v AS dst FROM pairs "
            "  UNION SELECT v, u FROM pairs), "
            "seeds AS (SELECT DISTINCT l_partkey::varchar AS root "
            "  FROM lineitem WHERE l_partkey <= 50), "
            "h1 AS (SELECT root, 1 AS hop, e.src, e.dst, "
            "  row_number() OVER (PARTITION BY root, e.src ORDER BY "
            "  ('0x' || substr(sha256('v1:1:' || root || ':' || e.src "
            "   || ':' || e.dst), 1, 8))::UBIGINT / 4294967296.0, "
            "  e.dst) AS rn "
            "  FROM seeds JOIN e ON e.src = seeds.root), "
            "s1 AS (SELECT root, hop, src, dst FROM h1 WHERE rn <= 3), "
            "f1 AS (SELECT DISTINCT root, dst AS node FROM s1), "
            "h2 AS (SELECT root, 2 AS hop, e.src, e.dst, "
            "  row_number() OVER (PARTITION BY root, e.src ORDER BY "
            "  ('0x' || substr(sha256('v1:2:' || root || ':' || e.src "
            "   || ':' || e.dst), 1, 8))::UBIGINT / 4294967296.0, "
            "  e.dst) AS rn "
            "  FROM f1 JOIN e ON e.src = f1.node) "
            "SELECT root, hop, src, dst FROM s1 "
            "UNION ALL SELECT root, hop, src, dst FROM h2 WHERE rn <= 2",
        "containment_doc_pairs":
            # exhaustive shared-token join + containment |A∩B|/|A|
            # over the same derived corpus (quote docs = first 100
            # chars of every 7th doc, id + 10^6)
            "WITH corpus AS ("
            "  SELECT doc_id, text FROM documents "
            "  UNION ALL SELECT doc_id + 1000000, substring(text, 1, 100) "
            "  FROM documents WHERE doc_id % 7 = 0), "
            f"d AS (SELECT doc_id, list_distinct({_SQL_TOKENS}) AS toks "
            "  FROM corpus), "
            "e AS (SELECT doc_id, unnest(toks) AS tok FROM d), "
            "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "  FROM e a JOIN e b USING (tok) "
            "  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2), "
            "v AS (SELECT id_a, id_b, len(x.toks) AS n_a, "
            "  len(y.toks) AS n_b, "
            "  len(list_intersect(x.toks, y.toks))::DOUBLE "
            "  / len(x.toks) AS c "
            "  FROM p JOIN d x ON x.doc_id = p.id_a "
            "  JOIN d y ON y.doc_id = p.id_b WHERE len(x.toks) > 0) "
            "SELECT id_a, id_b, n_a, n_b, round(c, 6) AS containment "
            "FROM v WHERE c >= 0.8",
        "event_rate_anomalies":
            # identical arithmetic: hourly counts, dense per-key grid,
            # trailing [24 PRECEDING, 1 PRECEDING] integer sums,
            # mean = s/n, var = (ss - s*s/n)/(n-1), z past 8 priors
            "WITH c AS (SELECT event_type AS key, "
            "  date_trunc('hour', ts) AS b, count(*) AS cnt "
            "  FROM events WHERE ts IS NOT NULL "
            "  AND event_type IS NOT NULL GROUP BY 1, 2), "
            "g AS (SELECT key, unnest(generate_series(min(b), max(b), "
            "  INTERVAL 1 HOUR)) AS bucket_ts FROM c GROUP BY key), "
            "d AS (SELECT g.key, g.bucket_ts, "
            "  coalesce(c.cnt, 0) AS cnt FROM g LEFT JOIN c "
            "  ON c.key = g.key AND c.b = g.bucket_ts), "
            "s AS (SELECT key, bucket_ts, cnt, "
            "  count(cnt) OVER w AS n_prior, sum(cnt) OVER w AS s, "
            "  sum(cnt * cnt) OVER w AS ss FROM d WINDOW w AS ("
            "  PARTITION BY key ORDER BY bucket_ts "
            "  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)), "
            "t AS (SELECT key, bucket_ts, cnt, n_prior, "
            "  CASE WHEN n_prior >= 1 THEN s / n_prior END AS mp, "
            "  CASE WHEN n_prior >= 2 THEN "
            "  (ss - s * s / n_prior) / (n_prior - 1) END AS vp "
            "  FROM s), "
            "z AS (SELECT *, CASE WHEN n_prior >= 8 AND vp > 0 THEN "
            "  (cnt - mp) / sqrt(vp) END AS zz FROM t) "
            "SELECT key, bucket_ts, cnt, n_prior, "
            "coalesce(round(mp, 6), 'NaN'::DOUBLE) AS mean_prior, "
            "coalesce(round(vp, 6), 'NaN'::DOUBLE) AS var_prior, "
            "coalesce(round(zz, 6), 'NaN'::DOUBLE) AS z, "
            "coalesce(abs(zz) >= 3.0, false) AS anomaly FROM z",
        "ranking_docs_eval":
            # identical rank derivation (score desc, doc asc), top-10,
            # exponential-gain DCG, IDCG from the relevance list
            # re-ranked rel desc / doc asc, left-join conventions
            "WITH res AS (SELECT source AS qid, doc_id AS doc, "
            "  n_chars::DOUBLE AS score FROM documents), "
            "rel AS (SELECT source AS qid, doc_id AS doc, "
            "  CASE lang WHEN 'en' THEN 3.0 WHEN 'de' THEN 2.0 "
            "  WHEN 'fr' THEN 1.0 ELSE 0.0 END AS rel "
            "  FROM documents), "
            "topk AS (SELECT * FROM (SELECT qid, doc, row_number() "
            "  OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) "
            "  AS rnk FROM res) WHERE rnk <= 10), "
            "j AS (SELECT t.qid, t.rnk, coalesce(r.rel, 0.0) AS rel "
            "  FROM topk t LEFT JOIN rel r "
            "  ON r.qid = t.qid AND r.doc = t.doc), "
            "pq AS (SELECT qid, sum((pow(2.0, rel) - 1) "
            "  / log2(rnk + 1)) AS dcg, "
            "  min(CASE WHEN rel > 0 THEN rnk END) AS first_rel, "
            "  sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits "
            "  FROM j GROUP BY qid), "
            "ideal AS (SELECT qid, sum(CASE WHEN irank <= 10 THEN "
            "  (pow(2.0, rel) - 1) / log2(irank + 1) END) AS idcg, "
            "  count(*) AS n_rel FROM (SELECT qid, rel, row_number() "
            "  OVER (PARTITION BY qid ORDER BY rel DESC, doc ASC) "
            "  AS irank FROM rel WHERE rel > 0) GROUP BY qid) "
            "SELECT pq.qid AS query_id, "
            "round(CASE WHEN first_rel IS NOT NULL "
            "  THEN 1.0 / first_rel ELSE 0.0 END, 6) AS mrr, "
            "round(CASE WHEN coalesce(idcg, 0.0) > 0 "
            "  THEN dcg / idcg ELSE 0.0 END, 6) AS ndcg, "
            "round(hits / 10.0, 6) AS precision_k, "
            "round(CASE WHEN coalesce(n_rel, 0) > 0 "
            "  THEN hits::DOUBLE / n_rel ELSE 0.0 END, 6) AS recall_k, "
            "coalesce(n_rel, 0) AS n_rel "
            "FROM pq LEFT JOIN ideal ON ideal.qid = pq.qid",
        "classification_lang_eval":
            # same noisy predictor; tp / predicted / actual aggregates
            "WITH p AS (SELECT lang AS label, CASE WHEN "
            "  n_chars % 7 = 0 THEN 'en' ELSE lang END AS pred "
            "  FROM documents), "
            "tp AS (SELECT label AS cls, count(*) AS tp FROM p "
            "  WHERE label = pred GROUP BY 1), "
            "pn AS (SELECT pred AS cls, count(*) AS n_pred "
            "  FROM p GROUP BY 1), "
            "an AS (SELECT label AS cls, count(*) AS support "
            "  FROM p GROUP BY 1), "
            "m AS (SELECT cls, coalesce(tp.tp, 0) AS tp, "
            "  coalesce(pn.n_pred, 0) AS n_pred, "
            "  coalesce(an.support, 0) AS support "
            "  FROM an FULL JOIN pn USING (cls) "
            "  LEFT JOIN tp USING (cls)), "
            "r AS (SELECT cls, CASE WHEN n_pred > 0 THEN "
            "  tp::DOUBLE / n_pred ELSE 0.0 END AS prec, "
            "  CASE WHEN support > 0 THEN tp::DOUBLE / support "
            "  ELSE 0.0 END AS rec, support FROM m) "
            "SELECT cls, round(prec, 6) AS precision, "
            "round(rec, 6) AS recall, "
            "round(CASE WHEN prec + rec > 0 THEN "
            "  2 * prec * rec / (prec + rec) ELSE 0.0 END, 6) AS f1, "
            "support FROM r",
        "profile_documents":
            # melt every documents column to (col_name, string form,
            # schema-typed double form), then the same two aggregates:
            # plain stats + the engine's sha256 bottom-64 KMV distinct
            # estimate ((k-1)/h_k above k, exact below). Numeric stats
            # NaN for string columns (the runner canonicalizes NaN,
            # not NULL doubles).
            "WITH m AS ("
            "  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) "
            "    AS sval, CAST(doc_id AS DOUBLE) AS dval FROM documents"
            "  UNION ALL SELECT 'text', text, NULL FROM documents"
            "  UNION ALL SELECT 'lang', lang, NULL FROM documents"
            "  UNION ALL SELECT 'source', source, NULL FROM documents"
            "  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR), "
            "    CAST(n_chars AS DOUBLE) FROM documents), "
            "st AS (SELECT col_name, count(*) AS n_rows, "
            "  sum(CASE WHEN sval IS NULL THEN 1 ELSE 0 END)::BIGINT "
            "    AS n_null, "
            "  min(sval) AS min_str, max(sval) AS max_str, "
            "  min(dval) AS min_num, max(dval) AS max_num, "
            "  sum(dval) AS dsum, count(dval) AS dn "
            "  FROM m GROUP BY 1), "
            "h AS (SELECT DISTINCT col_name, "
            "  ('0x' || substr(sha256('v1:' || sval), 1, 8))::UBIGINT "
            "  / 4294967296.0 AS u FROM m WHERE sval IS NOT NULL), "
            "r AS (SELECT col_name, u, row_number() OVER ("
            "  PARTITION BY col_name ORDER BY u) AS rn FROM h), "
            "kk AS (SELECT col_name, count(*) AS n_min, max(u) AS kth "
            "  FROM r WHERE rn <= 64 GROUP BY 1) "
            "SELECT st.col_name, st.n_rows, st.n_null, "
            "round(st.n_null::DOUBLE / st.n_rows, 6) AS null_frac, "
            "round(coalesce(CASE WHEN kk.n_min < 64 THEN "
            "  kk.n_min::DOUBLE ELSE 63.0 / kk.kth END, 0.0), 6) "
            "  AS distinct_est, "
            "coalesce(kk.n_min < 64, TRUE) AS distinct_exact, "
            "st.min_str, st.max_str, "
            "coalesce(st.min_num, 'NaN'::DOUBLE) AS min_num, "
            "coalesce(st.max_num, 'NaN'::DOUBLE) AS max_num, "
            "coalesce(round(CASE WHEN st.dn > 0 THEN st.dsum / st.dn "
            "  END, 6), 'NaN'::DOUBLE) AS mean_num "
            "FROM st LEFT JOIN kk USING (col_name)",
        "funnel_view_click_purchase":
            # greedy-earliest first-touch chain: step k = min ts
            # strictly after step k-1, all inside t1 + 48h
            "WITH e AS (SELECT user_id u, event_type k, ts "
            "  FROM events), "
            "s1 AS (SELECT u, min(ts) AS t1 FROM e WHERE k = 'view' "
            "  GROUP BY 1), "
            "s2 AS (SELECT e.u, min(ts) AS t2, max(t1) AS t1 FROM e "
            "  JOIN s1 ON e.u = s1.u WHERE k = 'click' AND ts > t1 "
            "  AND ts <= t1 + INTERVAL 48 HOUR GROUP BY 1), "
            "s3 AS (SELECT e.u, min(ts) AS t3 FROM e "
            "  JOIN s2 ON e.u = s2.u WHERE k = 'purchase' AND ts > t2 "
            "  AND ts <= t1 + INTERVAL 48 HOUR GROUP BY 1) "
            "SELECT 1 AS step, count(*) AS n_users FROM s1 "
            "UNION ALL SELECT 2, count(*) FROM s2 "
            "UNION ALL SELECT 3, count(*) FROM s3",
        "retention_weekly":
            "WITH f AS (SELECT user_id u, "
            "  date_trunc('week', min(ts)) AS cw FROM events "
            "  WHERE event_type = 'signup' GROUP BY 1), "
            "a AS (SELECT DISTINCT user_id u, "
            "  date_trunc('week', ts) AS aw FROM events) "
            "SELECT f.cw AS cohort_week, "
            "CAST(date_diff('day', f.cw, a.aw) // 7 AS INT) "
            "AS week_index, count(DISTINCT a.u) AS n_users "
            "FROM a JOIN f ON a.u = f.u WHERE a.aw >= f.cw "
            "GROUP BY 1, 2",
        "token_length_quantiles":
            # the IDENTICAL hash sample + type-1 rank arithmetic
            "WITH s AS (SELECT doc_id AS _id,"
            f"  len({_SQL_TOKENS}) AS value FROM documents"
            "  WHERE ('0x' || substr(sha256('v1:' || doc_id), 1, 8))"
            "::UBIGINT / 4294967296.0 < 0.5),"
            "r AS (SELECT value, row_number() OVER ("
            "  ORDER BY value, _id) AS rn,"
            "  count(*) OVER () AS n_sample FROM s),"
            "p AS (SELECT unnest([0.5, 0.9, 0.99]) AS p)"
            "SELECT p.p, r.n_sample, r.value FROM r JOIN p"
            "  ON r.rn = CAST(ceil(p.p * r.n_sample) AS BIGINT)",
        "sliding_distinct_users":
            # the IDENTICAL bucket-sketch-then-merge construction:
            # bottom-32 per 3h bucket, each window = bottom-32 of its
            # two buckets' union
            "WITH h AS (SELECT DISTINCT "
            "  CAST(floor(epoch(ts) / 10800) * 10800 AS BIGINT) AS b,"
            "  event_type,"
            "  ('0x' || substr(sha256('v1:' || user_id), 1, 8))::UBIGINT"
            "  / 4294967296.0 AS u FROM events"
            "  WHERE user_id IS NOT NULL AND ts IS NOT NULL),"
            "bs AS (SELECT b, event_type, u FROM ("
            "  SELECT b, event_type, u, row_number() OVER ("
            "  PARTITION BY b, event_type ORDER BY u) AS rn FROM h)"
            "  WHERE rn <= 32),"
            "asn AS (SELECT DISTINCT t.ws AS win_start_sec, event_type, u"
            "  FROM bs, unnest([b - 10800, b]) AS t(ws)),"
            "wk AS (SELECT win_start_sec, event_type, u FROM ("
            "  SELECT win_start_sec, event_type, u, row_number() OVER ("
            "  PARTITION BY win_start_sec, event_type ORDER BY u) AS rn"
            "  FROM asn) WHERE rn <= 32)"
            "SELECT win_start_sec, event_type, count(*) AS n_min,"
            "  round(CASE WHEN count(*) < 32 THEN CAST(count(*) AS DOUBLE)"
            "  ELSE 31.0 / max(u) END, 4) AS estimate "
            "FROM wk GROUP BY win_start_sec, event_type",
        "kmv_user_sketch":
            # the IDENTICAL deterministic bottom-k construction: first
            # 8 hex digits of sha256('v1:'||user_id) over 2^32, k
            # smallest per group, (k-1)/h_k above k, exact below
            "WITH h AS (SELECT DISTINCT event_type, "
            "  ('0x' || substr(sha256('v1:' || user_id), 1, 8))::UBIGINT"
            "  / 4294967296.0 AS u FROM events "
            "  WHERE user_id IS NOT NULL), "
            "r AS (SELECT event_type, u, row_number() OVER ("
            "  PARTITION BY event_type ORDER BY u) AS rn FROM h), "
            "kk AS (SELECT event_type, count(*) AS n_min, max(u) AS kth"
            "  FROM r WHERE rn <= 32 GROUP BY 1), "
            "ex AS (SELECT event_type, count(DISTINCT user_id) AS exact"
            "  FROM events GROUP BY 1) "
            "SELECT kk.event_type, kk.n_min, "
            "round(CASE WHEN kk.n_min < 32 THEN kk.n_min::DOUBLE "
            "ELSE 31.0 / kk.kth END, 4) AS estimate, ex.exact "
            "FROM kk JOIN ex USING (event_type)",
        "event_rollup":
            # each level aggregated DIRECTLY from raw events (epoch-
            # aligned buckets, like Spark window()): equality proves
            # the engine's fine->coarse re-aggregation is lossless
            "SELECT '1 hour' AS level, to_timestamp(floor(epoch(ts) / "
            "3600) * 3600) AS bucket_start, event_type, count(*) AS n, "
            "round(sum(value), 4) AS v_sum FROM events GROUP BY 2, 3 "
            "UNION ALL "
            "SELECT '6 hours', to_timestamp(floor(epoch(ts) / 21600) * "
            "21600), event_type, count(*), round(sum(value), 4) "
            "FROM events GROUP BY 2, 3 "
            "UNION ALL "
            "SELECT '1 day', to_timestamp(floor(epoch(ts) / 86400) * "
            "86400), event_type, count(*), round(sum(value), 4) "
            "FROM events GROUP BY 2, 3",
        "range_join_events":
            "WITH s AS (SELECT user_id, event_id AS span_id, ts AS t0, "
            "  ts + INTERVAL 2 HOUR AS t1 FROM events "
            "  WHERE event_type = 'signup'), "
            "c AS (SELECT event_id, user_id, ts FROM events "
            "  WHERE event_type = 'click') "
            "SELECT c.event_id, c.user_id, c.ts, s.span_id "
            "FROM c JOIN s ON c.user_id = s.user_id "
            "AND c.ts >= s.t0 AND c.ts < s.t1",
        "tfidf_top_terms":
            "WITH d AS (SELECT doc_id, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS term FROM d), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM t "
            "  GROUP BY 1, 2), "
            "dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1), "
            "n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents), "
            "s AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.dfreq, "
            "  tf.tf * ln(n.n_docs / dfreq.dfreq) AS score "
            "  FROM tf JOIN dfreq USING (term) CROSS JOIN n), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "  ORDER BY score DESC, term) AS rank FROM s) "
            "SELECT doc_id, term, tf, dfreq, round(score, 6) AS score, "
            "rank FROM r WHERE rank <= 3",
        "unigram_perplexity":
            "WITH d AS (SELECT doc_id, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS term FROM d), "
            "c AS (SELECT term, count(*) AS c FROM t GROUP BY 1), "
            "tot AS (SELECT sum(c)::DOUBLE AS total FROM c), "
            "lp AS (SELECT t.doc_id, ln(c.c / tot.total) AS lp "
            "  FROM t JOIN c USING (term) CROSS JOIN tot), "
            "agg AS (SELECT doc_id, count(*) AS n_tok, "
            "  avg(lp) AS avg_logprob FROM lp GROUP BY 1) "
            "SELECT b.doc_id, coalesce(a.n_tok, 0) AS n_tok, "
            "round(a.avg_logprob, 6) AS avg_logprob "
            "FROM (SELECT doc_id FROM documents) b "
            "LEFT JOIN agg a USING (doc_id)",
        "bigram_perplexity":
            "WITH d AS (SELECT doc_id, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 "
            "  FROM d, unnest(range(1, len(toks))) AS r(i) "
            "  WHERE len(toks) >= 2), "
            "c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2), "
            "c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1), "
            "t AS (SELECT unnest(toks) AS term FROM d), "
            "v AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM t), "
            "lp AS (SELECT bg.doc_id, "
            "  ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)) AS lp "
            "  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) "
            "  CROSS JOIN v), "
            "agg AS (SELECT doc_id, count(*) AS n_big, "
            "  avg(lp) AS avg_logprob FROM lp GROUP BY 1) "
            "SELECT b.doc_id, coalesce(a.n_big, 0) AS n_big, "
            "round(a.avg_logprob, 6) AS avg_logprob "
            "FROM (SELECT doc_id FROM documents) b "
            "LEFT JOIN agg a USING (doc_id)",
        "nb_lang_scores":
            # multinomial NB replay: MLE priors over seed docs,
            # Lidstone k=1 likelihoods over the seed vocabulary,
            # OOV dropped by the inner join to the model table
            "WITH seeds AS (SELECT lang AS label, text FROM documents "
            "  WHERE doc_id % 2 = 0 AND lang IS NOT NULL "
            "  AND text IS NOT NULL), "
            "st AS (SELECT label, unnest("
            f"{_SQL_TOKENS}) AS term FROM seeds), "
            "cwc AS (SELECT label, term, count(*) AS cnt "
            "  FROM st GROUP BY 1, 2), "
            "ctot AS (SELECT label, count(*)::DOUBLE AS tok_c "
            "  FROM st GROUP BY 1), "
            "vocab AS (SELECT DISTINCT term FROM st), "
            "v AS (SELECT count(*)::DOUBLE AS v FROM vocab), "
            "n1 AS (SELECT count(*)::DOUBLE AS n_seed FROM seeds), "
            "priors AS (SELECT label, ln(count(*) / any_value(n1.n_seed))"
            "  AS prior_lp FROM seeds CROSS JOIN n1 GROUP BY label), "
            "model AS (SELECT vocab.term, ctot.label, "
            "  ln((coalesce(cwc.cnt, 0) + 1.0) / (ctot.tok_c + 1.0 * v.v))"
            "  AS lp FROM vocab CROSS JOIN ctot "
            "  LEFT JOIN cwc ON cwc.label = ctot.label "
            "  AND cwc.term = vocab.term CROSS JOIN v), "
            "d AS (SELECT doc_id, "
            f"{_SQL_TOKENS} AS toks FROM documents WHERE doc_id % 2 = 1), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM "
            "  (SELECT doc_id, unnest(toks) AS term FROM d) GROUP BY 1, 2), "
            "sums AS (SELECT tf.doc_id, m.label, sum(tf.tf) AS n_hit, "
            "  sum(tf.tf * m.lp) AS ev FROM tf "
            "  JOIN model m ON tf.term = m.term GROUP BY 1, 2) "
            "SELECT b.doc_id, p.label, "
            "coalesce(s.n_hit, 0)::BIGINT AS n_hit, "
            "round(p.prior_lp + coalesce(s.ev, 0.0), 4) AS score "
            "FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) b "
            "CROSS JOIN priors p "
            "LEFT JOIN sums s ON s.doc_id = b.doc_id AND s.label = p.label",
        "dsir_weights_docs":
            # identical hashed-feature construction: sha256 head of
            # 'v1:u:<tok>' / 'v1:b:<w1> <w2>' mod 4096, Lidstone-0.5
            # target (lang='en') vs raw (all docs) unigram models;
            # target ⊆ raw shares one feature pass tagged by lang
            "WITH d AS (SELECT doc_id, lang, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "u AS (SELECT doc_id, lang, 'v1:u:' || t AS s FROM "
            "  (SELECT doc_id, lang, unnest(toks) AS t FROM d)), "
            "bg AS (SELECT doc_id, lang, "
            "  'v1:b:' || toks[i] || ' ' || toks[i+1] AS s "
            "  FROM d, unnest(range(1, len(toks))) AS r(i) "
            "  WHERE len(toks) >= 2), "
            "f AS (SELECT doc_id, lang, "
            "  ('0x' || substr(sha256(s), 1, 8))::UBIGINT % 4096 AS b "
            "  FROM (SELECT * FROM u UNION ALL SELECT * FROM bg)), "
            "tc AS (SELECT b, count(*) AS tc FROM f "
            "  WHERE lang = 'en' GROUP BY 1), "
            "rc AS (SELECT b, count(*) AS rc FROM f GROUP BY 1), "
            "tt AS (SELECT coalesce(sum(tc), 0)::DOUBLE AS tt FROM tc), "
            "rt AS (SELECT coalesce(sum(rc), 0)::DOUBLE AS rt FROM rc), "
            "lp AS (SELECT f.doc_id, ln("
            "  ((coalesce(tc.tc, 0) + 0.5) / (tt.tt + 0.5 * 4096)) "
            "  / ((rc.rc + 0.5) / (rt.rt + 0.5 * 4096))) AS lr "
            "  FROM f JOIN rc USING (b) LEFT JOIN tc USING (b) "
            "  CROSS JOIN tt CROSS JOIN rt), "
            "agg AS (SELECT doc_id, count(*) AS n_feat, sum(lr) AS lr "
            "  FROM lp GROUP BY 1) "
            "SELECT b2.doc_id, coalesce(a.n_feat, 0)::BIGINT AS n_feat, "
            "round(coalesce(a.lr, 0.0), 4) AS log_ratio "
            "FROM (SELECT doc_id FROM documents) b2 "
            "LEFT JOIN agg a USING (doc_id)",
        "bm25_doc_search":
            # identical tokenization and arithmetic structure:
            # idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
            # norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
            "WITH d AS (SELECT doc_id, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "l AS (SELECT doc_id, len(toks) AS dl FROM d), "
            "s AS (SELECT count(*)::DOUBLE AS n_docs, "
            "  avg(dl) AS avgdl FROM l), "
            "t AS (SELECT doc_id, unnest(toks) AS term FROM d), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM t "
            "  WHERE term IN ('join', 'order', 'spark', 'table') "
            "  GROUP BY 1, 2), "
            "df AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1), "
            "p AS (SELECT tf.doc_id, "
            "  ln(1 + (s.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5)) "
            "  * (tf.tf * (1.2 + 1) / (tf.tf + 1.2 * "
            "  (1 - 0.75 + 0.75 * l.dl / s.avgdl))) AS contrib "
            "  FROM tf JOIN df USING (term) JOIN l USING (doc_id) "
            "  CROSS JOIN s) "
            "SELECT doc_id, count(*) AS n_hit, "
            "round(sum(contrib), 6) AS score FROM p GROUP BY 1",
        "ngram_diversity_sources":
            # same tokenization; inclusive slices toks[i:i+n-1]; a
            # group with no grams of size n yields no row for that n
            "WITH d AS (SELECT source, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "g AS ("
            "SELECT source, CAST(1 AS INT) AS n, unnest(toks) AS gram "
            "FROM d "
            "UNION ALL SELECT source, CAST(2 AS INT), "
            "unnest(CASE WHEN len(toks) >= 2 THEN "
            "list_transform(range(1, len(toks)), "
            "i -> array_to_string(toks[i:i+1], ' ')) "
            "ELSE []::VARCHAR[] END) FROM d "
            "UNION ALL SELECT source, CAST(3 AS INT), "
            "unnest(CASE WHEN len(toks) >= 3 THEN "
            "list_transform(range(1, len(toks) - 1), "
            "i -> array_to_string(toks[i:i+2], ' ')) "
            "ELSE []::VARCHAR[] END) FROM d) "
            "SELECT source, n, count(*) AS total_grams, "
            "count(DISTINCT gram) AS distinct_grams, "
            "round(count(DISTINCT gram)::DOUBLE / count(*), 6) "
            "AS diversity FROM g GROUP BY 1, 2",
        "decontam_overlap":
            # same tokenization, inclusive 4-gram slices toks[i:i+3],
            # per-doc DISTINCT grams, benchmark = source 'src0'
            "WITH d AS (SELECT doc_id, source, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "g AS (SELECT doc_id, source, CASE WHEN len(toks) >= 4 THEN "
            "  list_distinct(list_transform(range(1, len(toks) - 2), "
            "  i -> array_to_string(toks[i:i+3], ' '))) "
            "  ELSE []::VARCHAR[] END AS grams FROM d), "
            "b AS (SELECT DISTINCT unnest(grams) AS gram FROM g "
            "  WHERE source = 'src0'), "
            "t AS (SELECT doc_id, grams FROM g WHERE source <> 'src0'), "
            "e AS (SELECT doc_id, unnest(grams) AS gram FROM t), "
            "h AS (SELECT e.doc_id, count(*) AS n_hit FROM e "
            "  JOIN b USING (gram) GROUP BY 1) "
            "SELECT t.doc_id, len(t.grams) AS n_grams, "
            "coalesce(h.n_hit, 0) AS n_hit, "
            "round(CASE WHEN len(t.grams) > 0 THEN "
            "coalesce(h.n_hit, 0)::DOUBLE / len(t.grams) ELSE 0.0 END, 6) "
            "AS overlap_frac, coalesce(h.n_hit, 0) > 0 AS flagged "
            "FROM t LEFT JOIN h USING (doc_id)",
        "decontam_bloom":
            # the Bloom path is lossless -> the oracle IS the exact SQL

            "WITH d AS (SELECT doc_id, source, "
            f"{_SQL_TOKENS} AS toks FROM documents), "
            "g AS (SELECT doc_id, source, CASE WHEN len(toks) >= 4 THEN "
            "  list_distinct(list_transform(range(1, len(toks) - 2), "
            "  i -> array_to_string(toks[i:i+3], ' '))) "
            "  ELSE []::VARCHAR[] END AS grams FROM d), "
            "b AS (SELECT DISTINCT unnest(grams) AS gram FROM g "
            "  WHERE source = 'src0'), "
            "t AS (SELECT doc_id, grams FROM g WHERE source <> 'src0'), "
            "e AS (SELECT doc_id, unnest(grams) AS gram FROM t), "
            "h AS (SELECT e.doc_id, count(*) AS n_hit FROM e "
            "  JOIN b USING (gram) GROUP BY 1) "
            "SELECT t.doc_id, len(t.grams) AS n_grams, "
            "coalesce(h.n_hit, 0) AS n_hit, "
            "round(CASE WHEN len(t.grams) > 0 THEN "
            "coalesce(h.n_hit, 0)::DOUBLE / len(t.grams) ELSE 0.0 END, 6) "
            "AS overlap_frac, coalesce(h.n_hit, 0) > 0 AS flagged "
            "FROM t LEFT JOIN h USING (doc_id)",
        "line_dedup_docs":
            # identical 3-word pseudo-line segmentation; a trimmed line
            # in >= 2 distinct docs is removed everywhere; empty lines
            # kept; docs losing every line come back as ''
            "WITH seg AS (SELECT doc_id, "
            "  list_transform(range(1, CAST(ceil(len(ws) / 3.0) AS BIGINT)"
            "   + 1), i -> array_to_string(ws[(i-1)*3+1 : (i-1)*3+3], ' '))"
            "  AS lines FROM (SELECT doc_id, string_split(text, ' ') AS ws"
            "  FROM documents)), "
            "l AS (SELECT doc_id, unnest(lines) AS line, "
            "  unnest(range(1, len(lines) + 1)) AS pos FROM seg), "
            "dup AS (SELECT trim(line) AS lkey FROM l "
            "  WHERE trim(line) <> '' GROUP BY 1 "
            "  HAVING count(DISTINCT doc_id) >= 2), "
            "kept AS (SELECT doc_id, pos, line FROM l WHERE "
            "  trim(line) = '' OR trim(line) NOT IN (SELECT lkey FROM dup)), "
            "agg AS (SELECT doc_id, "
            "  string_agg(line, chr(10) ORDER BY pos) AS text_clean, "
            "  count(*) AS n_kept FROM kept GROUP BY 1), "
            "base AS (SELECT doc_id, len(lines) AS n_lines FROM seg) "
            "SELECT b.doc_id, coalesce(a.text_clean, '') AS text_clean, "
            "b.n_lines, b.n_lines - coalesce(a.n_kept, 0) AS n_removed "
            "FROM base b LEFT JOIN agg a USING (doc_id)",
        "stratified_sample_docs":
            # the IDENTICAL hash draw the engine computes: first 8 hex
            # digits of sha256('v1:'||doc_id) over 2^32
            "SELECT doc_id, lang FROM ("
            "  SELECT doc_id, lang, "
            "  ('0x' || substr(sha256('v1:' || doc_id), 1, 8))::UBIGINT "
            "   / 4294967296.0 AS u FROM documents) "
            "WHERE u < (CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.9 "
            "WHEN 'de' THEN 0.25 ELSE 0.1 END)",
        "weighted_sample_docs":
            # the IDENTICAL A-ES key the engine ranks: pow(u, 1/w) with
            # u the same sha256 hash draw; ties break on doc_id
            "SELECT doc_id, n_tok FROM ("
            "  SELECT doc_id, n_tok, row_number() OVER ("
            "    ORDER BY pow(('0x' || substr(sha256('v1:' || doc_id), 1, 8))"
            "::UBIGINT / 4294967296.0, 1.0 / n_tok) DESC, doc_id) AS rn"
            f"  FROM (SELECT doc_id, len({_SQL_TOKENS}) AS n_tok "
            "FROM documents) WHERE n_tok > 0"
            ") WHERE rn <= 64",
        "mixture_weights_docs":
            # the IDENTICAL construction: exact integer token sums,
            # sqrt smoothed score fixed-pointed to 1e-6 BEFORE the
            # normalizing sum (floor of an integral double casts
            # exactly), every ratio one division of exact integers
            "WITH g AS (SELECT source, count(*) AS n_docs,"
            f"  CAST(sum(len({_SQL_TOKENS})) AS BIGINT) AS tokens"
            "  FROM documents GROUP BY source),"
            "k AS (SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE))"
            "  * 1e6 + 0.5) AS BIGINT) AS kk FROM g),"
            "tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS t,"
            "  CAST(sum(kk) AS BIGINT) AS ks FROM k)"
            "SELECT source, n_docs, tokens,"
            "  round(tokens / CAST(t AS DOUBLE), 6) AS p_raw,"
            "  round(kk / CAST(ks AS DOUBLE), 6) AS weight,"
            "  CASE WHEN tokens > 0 THEN round((kk / CAST(ks AS DOUBLE))"
            "  * 1000000.0 / tokens, 4) END AS epochs "
            "FROM k, tot",
        "token_shard_docs":
            # global-window form of the distributed prefix sum: a doc
            # starts in the shard its PRECEDING total fills into
            "SELECT doc_id, n_tok, CAST(floor("
            "(sum(n_tok) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)"
            " / 4096.0) AS BIGINT) AS shard_id "
            f"FROM (SELECT doc_id, len({_SQL_TOKENS}) AS n_tok "
            "FROM documents)",
        "lang_id":
            f"SELECT doc_id, CASE WHEN en >= ms AND en > 0 THEN 'en' "
            "WHEN ms > en THEN 'ms' ELSE 'unknown' END AS lang_pred FROM ("
            f"  SELECT doc_id, len(list_intersect(list_distinct({_SQL_TOKENS}), {en_arr})) AS en, "
            f"  len(list_intersect(list_distinct({_SQL_TOKENS}), {ms_arr})) AS ms FROM documents)",
        "quality_scores":
            "SELECT doc_id, round("
            "  (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END) + "
            "  (CASE WHEN sw >= 2 THEN 0.25 ELSE 0.0 END) + "
            "  (CASE WHEN pr <= 0.2 THEN 0.25 ELSE 0.0 END) + "
            "  (CASE WHEN mwl BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END)::double, 2)::double AS quality "
            "FROM ("
            f"  SELECT doc_id, len({_SQL_TOKENS}) AS n_tok, "
            f"  len(list_intersect(list_distinct({_SQL_TOKENS}), {en_arr[:-1]}, {ms_arr[1:]})) AS sw, "
            "  CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::double / length(text) ELSE 0.0 END AS pr, "
            f"  CASE WHEN len({_SQL_TOKENS}) > 0 THEN "
            f"  list_sum(list_transform({_SQL_TOKENS}, x -> length(x)))::double / len({_SQL_TOKENS}) "
            "  ELSE 0.0 END AS mwl FROM documents)",
        "doc_fingerprints":
            f"SELECT doc_id, sha256(array_to_string(list_sort(list_distinct({_SQL_TOKENS})), ' ')) "
            "AS fingerprint FROM documents",
        "exact_dup_groups":
            "SELECT sha256(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS keep_id "
            "FROM documents GROUP BY sha256(text) HAVING count(*) > 1",
        "events_5min_windows":
            "SELECT (floor(epoch(ts) / 300) * 300)::bigint AS win_start, event_type, "
            "count(*) AS n, round(sum(value), 4) AS v FROM events GROUP BY 1, 2",
        "sessionize_events":
            "SELECT user_id, session_id, count(*) AS n_events FROM ("
            # CAST to BIGINT: DuckDB's sum(int) is HUGEINT, which pandas
            # canonicalizers (.df()) coerce to float64 — the driver's hasher
            # then sees 1.0 vs Spark's int64 1 (round-2 judge root cause).
            "  SELECT user_id, CAST(sum(newsess) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM ("
            "    SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER "
            "    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
            "    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 "
            "    THEN 1 ELSE 0 END AS newsess FROM events)) "
            "GROUP BY user_id, session_id",
        # session_window boundary semantics: an event exactly gap after
        # the last starts a NEW session (touching windows don't overlap),
        # hence >= where sessionize_events uses >; end = last_ts + gap
        "session_window_events":
            "SELECT user_id, min(epoch_us(ts)) AS start_us, "
            "max(epoch_us(ts)) + 1800000000 AS end_us, count(*) AS n_events "
            "FROM ("
            "  SELECT user_id, ts, CAST(sum(newsess) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM ("
            "    SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER "
            "    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
            "    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000 "
            "    THEN 1 ELSE 0 END AS newsess FROM events)) "
            "GROUP BY user_id, sid",
        "attributed_clicks":
            "SELECT t.user_id, t.event_id AS trig_id, "
            "epoch_us(t.ts) AS trig_us, "
            "b.event_id AS base_id, epoch_us(b.ts) AS base_us "
            "FROM events t JOIN events b ON t.user_id = b.user_id "
            "AND t.event_type = 'click' AND b.event_type = 'view' "
            "AND b.ts <= t.ts "
            "AND epoch_us(t.ts) - epoch_us(b.ts) < 43200000000",
        "dedup_event_replay":
            # the replayed duplicates collapse on event_id, so the
            # deduped stats are exactly the clean table's
            "SELECT event_type, count(*) AS n, "
            "count(DISTINCT user_id) AS users, "
            "round(sum(value), 4) AS v FROM events GROUP BY event_type",
        "recent_orders":
            "SELECT o_orderkey, o_orderdate FROM orders "
            "ORDER BY o_orderdate DESC, o_orderkey LIMIT 20",
        "regex_part_search":
            "SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE '%ge%' "
            "ORDER BY p_partkey LIMIT 50",
        "connected_components_demo":
            "WITH RECURSIVE base AS ("
            "  SELECT DISTINCT 'o' || lpad(l_orderkey::varchar, 9, '0') AS u, "
            "         'p' || lpad(l_partkey::varchar, 9, '0') AS v "
            "  FROM lineitem WHERE l_orderkey < 60), "
            "edges2 AS (SELECT u, v FROM base UNION SELECT v, u FROM base), "
            "reach AS ("
            "  SELECT u AS node, v AS r FROM edges2 "
            "  UNION "
            "  SELECT reach.node, e.v FROM reach JOIN edges2 e ON reach.r = e.u "
            "  WHERE e.v <> reach.node) "
            "SELECT node, least(node, min(r)) AS component FROM reach GROUP BY node",
        # the incremental merge must equal the full closure over the union
        "incremental_components_orders":
            "WITH RECURSIVE base AS ("
            "  SELECT DISTINCT 'o' || lpad(l_orderkey::varchar, 9, '0') AS u, "
            "         'p' || lpad(l_partkey::varchar, 9, '0') AS v "
            "  FROM lineitem WHERE l_orderkey < 60), "
            "edges2 AS (SELECT u, v FROM base UNION SELECT v, u FROM base), "
            "reach AS ("
            "  SELECT u AS node, v AS r FROM edges2 "
            "  UNION "
            "  SELECT reach.node, e.v FROM reach JOIN edges2 e ON reach.r = e.u "
            "  WHERE e.v <> reach.node) "
            "SELECT node, least(node, min(r)) AS component FROM reach GROUP BY node",
        # 5 unrolled power-method iterations; the symmetrized co-purchase
        # graph has no dangling nodes, so each step is exactly
        # (1-d)/N + d * sum_nbr rank/deg — identical to the operator
        "pagerank_parts":
            "WITH pairs AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),"
            "e AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),"
            "deg AS (SELECT u, count(*) AS d FROM e GROUP BY u),"
            "nn AS (SELECT count(*) AS n FROM deg),"
            "r0 AS (SELECT u AS id, 1.0 / (SELECT n FROM nn) AS rank FROM deg),"
            "r1 AS (SELECT e.v AS id, 0.15 / (SELECT n FROM nn)"
            "       + 0.85 * sum(r.rank / deg.d) AS rank FROM e"
            "       JOIN r0 r ON e.u = r.id JOIN deg ON e.u = deg.u GROUP BY e.v),"
            "r2 AS (SELECT e.v AS id, 0.15 / (SELECT n FROM nn)"
            "       + 0.85 * sum(r.rank / deg.d) AS rank FROM e"
            "       JOIN r1 r ON e.u = r.id JOIN deg ON e.u = deg.u GROUP BY e.v),"
            "r3 AS (SELECT e.v AS id, 0.15 / (SELECT n FROM nn)"
            "       + 0.85 * sum(r.rank / deg.d) AS rank FROM e"
            "       JOIN r2 r ON e.u = r.id JOIN deg ON e.u = deg.u GROUP BY e.v),"
            "r4 AS (SELECT e.v AS id, 0.15 / (SELECT n FROM nn)"
            "       + 0.85 * sum(r.rank / deg.d) AS rank FROM e"
            "       JOIN r3 r ON e.u = r.id JOIN deg ON e.u = deg.u GROUP BY e.v),"
            "r5 AS (SELECT e.v AS id, 0.15 / (SELECT n FROM nn)"
            "       + 0.85 * sum(r.rank / deg.d) AS rank FROM e"
            "       JOIN r4 r ON e.u = r.id JOIN deg ON e.u = deg.u GROUP BY e.v)"
            "SELECT id AS part_id, round(rank, 6) AS rank FROM r5",
        # weighted personalized variant: w(u,v) = shared-order count,
        # teleport uniform over present parts with id <= 50; symmetrized
        # graph => no dangling, so each unrolled step is exactly
        # 0.15*tele + 0.85*sum(rank*w/wout)
        "pagerank_seeded_parts":
            "WITH pairs AS ("
            "  SELECT a.l_partkey AS u, b.l_partkey AS v,"
            "         CAST(count(*) AS DOUBLE) AS w"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  GROUP BY 1, 2),"
            "e AS (SELECT u, v, w FROM pairs"
            "      UNION ALL SELECT v, u, w FROM pairs),"
            "wout AS (SELECT u, sum(w) AS d FROM e GROUP BY u),"
            "ns AS (SELECT count(*) AS n FROM wout WHERE u <= 50),"
            "tele AS (SELECT u AS id, CASE WHEN u <= 50"
            "         THEN 1.0 / (SELECT n FROM ns) ELSE 0.0 END AS t"
            "         FROM wout),"
            "r0 AS (SELECT id, t AS rank FROM tele),"
            "i1 AS (SELECT e.v AS id, sum(r.rank * e.w / wout.d) AS f"
            "       FROM e JOIN r0 r ON e.u = r.id"
            "       JOIN wout ON e.u = wout.u GROUP BY e.v),"
            "r1 AS (SELECT tele.id, 0.15 * tele.t"
            "       + 0.85 * coalesce(i1.f, 0) AS rank"
            "       FROM tele LEFT JOIN i1 ON tele.id = i1.id),"
            "i2 AS (SELECT e.v AS id, sum(r.rank * e.w / wout.d) AS f"
            "       FROM e JOIN r1 r ON e.u = r.id"
            "       JOIN wout ON e.u = wout.u GROUP BY e.v),"
            "r2 AS (SELECT tele.id, 0.15 * tele.t"
            "       + 0.85 * coalesce(i2.f, 0) AS rank"
            "       FROM tele LEFT JOIN i2 ON tele.id = i2.id),"
            "i3 AS (SELECT e.v AS id, sum(r.rank * e.w / wout.d) AS f"
            "       FROM e JOIN r2 r ON e.u = r.id"
            "       JOIN wout ON e.u = wout.u GROUP BY e.v),"
            "r3 AS (SELECT tele.id, 0.15 * tele.t"
            "       + 0.85 * coalesce(i3.f, 0) AS rank"
            "       FROM tele LEFT JOIN i3 ON tele.id = i3.id),"
            "i4 AS (SELECT e.v AS id, sum(r.rank * e.w / wout.d) AS f"
            "       FROM e JOIN r3 r ON e.u = r.id"
            "       JOIN wout ON e.u = wout.u GROUP BY e.v),"
            "r4 AS (SELECT tele.id, 0.15 * tele.t"
            "       + 0.85 * coalesce(i4.f, 0) AS rank"
            "       FROM tele LEFT JOIN i4 ON tele.id = i4.id),"
            "i5 AS (SELECT e.v AS id, sum(r.rank * e.w / wout.d) AS f"
            "       FROM e JOIN r4 r ON e.u = r.id"
            "       JOIN wout ON e.u = wout.u GROUP BY e.v),"
            "r5 AS (SELECT tele.id, 0.15 * tele.t"
            "       + 0.85 * coalesce(i5.f, 0) AS rank"
            "       FROM tele LEFT JOIN i5 ON tele.id = i5.id)"
            "SELECT id AS part_id, round(rank, 6) AS rank FROM r5",
        # BFS via recursive CTE: UNION dedupes (id, dist) rows, the
        # dist < 3 bound terminates, min(dist) = hop distance; seeds
        # appear at dist 0 whether or not they touch the subgraph
        "bfs_parts":
            "WITH RECURSIVE base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "e AS (SELECT u, v FROM base UNION ALL SELECT v, u FROM base),"
            "seeds(id) AS (VALUES (0), (1), (2), (3), (4)),"
            "walk AS ("
            "  SELECT CAST(id AS BIGINT) AS id, 0 AS dist FROM seeds"
            "  UNION"
            "  SELECT e.v, walk.dist + 1 FROM walk"
            "  JOIN e ON walk.id = e.u WHERE walk.dist < 3)"
            "SELECT id AS part_id, CAST(min(dist) AS INT) AS dist"
            " FROM walk GROUP BY id",
        "random_walk_parts":
            _SQL_WALK_CTES +
            " SELECT CAST(start AS BIGINT) AS start_id, rep, step,"
            " CAST(node AS BIGINT) AS node_id FROM w",
        "walk_ppmi_parts":
            # pairs within window 2 on the same walk; marginals cast
            # out of DuckDB's HUGEINT sum; the >0 truncation filters
            # on the RAW ln in both engines (identical arithmetic)
            _SQL_WALK_CTES +
            ", pr AS (SELECT a.node AS n, b.node AS c FROM w a"
            "  JOIN w b ON a.start = b.start AND a.rep = b.rep"
            "  AND a.step <> b.step AND abs(a.step - b.step) <= 2),"
            "cc AS (SELECT n, c, count(*) AS cooc FROM pr GROUP BY 1, 2),"
            "m AS (SELECT n, CAST(sum(cooc) AS BIGINT) AS nm FROM cc"
            "  GROUP BY 1),"
            "t AS (SELECT sum(cooc)::DOUBLE AS tt FROM cc)"
            " SELECT CAST(cc.n AS BIGINT) AS node_id,"
            " CAST(cc.c AS BIGINT) AS context_id, cc.cooc,"
            " round(ln(cc.cooc * t.tt / (ma.nm * mb.nm)), 6) AS ppmi"
            " FROM cc JOIN m ma ON cc.n = ma.n"
            " JOIN m mb ON cc.c = mb.n CROSS JOIN t"
            " WHERE ln(cc.cooc * t.tt / (ma.nm * mb.nm)) > 0",
        # shared-neighbor Jaccard: wedge-join candidates, true-degree
        # unions — identical float ops, so the 0.25 threshold and 6dp
        # rounding agree with the operator
        "node_similarity_parts":
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 400),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),"
            "sh AS (SELECT x.node AS a, y.node AS b, count(*) AS shared"
            "       FROM adj x JOIN adj y"
            "       ON x.nbr = y.nbr AND x.node < y.node GROUP BY 1, 2)"
            "SELECT sh.a AS part_a, sh.b AS part_b, sh.shared,"
            " round(sh.shared / (da.d + db.d - sh.shared), 6) AS jaccard"
            " FROM sh JOIN deg da ON sh.a = da.node"
            " JOIN deg db ON sh.b = db.node"
            " WHERE sh.shared / (da.d + db.d - sh.shared) >= 0.25",
        "link_prediction_parts":
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 400),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),"
            "w AS (SELECT a.node, a.nbr, dn.d AS dn FROM adj a"
            "      JOIN deg dn ON a.nbr = dn.node),"
            "cand AS (SELECT x.node AS a, y.node AS b,"
            "         count(*) AS common,"
            "         sum(1.0 / ln(x.dn)) AS aa"
            "         FROM w x JOIN w y"
            "         ON x.nbr = y.nbr AND x.node < y.node"
            "         GROUP BY 1, 2 HAVING count(*) >= 2),"
            "missing AS (SELECT cand.* FROM cand"
            "            LEFT JOIN base ON cand.a = base.u"
            "            AND cand.b = base.v WHERE base.u IS NULL)"
            "SELECT m.a AS part_a, m.b AS part_b, m.common,"
            " round(m.aa, 6) AS adamic_adar,"
            " da.d * db.d AS pref_attach"
            " FROM missing m JOIN deg da ON m.a = da.node"
            " JOIN deg db ON m.b = db.node",
        "hits_parts":
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "verts AS (SELECT u AS id FROM base"
            "          UNION SELECT v FROM base),"
            "nn AS (SELECT count(*) AS n FROM verts),"
            "s0 AS (SELECT id, 1/sqrt(nn.n) AS hub, 1/sqrt(nn.n) AS auth"
            "       FROM verts CROSS JOIN nn),"
            "a1r AS (SELECT e.v AS id, sum(s.hub) AS x FROM base e"
            "        JOIN s0 s ON e.u = s.id GROUP BY 1),"
            "a1m AS (SELECT verts.id, coalesce(a1r.x, 0) AS x"
            "        FROM verts LEFT JOIN a1r ON verts.id = a1r.id),"
            "a1z AS (SELECT sqrt(sum(x*x)) AS z FROM a1m),"
            "a1 AS (SELECT id, x / z AS auth FROM a1m CROSS JOIN a1z),"
            "h1r AS (SELECT e.u AS id, sum(a.auth) AS x FROM base e"
            "        JOIN a1 a ON e.v = a.id GROUP BY 1),"
            "h1m AS (SELECT verts.id, coalesce(h1r.x, 0) AS x"
            "        FROM verts LEFT JOIN h1r ON verts.id = h1r.id),"
            "h1z AS (SELECT sqrt(sum(x*x)) AS z FROM h1m),"
            "h1 AS (SELECT id, x / z AS hub FROM h1m CROSS JOIN h1z),"
            "a2r AS (SELECT e.v AS id, sum(s.hub) AS x FROM base e"
            "        JOIN h1 s ON e.u = s.id GROUP BY 1),"
            "a2m AS (SELECT verts.id, coalesce(a2r.x, 0) AS x"
            "        FROM verts LEFT JOIN a2r ON verts.id = a2r.id),"
            "a2z AS (SELECT sqrt(sum(x*x)) AS z FROM a2m),"
            "a2 AS (SELECT id, x / z AS auth FROM a2m CROSS JOIN a2z),"
            "h2r AS (SELECT e.u AS id, sum(a.auth) AS x FROM base e"
            "        JOIN a2 a ON e.v = a.id GROUP BY 1),"
            "h2m AS (SELECT verts.id, coalesce(h2r.x, 0) AS x"
            "        FROM verts LEFT JOIN h2r ON verts.id = h2r.id),"
            "h2z AS (SELECT sqrt(sum(x*x)) AS z FROM h2m),"
            "h2 AS (SELECT id, x / z AS hub FROM h2m CROSS JOIN h2z)"
            "SELECT h2.id AS part_id, round(h2.hub, 6) AS hub,"
            " round(a2.auth, 6) AS auth"
            " FROM h2 JOIN a2 ON h2.id = a2.id",
        "npmi_parts":
            "WITH occ AS ("
            "  SELECT DISTINCT l_orderkey AS ctx, l_partkey AS item"
            "  FROM lineitem WHERE l_orderkey < 400),"
            "nn AS (SELECT count(DISTINCT ctx) AS n FROM occ),"
            "ci AS (SELECT item, count(*) AS c FROM occ GROUP BY item),"
            "pr AS (SELECT x.item AS a, y.item AS b, count(*) AS n_pair"
            "       FROM occ x JOIN occ y"
            "       ON x.ctx = y.ctx AND x.item < y.item GROUP BY 1, 2)"
            "SELECT pr.a AS part_a, pr.b AS part_b, pr.n_pair,"
            " round(pr.n_pair * nn.n / (ca.c * cb.c), 6) AS lift,"
            " round(CASE WHEN pr.n_pair = nn.n THEN 1.0"
            "  ELSE ln(pr.n_pair * nn.n / (ca.c * cb.c))"
            "   / -ln(pr.n_pair / CAST(nn.n AS DOUBLE)) END, 6) AS npmi"
            " FROM pr CROSS JOIN nn"
            " JOIN ci ca ON pr.a = ca.item"
            " JOIN ci cb ON pr.b = cb.item",
        "k_core_parts": kcore_sql,
        "k_truss_parts": truss_sql,
        "shortest_path_parts":
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v,"
            "    CAST((a.l_partkey + b.l_partkey) % 7 + 1 AS DOUBLE) AS w"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "e AS (SELECT u, v, w FROM base"
            "      UNION ALL SELECT v, u, w FROM base),"
            "d0 AS (SELECT CAST(id AS BIGINT) AS id,"
            "       CAST(0 AS DOUBLE) AS d"
            "       FROM (VALUES (0), (1), (2), (3), (4)) AS s(id)),"
            "r1 AS (SELECT e.v AS id, min(d0.d + e.w) AS d FROM e"
            "       JOIN d0 ON e.u = d0.id GROUP BY 1),"
            "d1 AS (SELECT id, min(d) AS d FROM"
            "       (SELECT * FROM d0 UNION ALL SELECT * FROM r1)"
            "       GROUP BY id),"
            "r2 AS (SELECT e.v AS id, min(d1.d + e.w) AS d FROM e"
            "       JOIN d1 ON e.u = d1.id GROUP BY 1),"
            "d2 AS (SELECT id, min(d) AS d FROM"
            "       (SELECT * FROM d1 UNION ALL SELECT * FROM r2)"
            "       GROUP BY id),"
            "r3 AS (SELECT e.v AS id, min(d2.d + e.w) AS d FROM e"
            "       JOIN d2 ON e.u = d2.id GROUP BY 1),"
            "d3 AS (SELECT id, min(d) AS d FROM"
            "       (SELECT * FROM d2 UNION ALL SELECT * FROM r3)"
            "       GROUP BY id)"
            "SELECT id AS part_id, round(d, 6) AS dist FROM d3",
        "lpa_parts":
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),"
            "c1 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l0 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l1 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c1) WHERE rk = 1),"
            "c2 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l1 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l2 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c2) WHERE rk = 1),"
            "c3 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l2 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l3 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c3) WHERE rk = 1)"
            "SELECT node AS part_id, lbl AS community FROM l3",
        "lpa_weighted_parts":
            "WITH base AS ("
            "  SELECT a.l_partkey AS u, b.l_partkey AS v,"
            "         CAST(count(*) AS DOUBLE) AS w"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300 GROUP BY 1, 2),"
            "adj AS (SELECT u AS node, v AS nbr, w FROM base"
            "        UNION ALL SELECT v, u, w FROM base),"
            "l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),"
            "c1 AS (SELECT a.node, l.lbl, sum(a.w) AS c FROM adj a"
            "       JOIN l0 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l1 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c1) WHERE rk = 1),"
            "c2 AS (SELECT a.node, l.lbl, sum(a.w) AS c FROM adj a"
            "       JOIN l1 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l2 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c2) WHERE rk = 1)"
            "SELECT node AS part_id, lbl AS community FROM l2",
        "neighborhood_parts":
            # the IDENTICAL HyperBall-with-KMV rounds: sketch rows are
            # (id, u) pairs; each round unions neighbors' rows and
            # re-keeps the 16 smallest; estimate exact below k, else
            # (k-1)/h_k on the same doubles
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "s0 AS (SELECT DISTINCT node AS id,"
            "  ('0x' || substr(sha256('v1:' || CAST(node AS VARCHAR)), 1, 8))"
            "::UBIGINT / 4294967296.0 AS u FROM adj),"
            "c1 AS (SELECT a.node AS id, s.u FROM adj a"
            "       JOIN s0 s ON s.id = a.nbr"
            "       UNION SELECT id, u FROM s0),"
            "s1 AS (SELECT id, u FROM (SELECT id, u, row_number() OVER ("
            "  PARTITION BY id ORDER BY u) AS rn FROM c1) WHERE rn <= 16),"
            "c2 AS (SELECT a.node AS id, s.u FROM adj a"
            "       JOIN s1 s ON s.id = a.nbr"
            "       UNION SELECT id, u FROM s1),"
            "s2 AS (SELECT id, u FROM (SELECT id, u, row_number() OVER ("
            "  PARTITION BY id ORDER BY u) AS rn FROM c2) WHERE rn <= 16),"
            "est AS ("
            "  SELECT id, 0 AS r, count(*) AS n_min, max(u) AS hk"
            "  FROM s0 GROUP BY id"
            "  UNION ALL SELECT id, 1, count(*), max(u) FROM s1 GROUP BY id"
            "  UNION ALL SELECT id, 2, count(*), max(u) FROM s2 GROUP BY id)"
            "SELECT id AS part_id, r, n_min,"
            "  round(CASE WHEN n_min < 16 THEN CAST(n_min AS DOUBLE)"
            "        ELSE 15.0 / hk END, 4) AS estimate FROM est",
        "neighborhood_function_parts":
            # same unrolled rounds; per-r exact integer sum of the 4dp
            # fixed-point ball estimates
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "s0 AS (SELECT DISTINCT node AS id,"
            "  ('0x' || substr(sha256('v1:' || CAST(node AS VARCHAR)), 1, 8))"
            "::UBIGINT / 4294967296.0 AS u FROM adj),"
            "c1 AS (SELECT a.node AS id, s.u FROM adj a"
            "       JOIN s0 s ON s.id = a.nbr"
            "       UNION SELECT id, u FROM s0),"
            "s1 AS (SELECT id, u FROM (SELECT id, u, row_number() OVER ("
            "  PARTITION BY id ORDER BY u) AS rn FROM c1) WHERE rn <= 16),"
            "c2 AS (SELECT a.node AS id, s.u FROM adj a"
            "       JOIN s1 s ON s.id = a.nbr"
            "       UNION SELECT id, u FROM s1),"
            "s2 AS (SELECT id, u FROM (SELECT id, u, row_number() OVER ("
            "  PARTITION BY id ORDER BY u) AS rn FROM c2) WHERE rn <= 16),"
            "est AS ("
            "  SELECT id, 0 AS r, count(*) AS n_min, max(u) AS hk"
            "  FROM s0 GROUP BY id"
            "  UNION ALL SELECT id, 1, count(*), max(u) FROM s1 GROUP BY id"
            "  UNION ALL SELECT id, 2, count(*), max(u) FROM s2 GROUP BY id)"
            # sum() over BIGINT is exact HUGEINT; pandas fetch turns it
            # into float64 — the same round-to-double the engine applies
            # to its exact DECIMAL sum, so the values hash identically
            "SELECT r, count(*) AS n_nodes,"
            "  sum(CAST(floor((CASE WHEN n_min < 16 THEN "
            "CAST(n_min AS DOUBLE) ELSE 15.0 / hk END) * 10000.0 + 0.5) "
            "AS BIGINT)) AS total_reach_x1e4 "
            "FROM est GROUP BY r",
        "harmonic_parts":
            # same unrolled rounds; H = (e1-e0)/1 + (e2-e1)/2 on the
            # identical per-round estimates
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "s0 AS (SELECT DISTINCT node AS id,"
            "  ('0x' || substr(sha256('v1:' || CAST(node AS VARCHAR)), 1, 8))"
            "::UBIGINT / 4294967296.0 AS u FROM adj),"
            "c1 AS (SELECT a.node AS id, s.u FROM adj a"
            "       JOIN s0 s ON s.id = a.nbr"
            "       UNION SELECT id, u FROM s0),"
            "s1 AS (SELECT id, u FROM (SELECT id, u, row_number() OVER ("
            "  PARTITION BY id ORDER BY u) AS rn FROM c1) WHERE rn <= 16),"
            "c2 AS (SELECT a.node AS id, s.u FROM adj a"
            "       JOIN s1 s ON s.id = a.nbr"
            "       UNION SELECT id, u FROM s1),"
            "s2 AS (SELECT id, u FROM (SELECT id, u, row_number() OVER ("
            "  PARTITION BY id ORDER BY u) AS rn FROM c2) WHERE rn <= 16),"
            "e0 AS (SELECT id, CAST(count(*) AS DOUBLE) AS e FROM s0 "
            "GROUP BY id),"  # radius-0 ball is always 1 node (< k)
            "e1 AS (SELECT id, CASE WHEN count(*) < 16 THEN "
            "CAST(count(*) AS DOUBLE) ELSE 15.0 / max(u) END AS e "
            "FROM s1 GROUP BY id),"
            "e2 AS (SELECT id, CASE WHEN count(*) < 16 THEN "
            "CAST(count(*) AS DOUBLE) ELSE 15.0 / max(u) END AS e "
            "FROM s2 GROUP BY id)"
            "SELECT e0.id AS part_id, round((e1.e - e0.e) / 1 "
            "+ (e2.e - e1.e) / 2, 6) AS harmonic "
            "FROM e0 JOIN e1 ON e1.id = e0.id JOIN e2 ON e2.id = e0.id",
        "katz_parts":
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "x0 AS (SELECT DISTINCT node, 1.0 AS x FROM adj),"
            "x1 AS (SELECT a.node, 1.0 + 0.05 * sum(x.x) AS x FROM adj a"
            "       JOIN x0 x ON a.nbr = x.node GROUP BY a.node),"
            "x2 AS (SELECT a.node, 1.0 + 0.05 * sum(x.x) AS x FROM adj a"
            "       JOIN x1 x ON a.nbr = x.node GROUP BY a.node),"
            "x3 AS (SELECT a.node, 1.0 + 0.05 * sum(x.x) AS x FROM adj a"
            "       JOIN x2 x ON a.nbr = x.node GROUP BY a.node)"
            "SELECT node AS part_id, round(x, 6) AS katz FROM x3",
        "lpa_modularity":
            # lpa_parts CTE chain (3 rounds) + Newman modularity terms:
            # l_c = intra edges, d_c = member degree sum, m = |E|
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),"
            "c1 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l0 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l1 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c1) WHERE rk = 1),"
            "c2 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l1 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l2 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c2) WHERE rk = 1),"
            "c3 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l2 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l3 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c3) WHERE rk = 1),"
            "asg AS (SELECT node, lbl AS community FROM l3),"
            "m AS (SELECT count(*) AS m FROM base),"
            "intra AS (SELECT x.community AS community, count(*) AS l_in"
            "  FROM base b JOIN asg x ON b.u = x.node"
            "  JOIN asg y ON b.v = y.node"
            "  WHERE x.community = y.community GROUP BY 1),"
            "deg AS (SELECT x.community AS community, count(*) AS deg_sum"
            "  FROM adj a JOIN asg x ON a.node = x.node GROUP BY 1),"
            "nn AS (SELECT community, count(*) AS n_nodes FROM asg"
            "  GROUP BY 1) "
            "SELECT nn.community, nn.n_nodes,"
            " coalesce(i.l_in, 0) AS l_in,"
            " coalesce(d.deg_sum, 0) AS deg_sum,"
            " round(coalesce(i.l_in, 0)::DOUBLE / m.m"
            "  - pow(coalesce(d.deg_sum, 0)::DOUBLE / (2 * m.m), 2), 6)"
            "  + 0.0 AS q_term"
            " FROM nn CROSS JOIN m"
            " LEFT JOIN intra i USING (community)"
            " LEFT JOIN deg d USING (community)",
        "conductance_parts":
            # lpa_parts CTE chain + conductance from the modularity
            # aggregates: cut = deg_sum − 2·l_in, φ = cut/min(vol,
            # 2m−vol) — all-integer inputs, one division
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 300),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),"
            "c1 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l0 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l1 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c1) WHERE rk = 1),"
            "c2 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l1 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l2 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c2) WHERE rk = 1),"
            "c3 AS (SELECT a.node, l.lbl, count(*) AS c FROM adj a"
            "       JOIN l2 l ON a.nbr = l.node GROUP BY 1, 2),"
            "l3 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()"
            "       OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk"
            "       FROM c3) WHERE rk = 1),"
            "asg AS (SELECT node, lbl AS community FROM l3),"
            "m AS (SELECT count(*) AS m FROM base),"
            "intra AS (SELECT x.community AS community, count(*) AS l_in"
            "  FROM base b JOIN asg x ON b.u = x.node"
            "  JOIN asg y ON b.v = y.node"
            "  WHERE x.community = y.community GROUP BY 1),"
            "deg AS (SELECT x.community AS community, count(*) AS deg_sum"
            "  FROM adj a JOIN asg x ON a.node = x.node GROUP BY 1),"
            "nn AS (SELECT community, count(*) AS n_nodes FROM asg"
            "  GROUP BY 1) "
            "SELECT nn.community, nn.n_nodes,"
            " CAST(coalesce(d.deg_sum, 0) AS BIGINT) AS volume,"
            " CAST(coalesce(d.deg_sum, 0) - 2 * coalesce(i.l_in, 0)"
            "  AS BIGINT) AS cut,"
            " CASE WHEN least(coalesce(d.deg_sum, 0),"
            "  2 * m.m - coalesce(d.deg_sum, 0)) > 0 THEN"
            "  round((coalesce(d.deg_sum, 0) - 2 * coalesce(i.l_in, 0))"
            "  / CAST(least(coalesce(d.deg_sum, 0),"
            "  2 * m.m - coalesce(d.deg_sum, 0)) AS DOUBLE), 6)"
            "  END AS conductance"
            " FROM nn CROSS JOIN m"
            " LEFT JOIN intra i USING (community)"
            " LEFT JOIN deg d USING (community)",
        "graph_summary_parts":
            # exact-integer edge/degree sums; the assortativity formula
            # mirrors the operator op-for-op (mean*mean, not pow) so
            # the doubles agree bit-for-bit
            "WITH pairs AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),"
            "deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM ("
            "  SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)"
            "  GROUP BY node),"
            "es AS (SELECT CAST(count(*) AS BIGINT) AS m,"
            "  CAST(sum(du.d * dv.d) AS BIGINT) AS se,"
            "  CAST(sum(du.d + dv.d) AS BIGINT) AS s1,"
            "  CAST(sum(du.d * du.d + dv.d * dv.d) AS BIGINT) AS s2"
            "  FROM pairs p JOIN deg du ON p.u = du.node"
            "  JOIN deg dv ON p.v = dv.node),"
            "ns AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,"
            "  min(d) AS min_degree, max(d) AS max_degree,"
            "  CAST(sum(d) AS BIGINT) AS dsum FROM deg)"
            "SELECT n_nodes, m AS n_edges, min_degree, max_degree,"
            "  round(dsum / CAST(n_nodes AS DOUBLE), 6) AS avg_degree,"
            "  round(dsum / (n_nodes * (n_nodes - 1.0)), 6) AS density,"
            "  CASE WHEN s2 / (2.0 * m) - (s1 / (2.0 * m)) * (s1 / (2.0 * m))"
            "  > 0 THEN round((se / CAST(m AS DOUBLE)"
            "  - (s1 / (2.0 * m)) * (s1 / (2.0 * m)))"
            "  / (s2 / (2.0 * m) - (s1 / (2.0 * m)) * (s1 / (2.0 * m))), 6)"
            "  END AS assortativity "
            "FROM ns CROSS JOIN es",
        "node_similarity_weighted_parts":
            "WITH base AS ("
            "  SELECT a.l_partkey AS u, b.l_partkey AS v,"
            "         CAST(count(*) AS DOUBLE) AS w"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 400 GROUP BY 1, 2),"
            "adj AS (SELECT u AS node, v AS nbr, w FROM base"
            "        UNION ALL SELECT v, u, w FROM base),"
            "sums AS (SELECT node, sum(w) AS sw FROM adj GROUP BY node),"
            "sh AS (SELECT x.node AS a, y.node AS b, count(*) AS shared,"
            "              sum(least(x.w, y.w)) AS imin"
            "       FROM adj x JOIN adj y"
            "       ON x.nbr = y.nbr AND x.node < y.node GROUP BY 1, 2)"
            "SELECT sh.a AS part_a, sh.b AS part_b, sh.shared,"
            " round(sh.imin / (sa.sw + sb.sw - sh.imin), 6) AS wjaccard"
            " FROM sh JOIN sums sa ON sh.a = sa.node"
            " JOIN sums sb ON sh.b = sb.node"
            " WHERE sh.imin / (sa.sw + sb.sw - sh.imin) >= 0.25",
        "node_similarity_metric_parts":
            "WITH base AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
            "  WHERE a.l_orderkey < 400),"
            "adj AS (SELECT u AS node, v AS nbr FROM base"
            "        UNION ALL SELECT v, u FROM base),"
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),"
            "sh AS (SELECT x.node AS a, y.node AS b, count(*) AS shared"
            "       FROM adj x JOIN adj y"
            "       ON x.nbr = y.nbr AND x.node < y.node GROUP BY 1, 2)"
            "SELECT sh.a AS part_a, sh.b AS part_b, sh.shared,"
            " round(sh.shared / least(da.d, db.d), 6) AS overlap,"
            " round(sh.shared / sqrt(da.d * db.d), 6) AS cosine"
            " FROM sh JOIN deg da ON sh.a = da.node"
            " JOIN deg db ON sh.b = db.node"
            " WHERE sh.shared / least(da.d, db.d) >= 0.5",
        # canonical a<b<c triple join counts each triangle exactly once
        "triangle_parts":
            "WITH pairs AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"
            "SELECT count(*) AS triangles FROM pairs e1"
            " JOIN pairs e2 ON e1.u = e2.u AND e1.v < e2.v"
            " JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v",
        "clustering_parts":
            "WITH pairs AS ("
            "  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v"
            "  FROM lineitem a JOIN lineitem b"
            "  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),"
            "deg AS (SELECT node, count(*) AS d FROM ("
            "  SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)"
            "  GROUP BY node),"
            "tri3 AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM pairs e1"
            "  JOIN pairs e2 ON e1.u = e2.u AND e1.v < e2.v"
            "  JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v),"
            "t AS (SELECT node, count(*) AS t FROM ("
            "  SELECT a AS node FROM tri3 UNION ALL SELECT b FROM tri3"
            "  UNION ALL SELECT c FROM tri3) GROUP BY node)"
            "SELECT deg.node AS part_id, deg.d AS degree,"
            "  COALESCE(t.t, 0) AS triangles,"
            "  round(CASE WHEN deg.d >= 2 THEN"
            "    2.0 * COALESCE(t.t, 0) / (deg.d * (deg.d - 1))"
            "    ELSE 0.0 END, 6) AS coeff "
            "FROM deg LEFT JOIN t ON t.node = deg.node",
        "unique_texts_union":
            "SELECT txt FROM (SELECT p_name AS txt FROM part "
            "UNION ALL SELECT s_name FROM supplier "
            "UNION ALL SELECT event_type FROM events) GROUP BY txt",
        "node_tokens_index":
            "WITH pairs AS ("
            "  SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS entity_id, "
            "         t.tok AS tok "
            "  FROM part, unnest(regexp_extract_all(lower(p_name), "
            "'[a-z0-9]+')) AS t(tok)) "
            "SELECT tok, entity_id, "
            "CAST(count(*) OVER (PARTITION BY tok) AS BIGINT) AS df "
            "FROM pairs",
        "salted_distinct_users":
            "SELECT event_type, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type",
        "salted_join_orders":
            "SELECT o_orderkey, c_name FROM orders "
            "JOIN customer ON o_custkey = c_custkey",
        "sources_accumulation":
            "SELECT event_type, array_to_string(list_sort(list_distinct(list(user_id % 10))), ',') "
            "AS buckets FROM events GROUP BY event_type",
        "dedup_exact_keep":
            "SELECT doc_id, n_chars FROM ("
            "  SELECT doc_id, n_chars, row_number() OVER "
            "  (PARTITION BY sha256(text) ORDER BY doc_id) AS rk FROM documents) "
            "WHERE rk = 1",
        "event_kind_dispatch":
            "SELECT event_type, CASE WHEN value >= 100 THEN 'high' "
            "WHEN value >= 10 THEN 'mid' ELSE 'low' END AS kind, count(*) AS n "
            "FROM events GROUP BY 1, 2",
        "scd2_customer_status":
            # same max-per-ts resolution, LAG change filter, LEAD close
            "WITH obs AS (SELECT 'cust:' || o_custkey AS entity, "
            "  'status' AS property, o_orderdate AS ts, "
            "  max(o_orderstatus) AS value FROM orders "
            "  WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2, 3), "
            "ch AS (SELECT entity, property, ts, value FROM ("
            "  SELECT *, lag(value) OVER "
            "    (PARTITION BY entity, property ORDER BY ts) AS prev "
            "  FROM obs) WHERE prev IS NULL OR prev <> value) "
            "SELECT entity, property, value, ts AS valid_from, "
            "lead(ts) OVER (PARTITION BY entity, property ORDER BY ts) "
            "  AS valid_to, "
            "row_number() OVER (PARTITION BY entity, property ORDER BY ts) "
            "  AS version, "
            "lead(ts) OVER (PARTITION BY entity, property ORDER BY ts) "
            "  IS NULL AS is_current "
            "FROM ch",
        "fact_conflicts_orders":
            "SELECT subject, predicate, n_objects, objects, n_assertions "
            "FROM (SELECT 'order:' || (o_orderkey % 97) AS subject, "
            "  'status' AS predicate, "
            "  len(list_sort(list(DISTINCT o_orderstatus))) AS n_objects, "
            "  list_aggregate(list_sort(list(DISTINCT o_orderstatus)), "
            "    'string_agg', ',') AS objects, "
            "  count(*) AS n_assertions "
            "  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2) "
            "WHERE n_objects > 1",
        "truth_discovery_orders":
            # two unrolled unnormalized-Sums rounds in exact integers
            "WITH e AS (SELECT DISTINCT 'u' || (o_custkey % 40) AS src, "
            "  'order:' || (o_orderkey % 150) AS fact, "
            "  o_orderstatus AS value FROM orders "
            "  WHERE o_orderstatus IS NOT NULL), "
            "b0 AS (SELECT fact, value, count(*)::BIGINT AS belief "
            "  FROM e GROUP BY 1, 2), "
            "t1 AS (SELECT src, sum(belief)::BIGINT AS trust FROM e "
            "  JOIN b0 USING (fact, value) GROUP BY 1), "
            "b1 AS (SELECT fact, value, sum(trust)::BIGINT AS belief "
            "  FROM e JOIN t1 USING (src) GROUP BY 1, 2), "
            "ns AS (SELECT fact, value, count(*)::BIGINT AS n_sources "
            "  FROM e GROUP BY 1, 2) "
            "SELECT fact, value, belief, n_sources, "
            "row_number() OVER (PARTITION BY fact "
            "  ORDER BY belief DESC, value) = 1 AS is_winner "
            "FROM b1 JOIN ns USING (fact, value)",
        "mis_parts": mis_sql,
        "butterfly_orders":
            # identical right-anchored wedge combinatorics
            "WITH e AS (SELECT DISTINCT l_partkey::VARCHAR AS l, "
            "  l_orderkey::VARCHAR AS r FROM lineitem "
            "  WHERE l_orderkey < 3000), "
            "pc AS (SELECT a.l AS l1, b.l AS l2, count(*) AS c "
            "  FROM e a JOIN e b ON a.r = b.r AND a.l < b.l "
            "  GROUP BY 1, 2), "
            "ws AS (SELECT coalesce(sum(c), 0)::BIGINT AS n_wedge_pairs, "
            "  coalesce(sum(c * (c - 1) // 2), 0)::BIGINT AS n_butterflies "
            "  FROM pc), "
            "sz AS (SELECT count(DISTINCT l)::BIGINT AS n_left, "
            "  count(DISTINCT r)::BIGINT AS n_right, "
            "  count(*)::BIGINT AS n_edges FROM e) "
            "SELECT n_left, n_right, n_edges, n_wedge_pairs, "
            "n_butterflies FROM sz, ws",
        "fs_link_customers": _fs_link_sql(),
        "closure_parts":
            # DuckDB's NATIVE recursive CTE is the oracle for the
            # semi-naive DataFrame loop; the relation is a tree so
            # min(dist) is the unique path length
            "WITH RECURSIVE base AS (SELECT p_partkey AS src, "
            "  p_partkey // 2 AS dst FROM part "
            "  WHERE p_partkey >= 2 AND p_partkey < 512), "
            "tc AS (SELECT src, dst, 1 AS dist FROM base "
            "  UNION ALL SELECT t.src, b.dst, t.dist + 1 "
            "  FROM tc t JOIN base b ON t.dst = b.src) "
            "SELECT src, dst, min(dist)::INT AS dist FROM tc GROUP BY 1, 2",
        "type_inference_customers":
            # depth-2 hierarchy (nation -> region -> 'world') proven
            # by construction, so the closure unrolls as sub UNION
            # sub∘sub
            "WITH inst AS (SELECT DISTINCT c_custkey AS entity, "
            "  n_name AS type FROM customer "
            "  JOIN nation ON c_nationkey = n_nationkey), "
            "sub AS (SELECT DISTINCT n_name AS src, r_name AS dst "
            "  FROM nation JOIN region ON n_regionkey = r_regionkey "
            "  UNION SELECT DISTINCT r_name AS src, 'world' AS dst "
            "  FROM region), "
            "clos AS (SELECT src, dst FROM sub "
            "  UNION SELECT a.src, b.dst FROM sub a "
            "  JOIN sub b ON a.dst = b.src), "
            "inf AS (SELECT DISTINCT i.entity, c.dst AS type "
            "  FROM inst i JOIN clos c ON i.type = c.src) "
            "SELECT entity, type, TRUE AS direct FROM inst "
            "UNION ALL "
            "SELECT i.entity, i.type, FALSE AS direct FROM inf i "
            "ANTI JOIN inst USING (entity, type)",
        "zorder_orders":
            _zorder_ctes() + " SELECT o_orderkey, zkey FROM z",
        "zorder_span_stats":
            _zorder_ctes() + ", "
            "pb AS (SELECT zkey >> 12 AS zb, count(*)::BIGINT AS rws, "
            "  min(ck) AS bmnck, max(ck) AS bmxck, "
            "  min(pr) AS bmnpr, max(pr) AS bmxpr FROM z GROUP BY 1), "
            "g AS (SELECT min(ck) AS gmnck, max(ck) AS gmxck, "
            "  min(pr) AS gmnpr, max(pr) AS gmxpr FROM o) "
            "SELECT 'ck' AS col, count(*)::BIGINT AS n_buckets, "
            "  sum(rws)::BIGINT AS n_rows, "
            "  avg((bmxck - bmnck + 1)::DOUBLE / (gmxck - gmnck + 1)) "
            "  AS mean_span_fraction FROM pb, g "
            "UNION ALL SELECT 'pr', count(*)::BIGINT, sum(rws)::BIGINT, "
            "  avg((bmxpr - bmnpr + 1)::DOUBLE / (gmxpr - gmnpr + 1)) "
            "  FROM pb, g",
        "markov_event_transitions":
            "WITH f AS (SELECT user_id, event_type, ts, event_id "
            "  FROM events WHERE user_id IS NOT NULL "
            "  AND event_type IS NOT NULL AND ts IS NOT NULL), "
            "p AS (SELECT event_type AS state, lead(event_type) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id) AS next_state "
            "  FROM f), "
            "c AS (SELECT state, next_state, count(*)::BIGINT AS n "
            "  FROM p WHERE next_state IS NOT NULL GROUP BY 1, 2), "
            "t AS (SELECT state, sum(n)::BIGINT AS tot FROM c GROUP BY 1) "
            "SELECT state, next_state, n, n::DOUBLE / tot AS p "
            "FROM c JOIN t USING (state)",
        "betweenness_parts": _betweenness_sql(),
        "target_encode_priority":
            "WITH b AS (SELECT o_orderpriority AS category, "
            "  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS t "
            "  FROM orders), "
            "g AS (SELECT sum(t)::DOUBLE / count(*) AS gm FROM b), "
            "p AS (SELECT category, count(*)::BIGINT AS n, "
            "  sum(t)::BIGINT AS s FROM b GROUP BY 1) "
            "SELECT category, n, s::DOUBLE / n AS target_mean, "
            "(s::DOUBLE + 10.0 * gm) / (n + 10.0) AS encoded FROM p, g",
        "zscore_customers":
            "WITH s AS (SELECT avg(c_acctbal) AS mu, "
            "  stddev_pop(c_acctbal) AS sd FROM customer) "
            "SELECT c_custkey, CASE WHEN sd > 0 THEN "
            "(c_acctbal - mu) / sd END AS c_acctbal_z FROM customer, s",
        "calibration_orders":
            "WITH s AS (SELECT (o_orderkey % 1000)::DOUBLE / 1000 AS sc, "
            "  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y "
            "  FROM orders), "
            "f AS (SELECT least(floor(sc * 10)::INT, 9) AS bin, sc, y "
            "  FROM s WHERE sc IS NOT NULL AND sc >= 0 AND sc <= 1) "
            "SELECT bin, count(*)::BIGINT AS n, avg(sc) AS confidence, "
            "sum(y)::DOUBLE / count(*) AS accuracy, "
            "abs(avg(sc) - sum(y)::DOUBLE / count(*)) AS abs_gap "
            "FROM f GROUP BY 1",
        "kl_novelty_docs":
            # identical factored KL sum over the engine-tokenizer terms
            f"WITH toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS term "
            "  FROM documents), "
            "dt AS (SELECT doc_id, term, count(*)::BIGINT AS cdt "
            "  FROM toks GROUP BY 1, 2), "
            "nd AS (SELECT doc_id, sum(cdt)::BIGINT AS nd "
            "  FROM dt GROUP BY 1), "
            "cw AS (SELECT term, count(*)::BIGINT AS cw "
            "  FROM toks GROUP BY 1), "
            "ct AS (SELECT sum(cw)::DOUBLE AS ctotal FROM cw), "
            "num AS (SELECT dt.doc_id, "
            "  sum(cdt * (ln(cdt) - ln(cw / ctotal))) AS num "
            "  FROM dt JOIN cw USING (term), ct GROUP BY 1) "
            "SELECT doc_id, nd AS n_tok, num / nd - ln(nd) AS kl "
            "FROM num JOIN nd USING (doc_id)",
        "pca_project_vecs": _pca_sql(),
        "domain_census_docs":
            f"WITH {_domain_sql_ctes()} "
            "SELECT domain, count(*) AS n_docs, "
            # ::BIGINT: DuckDB's sum(BIGINT) is HUGEINT, which the
            # python client surfaces as float — match Spark's long
            f"sum(len({_SQL_TOKENS}))::BIGINT AS n_tok, "
            "count(*) / (SELECT count(*)::DOUBLE FROM documents) "
            "AS doc_share FROM doms GROUP BY 1",
        "domain_cap_docs":
            # the two-phase cap is exactly the single-window rank over
            # the identical (hash draw, id) key
            f"WITH {_domain_sql_ctes()}, "
            "keyed AS (SELECT doc_id, domain, "
            "  ('0x' || substr(sha256('v1:' || doc_id), 1, 8))::UBIGINT "
            "  / 4294967296.0 AS u FROM doms), "
            "r AS (SELECT doc_id, domain, row_number() OVER ("
            "  PARTITION BY domain ORDER BY u, doc_id) AS rn FROM keyed) "
            "SELECT doc_id, domain FROM r WHERE rn <= 5",
        "domain_block_flags":
            f"WITH {_domain_sql_ctes()}, "
            "shares AS (SELECT domain, count(*) / "
            "  (SELECT count(*)::DOUBLE FROM documents) AS share "
            "  FROM doms GROUP BY 1) "
            "SELECT d.doc_id, d.domain, "
            "coalesce(d.domain IN ('site0.co.uk', 'site2.org'), FALSE) "
            "  AS blocked, "
            "s.share > 0.10 AS over_share, "
            "NOT coalesce(d.domain IN ('site0.co.uk', 'site2.org'), "
            "  FALSE) AND NOT (s.share > 0.10) AS keep "
            "FROM doms d JOIN shares s "
            "ON d.domain IS NOT DISTINCT FROM s.domain",
        "dag_levels_parts":
            # longest path from any source: enumerate every
            # source-anchored path (the halving/skip DAG keeps path
            # counts Fibonacci-bounded) and take max(depth)
            "WITH RECURSIVE base AS ("
            "  SELECT p_partkey AS src, p_partkey // 2 AS dst FROM part "
            "    WHERE p_partkey >= 2 AND p_partkey < 512 "
            "  UNION "
            "  SELECT p_partkey, p_partkey // 4 FROM part "
            "    WHERE p_partkey >= 4 AND p_partkey < 512), "
            "allnodes AS (SELECT src AS node FROM base "
            "  UNION SELECT dst FROM base), "
            "srcs AS (SELECT node FROM allnodes "
            "  WHERE node NOT IN (SELECT DISTINCT dst FROM base)), "
            "lv AS (SELECT node, 0 AS d FROM srcs "
            "  UNION ALL SELECT b.dst, lv.d + 1 FROM lv "
            "  JOIN base b ON b.src = lv.node) "
            "SELECT node, max(d)::INT AS level FROM lv GROUP BY 1",
        "hashed_tf_docs":
            # the identical sha256 bucket/sign arithmetic: bucket =
            # first 8 hex digits mod dim, sign = parity of the 9th
            "WITH t AS (SELECT doc_id, unnest("
            f"{_SQL_TOKENS}) AS term FROM documents), "
            "hs AS (SELECT doc_id, sha256('ht:' || term) AS h FROM t), "
            "e AS (SELECT doc_id, "
            "  ('0x' || substr(h, 1, 8))::UBIGINT % 64 AS bucket, "
            "  1 - 2 * (('0x' || substr(h, 9, 1))::UBIGINT % 2)::BIGINT "
            "  AS s FROM hs) "
            "SELECT doc_id, bucket, sum(s)::BIGINT AS weight FROM e "
            "GROUP BY 1, 2 HAVING sum(s) <> 0",
        "rbm_alignment_vecs":
            # mutual top-1 at rounded-4dp cosine with id tie-breaks —
            # two row_number windows over the same scored pairs
            "WITH l AS (SELECT vec_id AS lid, embedding AS lv "
            "  FROM embeddings WHERE vec_id < 50), "
            "r AS (SELECT vec_id AS rid, embedding AS rv "
            "  FROM embeddings WHERE vec_id >= 50 AND vec_id < 150), "
            "s AS (SELECT lid, rid, "
            "  round(list_cosine_similarity(lv, rv), 4) AS score "
            "  FROM l CROSS JOIN r), "
            "k AS (SELECT lid, rid, score, "
            "  row_number() OVER (PARTITION BY lid "
            "    ORDER BY score DESC, rid) AS rl, "
            "  row_number() OVER (PARTITION BY rid "
            "    ORDER BY score DESC, lid) AS rr FROM s) "
            "SELECT lid, rid, score FROM k WHERE rl = 1 AND rr = 1",
        "cdc_feed_orders":
            # the identical churn rules, then the full-outer null-safe
            # compare emitting NEW values for upserts, nulls for
            # deletes, nothing for unchanged keys
            "WITH old AS (SELECT o_orderkey, o_orderstatus, "
            "  o_totalprice FROM orders), "
            "new AS (SELECT o_orderkey, o_orderstatus, "
            "  o_totalprice + CASE WHEN o_orderkey % 7 = 0 "
            "    THEN 1.0 ELSE 0.0 END AS o_totalprice "
            "  FROM orders WHERE o_orderkey % 13 <> 0 "
            "  UNION ALL SELECT o_orderkey + 1000000000, o_orderstatus, "
            "  o_totalprice FROM orders WHERE o_orderkey % 11 = 0) "
            "SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey, "
            "CASE WHEN n.o_orderkey IS NULL THEN 'delete' "
            "  ELSE 'upsert' END AS op, "
            "n.o_orderstatus, coalesce(n.o_totalprice, -1.0) "
            "  AS o_totalprice "
            "FROM old o FULL OUTER JOIN new n "
            "ON o.o_orderkey = n.o_orderkey "
            "WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL "
            "OR NOT (o.o_orderstatus IS NOT DISTINCT FROM "
            "  n.o_orderstatus AND o.o_totalprice IS NOT DISTINCT FROM "
            "  n.o_totalprice)",
        "cdc_roundtrip_orders":
            # the INDEPENDENT construction of the new snapshot — the
            # Spark side must reconstruct it via feed + apply
            "SELECT o_orderkey, o_orderstatus, "
            "  o_totalprice + CASE WHEN o_orderkey % 7 = 0 "
            "    THEN 1.0 ELSE 0.0 END AS o_totalprice "
            "FROM orders WHERE o_orderkey % 13 <> 0 "
            "UNION ALL SELECT o_orderkey + 1000000000, o_orderstatus, "
            "o_totalprice FROM orders WHERE o_orderkey % 11 = 0",
        "latest_snapshot_urls":
            # group by the clean base url the variants normalize to;
            # newest ts per group (timestamps are distinct, so no
            # tiebreak fires)
            "WITH b AS (SELECT doc_id, "
            "  'https://site' || (doc_id % 37) || '.com/p/' "
            "    || (doc_id % 111) AS url_norm, "
            "  to_timestamp(1735689600 + doc_id) AS warc_ts "
            "  FROM documents) "
            "SELECT url_norm, doc_id, warc_ts FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY url_norm "
            "    ORDER BY warc_ts DESC, doc_id) AS rn FROM b) "
            "WHERE rn = 1",
    }
