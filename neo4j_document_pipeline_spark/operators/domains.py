"""Domain-level corpus hygiene — the per-SITE view of a web crawl.

Web-text pipelines (RefinedWeb, C4's badlist pass, Common Crawl's own
stats) make three decisions at REGISTERED-DOMAIN granularity, not
per-document, because spam, boilerplate farms and crawl skew are
site-shaped phenomena:

- ``domain_census``: how many documents/tokens each registrant
  contributes and what share of the corpus that is — the readout that
  decides whether per-domain caps are needed at all (a corpus where one
  domain holds 30% of documents trains a domain classifier, not a
  language model);
- ``domain_cap_sample``: keep at most ``cap`` documents per registered
  domain, selected by the engine's deterministic uniform hash draw —
  the standard head-domain flattening move (inclusion is a pure
  function of (doc id, salt): identical across partitionings, cluster
  sizes and re-runs);
- ``domain_filter_flags``: per-document keep flags from an explicit
  blocklist plus a corpus-share ceiling (the "no single registrant
  above X%" rule).

All three run on the registered domain from
``functions.textstats.col_registered_domain`` (two-level-suffix-aware,
SQL-replayable), so "bbc.co.uk" and "news.bbc.co.uk" cap as one site.

Scale shapes: the census is one hash aggregate whose key space is the
domain count (millions, not trillions — it broadcasts); the cap is a
TWO-PHASE N-smallest (per-(domain, salt-bucket) truncation first, then
the merge rank over <= buckets*cap survivors), so the hottest domain's
sort is bounded by its bucket slice instead of serializing 10^9 rows
through one window partition — the same skew treatment as the ingest
path's bounded sources accumulation (operators/skew.py); the flags are
a broadcast join against the census. Reference anchor: the per-source
document accounting in /root/reference main.py's ingest stats is the
per-upload degenerate case of this census.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.textstats import (
    col_registered_domain, col_token_count, col_url_host)
from neo4j_document_pipeline_spark.operators.sampling import (
    uniform_hash_col)


def _with_domain(df: DataFrame, url_col: str) -> DataFrame:
    return df.withColumn(
        "domain", col_registered_domain(col_url_host(F.col(url_col))))


def domain_census(df: DataFrame, url_col: str,
                  text_col: str) -> DataFrame:
    """Per-registered-domain corpus census -> (domain, n_docs, n_tok,
    doc_share): document count, total token count (engine tokenizer,
    SQL-replayable) and this domain's fraction of all documents.
    Documents whose URL has no host group under domain NULL — they
    stay visible (a corpus where 40% of urls don't parse is a bug to
    surface, not drop).

    Shape: one hash aggregate keyed by domain (map-side combined), the
    corpus total folded IN-PLAN as a broadcast one-row aggregate —
    zero driver actions, one job at any scale."""
    d = _with_domain(df, url_col)
    per = d.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum(col_token_count(F.col(text_col))).alias("n_tok"))
    total = per.agg(F.sum("n_docs").cast("double").alias("_total"))
    return (per.join(F.broadcast(total), F.lit(True))
            .select("domain", "n_docs", "n_tok",
                    (F.col("n_docs") / F.col("_total"))
                    .alias("doc_share")))


def domain_cap_sample(df: DataFrame, url_col: str, id_col: str,
                      cap: int, *, salt: str = "v1",
                      salt_buckets: int = 16) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain, chosen by
    the smallest deterministic uniform hash draws (ties on the id) —
    head-domain flattening whose selection is a pure function of
    (id, salt): re-partitioning, cluster resizing or re-running scans
    selects the SAME documents, and changing ``salt`` draws an
    independent cap sample. Output is the input columns plus
    ``domain``.

    Exactness of the two-phase form: the global per-domain cap-smallest
    set is a subset of the union of per-bucket cap-smallest sets (any
    row in the true answer is among the cap smallest of its own
    bucket), so truncating each (domain, bucket) slice to ``cap`` rows
    before the final per-domain rank loses nothing. Phase 1's window
    sorts at most ceil(domain_size / salt_buckets) rows per partition;
    phase 2 ranks <= salt_buckets * cap survivors per domain."""
    if cap < 1:
        raise ValueError(f"domain_cap_sample: cap must be >= 1, got {cap}")
    if salt_buckets < 1:
        raise ValueError("domain_cap_sample: salt_buckets must be >= 1")
    d = (_with_domain(df, url_col)
         .withColumn("_u", uniform_hash_col(id_col, salt)))
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                    F.lit(salt_buckets))
    w1 = (Window.partitionBy("domain", bucket)
          .orderBy(F.asc("_u"), F.asc(id_col)))
    survivors = (d.withColumn("_rn1", F.row_number().over(w1))
                 .filter(F.col("_rn1") <= cap).drop("_rn1"))
    w2 = Window.partitionBy("domain").orderBy(F.asc("_u"), F.asc(id_col))
    return (survivors.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= cap).drop("_rn", "_u"))


def domain_filter_flags(df: DataFrame, url_col: str, id_col: str, *,
                        blocklist: list[str] | None = None,
                        max_share: float | None = None) -> DataFrame:
    """Per-document domain keep flags -> (id_col, domain, blocked,
    over_share, keep): ``blocked`` when the registered domain is on the
    explicit blocklist (spam/SEO-farm lists — matched on the registered
    domain, so listing 'contentfarm.com' also blocks every subdomain),
    ``over_share`` when the domain's corpus document share exceeds
    ``max_share``, ``keep`` when neither. Hostless URLs (domain NULL)
    are never blocklist-matched but DO count toward share (NULL groups
    like any domain — an unparseable-url flood is exactly the kind of
    skew the ceiling exists for).

    Shape: the census is domain-cardinality-sized and joins back
    broadcast; the blocklist folds in-plan as an ``isin`` literal."""
    if max_share is not None and not (0.0 < float(max_share) <= 1.0):
        raise ValueError(
            f"domain_filter_flags: max_share must be in (0, 1], "
            f"got {max_share}")
    bl = [b.lower() for b in (blocklist or [])]
    d = _with_domain(df, url_col)
    shares = (d.groupBy(F.col("domain").alias("_dom"))
              .agg(F.count("*").alias("_n"))
              .join(F.broadcast(
                  d.agg(F.count("*").cast("double").alias("_total"))),
                  F.lit(True))
              .select("_dom", (F.col("_n") / F.col("_total"))
                      .alias("_share")))
    # eqNullSafe: the NULL-domain group must find its own share row (a
    # plain equi key would drop it and silently exempt hostless urls
    # from the ceiling)
    out = d.join(F.broadcast(shares),
                 F.col("domain").eqNullSafe(F.col("_dom")), "left")
    # isin on a NULL domain yields NULL, not False — coalesce so a
    # hostless url is "not blocked", never "unknown"
    blocked = (F.coalesce(F.col("domain").isin(bl), F.lit(False)) if bl
               else F.lit(False))
    over = (F.col("_share") > F.lit(float(max_share))
            if max_share is not None else F.lit(False))
    return out.select(
        F.col(id_col), F.col("domain"),
        blocked.alias("blocked"), over.alias("over_share"),
        (~blocked & ~over).alias("keep"))
