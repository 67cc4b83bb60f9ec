"""Entity linking — MinHash-LSH blocking + exact shingle-Jaccard verify.

The reference merges entities only on exact (label, name)
(/root/reference/ingestMD.py:505,509); near-duplicate names ("Phase Two"
vs "phase-2") survive as distinct nodes and are only deduped at
read-format time (graphutil.py:640-674). The north star requires linking
them at WRITE time: MinHash-LSH candidate blocking + similarity
verification, then connected components -> canonical entity ids.
Two verification scorers (``link_entities(score=...)``):
``'jaccard'`` (default) — EXACT Jaccard over the same normalized-name
shingles the signatures hash, strictly stronger evidence than a cosine
approximation of it, fully JVM-side; ``'tfidf'`` — the north-star's
literal TF-IDF cosine scoring (smooth IDF over the entity corpus, rare
grams dominate), same candidates and threshold semantics, with an
exhaustive exact kernel (``tfidf_cosine_links_exact``) that doubles as
its DuckDB oracle (`tfidf_name_links`).

Design (scale-first):
- signatures: k=bands*rows minhashes over character-3-gram shingles of
  the normalized name (py_normalize_name_for_key semantics — the same
  normalization the reference dedups with);
- blocking: (band_id, hash(band slice)) -> block key. Same-label blocking
  only (linking a Goal to a Stakeholder is never correct here);
- pair generation: self-join within block with id1 < id2. Head-block
  skew control: blocks larger than ``max_block_size`` are dropped from
  pair generation (they are near-degenerate shingle sets — e.g. empty
  names) and counted in the metrics; AQE skew-join handles the rest;
- verification: exact shingle Jaccard >= cfg.link_jaccard_threshold;
- canonicalization: connected components over verified links; canonical
  id = lexicographic min entity_id (deterministic).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from neo4j_document_pipeline_spark.operators.components import connected_components

# 2^31-1: with a,b < p and x pre-reduced mod p, the product a*x stays
# under 2^62 — no silent int64 wraparound, so (a*x+b) mod p really is the
# universal hash the LSH band/row collision math assumes (a 2^61-1 prime
# overflows int64 at x*a and voids the construction)
_MERSENNE = (1 << 31) - 1


def _minhash_params(k: int, seed: int):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64)
    return a, b


def minhash_signatures(df: DataFrame, text_col: str,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       n_shingle: int = 3) -> DataFrame:
    """(.., text) -> (.., sig array<long>, shingles array<long>).

    ``sig`` drives LSH banding; ``shingles`` (sorted distinct crc32 of
    char n-grams of the NORMALIZED text) enables exact Jaccard
    verification JVM-side (array_intersect/array_union) after blocking."""
    k = cfg.minhash_sig_len
    seed = cfg.featurizer_seed
    a_, b_ = _minhash_params(k, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib
        from neo4j_document_pipeline_spark.functions.text import (
            py_normalize_name_for_key,
        )
        for pdf in batches:
            sigs, shingles = [], []
            for text in pdf[text_col]:
                norm = py_normalize_name_for_key(text)
                if not norm:
                    # names that normalize to nothing (non-ASCII scripts,
                    # punctuation-only) carry no evidence: give each a
                    # UNIQUE sentinel signature so unrelated entities never
                    # share a block (padding would give them all the SAME
                    # shingle and link them at sim 1.0)
                    sigs.append([zlib.crc32(str(text).encode("utf-8"))] * k)
                    shingles.append([])
                    continue
                s = f"  {norm}  "
                sh = {zlib.crc32(s[i:i + n_shingle].encode("utf-8"))
                      for i in range(len(s) - n_shingle + 1)}
                x = np.fromiter(sh, dtype=np.int64)[:, None] % _MERSENNE  # (S,1)
                hv = (x * a_[None, :] + b_[None, :]) % _MERSENNE   # (S,k)
                sigs.append(hv.min(axis=0).tolist())
                shingles.append(sorted(sh))
            out = pdf.copy()
            out["sig"] = sigs
            out["shingles"] = shingles
            yield out[[c for c in pdf.columns if c != text_col]
                      + ["sig", "shingles"]]

    out_cols = [c for c in df.columns if c != text_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in out_cols
    ) + ", sig array<bigint>, shingles array<bigint>"
    return df.mapInPandas(gen, schema=schema)


def lsh_blocks(sigs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG,
               extra_key: str | None = None) -> DataFrame:
    """Explode signatures into (band, band_hash [, extra_key]) block keys."""
    bands, rows = cfg.lsh_bands, cfg.lsh_rows_per_band
    band_cols = []
    for b in range(bands):
        band = F.slice("sig", b * rows + 1, rows)
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.hash(band).alias("bh"))
        )
    out = sigs.withColumn("bk", F.explode(F.array(*band_cols)))
    key_cols = [F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")]
    if extra_key:
        key_cols.append(F.col(extra_key))
    return out.select(
        *key_cols, *[c for c in sigs.columns if c not in ("sig", "shingles")]
    )


def candidate_pairs(blocks: DataFrame, id_col: str,
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    max_block_size: int = 64,
                    block_cols: tuple = ("band", "bh")) -> DataFrame:
    """Within-block self-join (id1 < id2), oversized blocks dropped."""
    sized = blocks.withColumn(
        "_bs", F.count("*").over(Window.partitionBy(*block_cols)),
    ).filter(F.col("_bs") <= max_block_size).drop("_bs")
    a = sized.select(*block_cols, F.col(id_col).alias("id1"))
    b = sized.select(*block_cols, F.col(id_col).alias("id2"))
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def _name_shingles_df(df: DataFrame, id_col: str, name_col: str,
                      n_shingle: int = 3,
                      extra_cols: tuple = ()) -> DataFrame:
    """(id, shingle) posting rows over STRING char n-gram shingles of
    ``'  ' + normalized(name) + '  '`` — the expression twin of
    minhash_signatures' shingle construction (which crc32-hashes the
    same grams for banding); string shingles keep TF-IDF scoring and its
    SQL oracle hash-free. Distinct per id; names that normalize to
    nothing yield no rows (no linking evidence)."""
    from neo4j_document_pipeline_spark.functions.text import (
        col_normalize_name_for_key)
    from neo4j_document_pipeline_spark.functions.textstats import col_let

    # normalized name let-bound so the per-position lambda substrings a
    # materialized value instead of re-running the normalization
    # regexes per shingle (see col_let)
    def with_s(s):
        return F.when(
            F.length(s) > 4,  # '    ' == empty normalized name
            F.array_distinct(F.transform(
                F.sequence(F.lit(1), F.length(s) - (n_shingle - 1)),
                lambda i: s.substr(i, F.lit(n_shingle)))),
        ).otherwise(F.array().cast("array<string>"))

    grams = col_let(
        F.concat(F.lit("  "), col_normalize_name_for_key(F.col(name_col)),
                 F.lit("  ")),
        with_s)
    return (df.select(F.col(id_col).alias("id"), *extra_cols,
                      F.explode(grams).alias("shingle")))


def _tfidf_weighted_postings(posting: DataFrame, n_rows: int):
    """Attach smooth-IDF weights (ln((1+N)/(1+df)) + 1, sklearn
    convention) to distinct (id, shingle) postings and return
    (weighted postings, per-id squared norms). With distinct shingles
    per id, tf == 1, so the pair dot product is sum of idf^2 over
    SHARED shingles — all equi-join/agg work."""
    dfreq = posting.groupBy("shingle").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(1.0 + n_rows)) / (F.col("df") + 1.0)) + F.lit(1.0)
    wpost = posting.join(dfreq, "shingle").withColumn("w", idf) \
        .select("id", "shingle", "w")
    norms = wpost.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    return wpost, norms


def _score_pairs_tfidf(pairs: DataFrame, wpost: DataFrame,
                       norms: DataFrame) -> DataFrame:
    """(id1, id2) -> (id1, id2, sim) where sim is the TF-IDF cosine of
    the two shingle sets (idf^2-weighted overlap / norms)."""
    w1 = wpost.select(F.col("id").alias("id1"), "shingle",
                      F.col("w").alias("w1"))
    w2 = wpost.select(F.col("id").alias("id2"), "shingle",
                      F.col("w").alias("w2"))
    dots = (pairs.join(w1, "id1").join(w2, ["id2", "shingle"])
            .groupBy("id1", "id2")
            .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot")))
    n1 = norms.select(F.col("id").alias("id1"), F.col("n2").alias("n21"))
    n2_ = norms.select(F.col("id").alias("id2"), F.col("n2").alias("n22"))
    return (
        pairs.join(dots, ["id1", "id2"], "left")
        .join(n1, "id1").join(n2_, "id2")
        .withColumn("sim", F.coalesce(F.col("dot"), F.lit(0.0))
                    / F.sqrt(F.col("n21") * F.col("n22")))
        .select("id1", "id2", "sim")
    )


def link_entities(nodes: DataFrame,
                  cfg: PipelineConfig = DEFAULT_CONFIG,
                  jaccard_threshold: float | None = None,
                  score: str = "jaccard",
                  n_rows: int | None = None) -> DataFrame:
    """nodes(entity_id,label,name,...) -> verified link edges
    (id1, id2, sim). Blocking is per-label MinHash-LSH over normalized-name
    shingles. Verification (``score``):

    - ``'jaccard'`` (default): EXACT shingle Jaccard >= threshold,
      JVM-side (array_intersect / array_union) — variants that normalize
      to the same key ("Phase Two" / "phase-2" -> "phase 2") get
      sim = 1.0;
    - ``'tfidf'``: the north-star-literal TF-IDF cosine over the same
      normalized-name char-3-gram shingles (smooth IDF over the entity
      corpus; rare grams dominate, boilerplate grams fade). Same
      candidates, same threshold semantics; the scoring kernel is
      oracle-checked standalone via tfidf_cosine_links_exact.

    ``n_rows`` sizes the TF-IDF IDF denominator from the caller (the
    nodes manifest already stamps its row count) so the linking stage
    runs no count() job; omitted, it falls back to counting."""
    if jaccard_threshold is None:
        jaccard_threshold = cfg.link_jaccard_threshold
    base = nodes.select("entity_id", "label", "name")
    sigs = minhash_signatures(base, "name", cfg)
    blocks = lsh_blocks(sigs, cfg, extra_key="label")
    pairs = candidate_pairs(blocks, "entity_id", cfg,
                            block_cols=("band", "bh", "label"))

    if score == "tfidf":
        posting = _name_shingles_df(base, "entity_id", "name")
        if n_rows is None:
            n_rows = base.count()
        wpost, norms = _tfidf_weighted_postings(posting, n_rows)
        return (_score_pairs_tfidf(pairs, wpost, norms)
                .filter(F.col("sim") >= F.lit(jaccard_threshold)))

    sh = sigs.select("entity_id", "shingles")
    s1 = sh.select(F.col("entity_id").alias("id1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("entity_id").alias("id2"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size(F.array_union("sh1", "sh2"))
    return (
        pairs.join(s1, "id1").join(s2, "id2")
        .withColumn("sim", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("sim") >= F.lit(jaccard_threshold))
        .select("id1", "id2", "sim")
    )


def tfidf_cosine_links_exact(df: DataFrame, id_col: str, name_col: str,
                             threshold: float = 0.6,
                             label_col: str | None = None) -> DataFrame:
    """EXACT TF-IDF-cosine linking with EXHAUSTIVE candidates: cosine > 0
    iff the two names share a shingle, so a shared-shingle inverted join
    misses no pair (the same exhaustiveness argument as
    dedup.ngram_jaccard_exact) — which makes the all-pairs SQL a faithful
    oracle of this scoring kernel. With ``label_col``, only same-label
    pairs are linked (linking across labels is never correct here) while
    IDF stays corpus-global. Bounded-subset / audit path; the production
    LSH-blocked path shares the identical scoring
    (link_entities(score='tfidf'))."""
    extra = (F.col(label_col),) if label_col else ()
    posting = _name_shingles_df(df, id_col, name_col, extra_cols=extra)
    n_rows = df.count()
    wpost, norms = _tfidf_weighted_postings(
        posting.select("id", "shingle").distinct(), n_rows)
    p1 = posting.select(F.col("id").alias("id1"), "shingle",
                        *[c.alias("l1") for c in extra])
    p2 = posting.select(F.col("id").alias("id2"), "shingle",
                        *[c.alias("l2") for c in extra])
    cand = p1.join(p2, "shingle").filter(F.col("id1") < F.col("id2"))
    if label_col:
        cand = cand.filter(F.col("l1") == F.col("l2"))
    pairs = cand.select("id1", "id2").distinct()
    return (_score_pairs_tfidf(pairs, wpost, norms)
            .filter(F.col("sim") >= F.lit(threshold)))


def _canon_sources(max_sources: int | None):
    agg = F.array_sort(F.array_distinct(F.flatten(F.collect_list("sources"))))
    return F.slice(agg, 1, max_sources) if max_sources else agg


def canonical_map(nodes: DataFrame, links: DataFrame) -> DataFrame:
    """links -> (entity_id, canonical_id); unlinked entities map to
    themselves."""
    comps = connected_components(
        links.select(F.col("id1").alias("u"), F.col("id2").alias("v")))
    return (
        nodes.select("entity_id")
        .join(comps.withColumnRenamed("id", "entity_id"), "entity_id", "left")
        .withColumn("canonical_id", F.coalesce("component", "entity_id"))
        .select("entity_id", "canonical_id")
    )


def apply_canonicalization(nodes: DataFrame, edges: DataFrame,
                           mentions: DataFrame, mapping: DataFrame,
                           max_sources: int | None = None):
    """Rewrite the graph onto canonical ids. The canonical node keeps the
    lexicographically-smallest (name) representative's properties.
    ``max_sources`` re-applies cfg.max_sources_per_edge after edge merging
    (merging K capped edges would otherwise regrow to K*N ids)."""
    m = mapping
    canon_nodes = (
        nodes.join(m, "entity_id")
        .withColumn("entity_id", F.col("canonical_id")).drop("canonical_id")
        .groupBy("entity_id")
        .agg(F.min_by(F.struct("label", "name", "embedding", "start", "end"),
                      F.struct("name", "label")).alias("p"))
        .select("entity_id", "p.label", "p.name", "p.embedding", "p.start", "p.end")
    )
    src_m = m.select(F.col("entity_id").alias("src_id"),
                     F.col("canonical_id").alias("new_src"))
    dst_m = m.select(F.col("entity_id").alias("dst_id"),
                     F.col("canonical_id").alias("new_dst"))
    canon_edges = (
        edges.join(src_m, "src_id").join(dst_m, "dst_id")
        .withColumn("src_id", F.col("new_src"))
        .withColumn("dst_id", F.col("new_dst"))
        .drop("new_src", "new_dst")
        .withColumn("term_k", F.coalesce("term", F.lit("")))
        .groupBy("src_id", "rel_type", "term_k", "dst_id")
        .agg(
            _canon_sources(max_sources).alias("sources"),
            # deterministic last-write-wins: within one run every edge
            # carries the SAME fixed-clock updated_at, so a bare
            # max_by(updated_at) tie is partition-order-dependent — break
            # ties on the full payload (same argmax-struct pattern as
            # build_edges)
            F.max(F.struct(
                F.col("updated_at").alias("ts"),
                F.col("source_text_full"), F.col("count"),
                F.col("embedding"), F.col("term"),
            )).alias("_last"),
            F.min("created_at").alias("created_at"),
            F.max("updated_at").alias("updated_at"),
        )
        .select(
            "src_id", "rel_type", "term_k", "dst_id", "sources",
            F.col("_last.source_text_full").alias("source_text_full"),
            F.col("_last.count").alias("count"),
            F.col("_last.embedding").alias("embedding"),
            F.col("_last.term").alias("term"),
            "created_at", "updated_at",
        )
        .drop("term_k")
        .select("src_id", "dst_id", "rel_type", "term", "count", "embedding",
                "sources", "source_text_full", "created_at", "updated_at")
    )
    canon_mentions = (
        mentions.join(m, "entity_id")
        .select("doc_id", F.col("canonical_id").alias("entity_id"))
        .dropDuplicates(["doc_id", "entity_id"])
    )
    return canon_nodes, canon_edges, canon_mentions
