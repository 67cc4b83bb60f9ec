"""Pipeline configuration — mirrors the reference's knobs (SURVEY.md §2.11).

Reference defaults, with citations into /root/reference/:
- chunk size 2500 tokens (config/embedConfig.yaml:9), overlap 0 (ingestMD.py:34)
- top_k=10, hops=1 clamped to [1,3] (main.py:47-48,337)
- alpha_vec=0.6 / beta_kw=0.4 (main.py:51-52,271), renormalized to sum 1
  (graphutil.py:437-439)
- k_vec = k_kw = max(12, top_k) (main.py:270-271)
- MMR lambda = 0.7 (graphutil.py:454)
- fulltext limit floor 16 (graphutil.py:329)
- anchors <=3 / keywords <=8 (graphutil.py:313-314)
- normal-path source text clamp 1000 chars (ingestMD.py:494)
- embedding dim 3072 in the reference (main.py:181); we default to a
  smaller deterministic featurizer dim for test speed (the algorithms are
  dimension-agnostic).
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_LABELS = [
    "Stakeholder", "Goal", "Challenge", "Outcome", "Policy", "Strategy",
    "Pillar", "Sector", "Time_Period", "Infrastructure", "Technology",
    "Initiative", "Objective", "Target", "Opportunity", "Vision", "Region",
    "Enabler", "Entity",
]  # graphutil.py:159-163


@dataclass(frozen=True)
class PipelineConfig:
    # --- ingest / write path ---
    chunk_size_tokens: int = 2500          # embedConfig.yaml:9
    chunk_overlap_tokens: int = 0          # ingestMD.py:34
    src_txt_clamp: int = 1000              # ingestMD.py:494
    # bounded per-edge state at CC scale: cap the sources doc_id list at
    # the N lexicographically-smallest ids (deterministic under any ingest
    # order, so MERGE stays idempotent). None = unbounded, reference-
    # faithful append-if-absent (ingestMD.py:516-526) — a celebrity edge
    # across 10^9 docs would otherwise carry a 10^9-element array.
    max_sources_per_edge: int | None = None
    embedding_dim: int = 64                # featurizer dim (reference: 3072)
    featurizer_seed: int = 42
    fixed_clock_millis: int = 1764288000000  # 2025-11-28T00:00:00Z; injected
    # so fixtures are reproducible (reference stamps wall-clock timestamp(),
    # ingestMD.py:347,517 — tests must not).

    # --- query / read path ---
    top_k: int = 10                        # main.py:47
    hops: int = 1                          # main.py:48 (clamped 1..3 at use)
    alpha_vec: float = 0.6                 # main.py:51
    beta_kw: float = 0.4                   # main.py:52
    mmr_lambda: float = 0.7                # graphutil.py:454
    fts_limit_floor: int = 16              # graphutil.py:329
    max_anchor_terms: int = 3              # graphutil.py:313
    max_keywords: int = 8                  # graphutil.py:314

    # --- scale knobs ---
    shuffle_partitions: int = 32
    # bucket(N, key) physical layout for the graph tables (0 = plain
    # parquet). With N > 0, nodes/edges/mentions commit as catalog-
    # registered bucketed tables (nodes by entity_id, edges by src_id,
    # mentions by entity_id), so the read path's edges ⋈ nodes and
    # mentions ⋈ nodes equi-joins run with NO shuffle on either side —
    # the storage-partitioned join SURVEY §1.3 calls for at 100 TB.
    store_buckets: int = 0
    # committed ANN index over node embeddings (the vector-index analogue
    # of ingestMD.py:669-690): IVF coarse cells the index table is
    # hive-partitioned by, and how many of them a query probes. 0 (the
    # default) derives the cell count from the indexed corpus at build
    # time — ceil(rows / ann_target_cell_rows), clamped — so the probe's
    # scan fraction (~nprobe/n_cells) SHRINKS as the corpus grows; a
    # positive value pins an explicit geometry. nprobe >= n_cells
    # degrades to exact brute force over the index copy; smaller nprobe
    # trades recall for scan fraction.
    ann_cells: int = 0
    ann_target_cell_rows: int = 1024
    ann_nprobe: int = 8
    # bucket(N, tok) layout of the committed FTS postings (node_tokens):
    # all postings of a tok land in tok's bucket, which is what lets an
    # incremental batch MERGE its delta postings by rewriting only the
    # touched bucket files (df recounts stay exact per bucket).
    # 0 (default) derives the count from the indexed corpus at build
    # time — ceil(rows / target), clamped (retrieval.resolve_index_
    # buckets) — so bucket files stay in the sensible-size band at any
    # scale instead of a fixed 32 (32 near-empty scan tasks per keyword
    # query on a test corpus, GB-sized bucket rewrites at 100 TB). A
    # positive value pins an explicit geometry; committed tables always
    # keep their manifest's n_buckets regardless (merge compatibility).
    # State tables with no cheap row estimate at build time (hygiene
    # line/gram postings, doc signatures) use max(bucket floor, 8).
    fts_index_buckets: int = 0
    ann_train_iters: int = 3
    # coarse-quantizer training sample (0 = fully-distributed training):
    # one pass collects a deterministic sample, Lloyd runs driver-side —
    # the standard IVF practice at any scale (see similarity.ivf_train)
    ann_train_sample: int = 65_536
    # recall floor: widen the probe set (in centroid-distance order)
    # until the probed cells cover at least this many index rows — on a
    # tiny corpus that degrades to an exact full probe, while at design
    # scale (10^8+ rows/cell) the first cell already covers it and the
    # scan stays nprobe/ann_cells. Per-cell row counts come from the
    # index manifest's partition lineage: zero extra jobs.
    ann_min_probe_rows: int = 1024
    # build the index only when the nodes table has at least this many
    # embedded rows — below it a brute-force scan is already one task and
    # the index would only add a per-ingest training job
    ann_min_rows: int = 64
    # IVFPQ serving (0 = off): store m-byte PQ codes in node_vectors
    # INSTEAD of full embeddings (m bytes vs 4*dim per row — the
    # billion-scale memory shape); queries ADC-score the probed cells'
    # codes and exact-rerank the top candidates against the nodes table.
    # Requires embedding_dim % ann_pq_m == 0.
    ann_pq_m: int = 0
    ann_pq_k: int = 16
    # PQ codebook k-means iterations (per subspace, driver-side over the
    # shared training sample) — separate from ann_train_iters because the
    # per-subspace quantizers are much finer than the coarse cells and
    # need more steps to converge
    ann_pq_train_iters: int = 8
    # per-label coarse quantizers (the reference maintains one vector
    # index PER LABEL, ingestMD.py:669-690). False (default): ONE global
    # quantizer — rare-label recall is protected by the label-aware probe
    # floor (ann_min_probe_rows). True: a k-means per label, trained from
    # ONE stratified sample pass (not len(labels) jobs) with each label's
    # cell count derived from ITS row count; cell ids are allocated as
    # contiguous ranges of one flat cell space, so the (label, cell)
    # partition layout, probe machinery, and sidecar format are
    # unchanged, and a labeled query ranks only its labels' cells.
    ann_per_label: bool = False
    # per-label training sample cap (the stratified pass collects <= this
    # many vectors per label driver-side; a smaller label trains on all
    # its rows).
    ann_label_train_sample: int = 8192
    # TOTAL driver-side row budget for the stratified pass across ALL
    # labels — without it, memory would scale with label cardinality
    # (labels x cap x dim floats). The effective per-label cap is
    # min(ann_label_train_sample, budget / n_labels), floored at 256 so
    # extreme label universes still train usable quantizers (the floor,
    # not the budget, then bounds memory at 256 x labels x dim).
    ann_label_train_budget: int = 65_536
    salt_buckets: int = 8                  # skew salting factor for head keys
    broadcast_threshold_rows: int = 100_000
    lsh_bands: int = 16
    lsh_rows_per_band: int = 4             # minhash sig len = bands*rows
    # entity-linking verification threshold. Two scorers share it
    # (operators/linking.py::link_entities): 'jaccard' (default) — exact
    # shingle-Jaccard over normalized names, strictly stronger evidence
    # than a cosine approximation of the same shingles — and 'tfidf',
    # the north-star-literal TF-IDF cosine (smooth IDF over the entity
    # corpus), oracle-checked via tfidf_cosine_links_exact
    link_jaccard_threshold: float = 0.6
    # which of the two scorers the canonicalize pipeline stage verifies
    # candidates with ('jaccard' | 'tfidf')
    link_score: str = "jaccard"

    labels: tuple = field(default=tuple(DEFAULT_LABELS))

    @property
    def minhash_sig_len(self) -> int:
        return self.lsh_bands * self.lsh_rows_per_band


DEFAULT_CONFIG = PipelineConfig()
