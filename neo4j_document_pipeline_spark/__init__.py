"""PySpark-native knowledge-graph construction & retrieval engine.

A from-scratch rebuild of the capabilities of the reference GraphRAG
document pipeline (haja-k/neo4j-document-pipeline) as a staged PySpark
DataFrame DAG over Parquet tables:

- write path: pages -> documents -> chunks -> triples_raw -> nodes/edges
  (reference: ingestMD.py ingest procedure)
- read path: hybrid (vector + keyword) retrieval -> MMR -> cross-doc
  diversification -> n-hop traversal -> graph-facts formatting
  (reference: graphutil.py + main.py /graphrag)
- plus large-scale training-data operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), similarity search, text analysis,
  multimodal column plumbing.

Everything is deterministic: remote LLM/embedding calls in the reference
are replaced by frozen rule-based extractors and a seeded hashed-TF-IDF
featurizer, preserving every downstream algorithm exactly.
"""

__version__ = "0.1.0"

from neo4j_document_pipeline_spark.config import PipelineConfig  # noqa: F401
