"""Neo4j bulk-import export sink — the committed KG as `neo4j-admin
database import full` CSVs.

The reference's sink IS Neo4j (`/root/reference/graphutil.py` MERGEs
nodes/edges over Bolt); this engine materializes the same graph as
parquet tables. This module closes the interop loop in the other
direction: a user can lift the whole committed store into a real Neo4j
with one offline bulk import — the tool Neo4j itself recommends over
per-row MERGE at exactly the scale this engine targets.

Layout (one header file + a DIRECTORY of headerless part CSVs per
table — neo4j-admin's multi-file convention, so the data files are
written DISTRIBUTED, no single-file coalesce bottleneck):

    out_dir/
      entities.header.csv   entities/part-*.csv      (:ID(Entity), :LABEL)
      documents.header.csv  documents/part-*.csv     (:ID(Document))
      relates.header.csv    relates/part-*.csv       (:START_ID -> :END_ID, :TYPE)
      mentions.header.csv   mentions/part-*.csv      (Document -MENTIONS-> Entity)
      import.sh             the ready-to-run neo4j-admin command

Formats follow the public neo4j-admin import contract: RFC-4180 quoting
(quote doubling, NOT backslash escaping — Spark's csv writer is
configured accordingly), `;` as the array delimiter for `float[]` /
`string[]` columns, ISO-8601 timestamps, empty field = null, distinct
ID groups (Entity, Document) because doc ids and entity ids are
different hash spaces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RFC-4180: quote with '"', escape by doubling the quote. Spark's csv
# default escape is backslash, which neo4j-admin does not understand —
# and its writer TRIMS leading/trailing whitespace by default, which
# would silently corrupt text properties; both overridden here.
_CSV_OPTS = {"header": "false", "quote": '"', "escape": '"',
             "emptyValue": "", "nullValue": "",
             "ignoreLeadingWhiteSpace": "false",
             "ignoreTrailingWhiteSpace": "false"}
ARRAY_DELIM = ";"


def _arr(col: str) -> F.Column:
    """';'-joined array cell (neo4j --array-delimiter), null -> empty.
    Disclosed limitation: an EMPTY array also renders as an empty cell,
    which neo4j-admin imports as a missing property — the CSV contract
    has no distinct spelling for []; post-migration Cypher should use
    `coalesce(r.sources, [])` where the distinction matters."""
    return F.when(F.col(col).isNull(), F.lit(None)).otherwise(
        F.array_join(F.transform(F.col(col),
                                 lambda x: x.cast("string")),
                     ARRAY_DELIM))


def _ts(col: str) -> F.Column:
    # ISO-8601 WITH zone offset (XXX renders 'Z' at UTC): date_format
    # renders wall-clock in spark.sql.session.timeZone, so the offset is
    # what keeps the instant correct when a caller's session isn't UTC —
    # neo4j `datetime` parses the offset form directly
    return F.date_format(F.col(col), "yyyy-MM-dd'T'HH:mm:ssXXX")


def _write(df: DataFrame, out_dir: str, name: str, header: str) -> int:
    """One header file (driver-side single line) + a directory of
    headerless part CSVs; returns the exported row count (one pass —
    the count rides the same job via an observe accumulator)."""
    from pyspark.sql import Observation
    obs = Observation(f"export_{name}")
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    df.write.mode("overwrite").options(**_CSV_OPTS) \
        .csv(os.path.join(out_dir, name))
    with open(os.path.join(out_dir, f"{name}.header.csv"), "w",
              encoding="utf-8") as f:
        f.write(header + "\n")
    return int(obs.get["rows"])


def export_neo4j_admin(store, out_dir: str) -> dict:
    """Export the committed nodes/documents/edges/mentions tables as a
    neo4j-admin bulk-import directory; returns per-table row counts.

    Column mapping (reference parity: the same properties
    `graphutil.py`'s MERGEs set, re-expressed as import columns):
    entities carry their dynamic `:LABEL` from the label column,
    documents get the literal Document label, edge `:TYPE` is the
    rel_type, and the accumulated per-edge source list exports as a
    `string[]`.
    """
    os.makedirs(out_dir, exist_ok=True)
    counts = {}

    nodes = store.read("nodes").select(
        F.col("entity_id"), F.col("label"), F.col("name"),
        _arr("embedding").alias("embedding"),
        F.col("start"), F.col("end"))
    counts["entities"] = _write(
        nodes, out_dir, "entities",
        "entity_id:ID(Entity),:LABEL,name,"
        "embedding:float[],start,end")

    docs = store.read("documents").select(
        F.col("doc_id"), F.col("url"), F.col("title"), F.col("path"),
        F.col("n_chunks"), _ts("created_at").alias("created_at"),
        _ts("updated_at").alias("updated_at"))
    counts["documents"] = _write(
        docs, out_dir, "documents",
        "doc_id:ID(Document),url,title,path,n_chunks:int,"
        "created_at:datetime,updated_at:datetime")

    edges = store.read("edges").select(
        F.col("src_id"), F.col("dst_id"), F.col("rel_type"),
        F.col("term"), F.col("count"),
        _arr("sources").alias("sources"),
        _arr("embedding").alias("embedding"),
        F.col("source_text_full"),
        _ts("created_at").alias("created_at"),
        _ts("updated_at").alias("updated_at"))
    counts["relates"] = _write(
        edges, out_dir, "relates",
        ":START_ID(Entity),:END_ID(Entity),:TYPE,term,count:int,"
        "sources:string[],embedding:float[],source_text_full,"
        "created_at:datetime,updated_at:datetime")

    mentions = store.read("mentions").select(
        F.col("doc_id"), F.col("entity_id"),
        F.lit("MENTIONS").alias("rel"))
    counts["mentions"] = _write(
        mentions, out_dir, "mentions",
        ":START_ID(Document),:END_ID(Entity),:TYPE")

    cmd = (
        "#!/bin/sh\n"
        "# offline bulk import of the exported KG into a fresh Neo4j\n"
        "# database (neo4j-admin ships with Neo4j; DB must not exist)\n"
        "neo4j-admin database import full \\\n"
        f"  --array-delimiter='{ARRAY_DELIM}' \\\n"
        "  --multiline-fields=true \\\n"
        "  --nodes=entities.header.csv,entities/part-.*\\.csv \\\n"
        "  --nodes=Document=documents.header.csv,documents/part-.*\\.csv \\\n"
        "  --relationships=relates.header.csv,relates/part-.*\\.csv \\\n"
        "  --relationships=mentions.header.csv,mentions/part-.*\\.csv \\\n"
        "  neo4j\n")
    sh = os.path.join(out_dir, "import.sh")
    with open(sh, "w", encoding="utf-8") as f:
        f.write(cmd)
    os.chmod(sh, 0o755)
    return counts
