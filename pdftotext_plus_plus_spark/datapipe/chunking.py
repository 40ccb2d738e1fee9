"""Training-data chunking + dedup cluster assignment.

* ``chunk_documents`` — overlapping token windows (the standard LLM
  training-corpus chunker): windows of CHUNK_TOKENS tokens at stride
  CHUNK_STRIDE.  Pure JVM array expressions; one narrow pass.
* ``dedup_clusters`` — assigns each document the minimum doc_id reachable
  within K hops of the MinHash-LSH near-dup graph (bounded min-label
  propagation).  K fixed rounds keeps it SQL-expressible and
  oracle-checkable; the 10^12-row path iterates the same join to a
  fixpoint (or uses a connected-components step), checkpointing labels
  between rounds.  The graph is the STAR-EDGE form (member <-> bucket
  hub), never the all-pairs LSH pair list: identical connected
  components at O(M) instead of O(M^2) edges per bucket — the quadratic
  pair blow-up inside degenerate boilerplate buckets is exactly the
  100 TB skew case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (MINHASH_LSH_PAIRS_SQL, MINHASH_SIG_CTES,
                    minhash_signatures)

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48
PROP_ROUNDS = 3


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import spread
    docs = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = F.split(F.trim("text"), r"\s+")
    return (docs
            .select("doc_id", toks.alias("toks"))
            .select("doc_id",
                    F.posexplode(F.expr(
                        f"transform(sequence(1, greatest(1, size(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}), {CHUNK_STRIDE}),"
                        f" i -> array_join(slice(toks, i, {CHUNK_TOKENS}), ' '))"))
                    .alias("chunk_idx", "chunk_text"))
            .withColumn("n_chunk_tokens",
                        F.size(F.split("chunk_text", r"\s+"))))


CHUNK_DOCUMENTS_SQL = f"""
WITH toked AS (
  SELECT doc_id, string_split_regex(trim(text, ' '), '\\s+') AS toks
  FROM documents
), grid AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(1, len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}), {CHUNK_STRIDE})) AS i
  FROM toked
)
SELECT doc_id,
       CAST((i - 1) / {CHUNK_STRIDE} AS INT) AS chunk_idx,
       array_to_string(toks[i:i + {CHUNK_TOKENS - 1}], ' ') AS chunk_text,
       len(toks[i:i + {CHUNK_TOKENS - 1}]) AS n_chunk_tokens
FROM grid
"""


def _undirected_edges(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Undirected edges incl. self-loops from an explicit pair list —
    the generic graph builder :func:`propagate_to_fixpoint` tests run
    on; the production cluster path builds :func:`_star_edges` from the
    signature table instead and never materializes pairs."""
    return (pairs.selectExpr("id_a AS src", "id_b AS dst")
            .union(pairs.selectExpr("id_b AS src", "id_a AS dst"))
            .union(docs.selectExpr("doc_id AS src", "doc_id AS dst")))


def _star_edges(docs: DataFrame, sig: DataFrame) -> DataFrame:
    """Undirected near-dup edges: ONE star per (band, minhash) bucket.

    The all-pairs LSH edge list (every pair of docs sharing a bucket)
    is O(M^2) edges for an M-member bucket — post-dedup boilerplate
    buckets are exactly the skew case that makes this the one
    quadratic exposure at 100 TB.  Star edges connect every bucket
    member to the bucket's HUB (its minimum doc_id) instead: any two
    members of a bucket are 2-hop connected through the hub, so the
    connected components — and therefore every fixpoint cluster label
    — are IDENTICAL to the all-pairs graph's, at O(M) edges per bucket
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    use the same star contraction).  Built straight from the signature
    table: one (band, minhash) hash agg for the hubs, one join back —
    the pair self-join never runs.  Self-loops keep isolated docs in
    the label frame."""
    hubs = sig.groupBy("band", "minhash").agg(F.min("doc_id").alias("hub"))
    star = (sig.join(hubs, ["band", "minhash"])
            .filter(F.col("doc_id") != F.col("hub"))
            .select(F.col("doc_id").alias("src"), F.col("hub").alias("dst"))
            .distinct())
    return (star
            .union(star.selectExpr("dst AS src", "src AS dst"))
            .union(docs.selectExpr("doc_id AS src", "doc_id AS dst")))


def _propagate_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label propagation step over the undirected edge list."""
    return (edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src").agg(F.min("label").alias("label"))
            .select(F.col("src").alias("doc_id"), "label"))


def _double_labels(labels: DataFrame) -> DataFrame:
    """Pointer doubling: l(u) <- min(l(u), l(l(u))).

    The label IS a doc id, so one self-join dereferences it; taking the min
    keeps the update monotone (labels only ever decrease toward the
    component minimum).  This is the Shiloach–Vishkin–style shortcut that
    the large-star operation of the alternating algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") performs on the edge
    set: it halves the pointer-path length every round."""
    deref = labels.selectExpr("doc_id AS ref_id", "label AS ref_label")
    return (labels.join(deref, labels.label == deref.ref_id, "left")
            .select(F.col("doc_id"),
                    F.least(F.col("label"), F.col("ref_label"))
                    .alias("label")))


def propagate_to_fixpoint(edges: DataFrame, labels: DataFrame,
                          max_rounds: int = 50,
                          return_rounds: bool = False):
    """Min-label propagation + pointer doubling, iterated to a fixpoint.

    Plain propagation needs diameter(graph) rounds — a 10^12-row graph
    with a long near-dup chain would iterate unboundedly.  Interleaving a
    pointer-doubling step (see :func:`_double_labels`) after each
    propagation halves the remaining path length per round, so convergence
    is O(log diameter) — the round-count bound the large-star/small-star
    alternating algorithm provides, expressed as two joins per round.

    Each round is localCheckpoint()ed: the labels materialize and the plan
    lineage truncates, so the iteration count cannot blow up the DAG at
    scale.  ``max_rounds`` is a safety bound only."""
    labels = labels.localCheckpoint()
    rounds = 0
    for _ in range(max_rounds):
        new_labels = _double_labels(
            _propagate_round(edges, labels)).localCheckpoint()
        rounds += 1
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    if return_rounds:
        return labels, rounds
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster label per doc: bounded min-label propagation over
    the star-edge MinHash-LSH bucket graph.

    A star round covers half a pair-hop (member -> hub -> member), so
    the bounded variant runs 2*PROP_ROUNDS star rounds — at least the
    reach of PROP_ROUNDS rounds over the all-pairs graph (measured at
    sf0.01: strictly closer to the fixpoint labels than the pair-graph
    variant ever was), at O(M) instead of O(M^2) edges per bucket."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    edges = _star_edges(docs, minhash_signatures(spark, sf_dir))
    labels = docs.select(F.col("doc_id"), F.col("doc_id").alias("label"))
    for _ in range(2 * PROP_ROUNDS):
        labels = _propagate_round(edges, labels)
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def dedup_clusters_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path: the same propagation iterated to a FIXPOINT (chains
    longer than PROP_ROUNDS hops under-merge in the bounded variant), with
    per-round checkpointing.  The oracle deliberately stays the all-pairs
    brute-force graph: star edges produce identical components, and the
    independent construction is what PROVES it."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    edges = _star_edges(docs, minhash_signatures(spark, sf_dir)).persist()
    labels = docs.select(F.col("doc_id"), F.col("doc_id").alias("label"))
    out = propagate_to_fixpoint(edges, labels)
    return out.select("doc_id", F.col("label").alias("cluster_id"))


DEDUP_CLUSTERS_FIXPOINT_SQL = f"""
WITH RECURSIVE pairs AS ({MINHASH_LSH_PAIRS_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs
  UNION ALL SELECT doc_id AS src, doc_id AS dst FROM documents
),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id AS label FROM documents
  UNION
  SELECT e.src AS doc_id, r.label
  FROM edges e JOIN reach r ON e.dst = r.doc_id
)
SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id
"""


# bounded-round labels depend on the GRAPH round for round, so this
# oracle mirrors the star-edge construction exactly (the fixpoint
# oracles below keep the independent all-pairs definition instead —
# components are provably identical, and only fixpoint labels are
# graph-shape-independent)
DEDUP_CLUSTERS_SQL = f"""
WITH {MINHASH_SIG_CTES},
hubs AS (
  SELECT band, minhash, min(doc_id) AS hub FROM sig GROUP BY band, minhash
),
star AS (
  SELECT DISTINCT s.doc_id AS src, h.hub AS dst
  FROM sig s JOIN hubs h ON h.band = s.band AND h.minhash = s.minhash
  WHERE s.doc_id <> h.hub
),
edges AS (
  SELECT src, dst FROM star
  UNION ALL SELECT dst AS src, src AS dst FROM star
  UNION ALL SELECT doc_id AS src, doc_id AS dst FROM documents
),
l0 AS (SELECT doc_id, doc_id AS label FROM documents),
{chr(10).join(
    f"l{i} AS (SELECT e.src AS doc_id, min(l.label) AS label"
    f" FROM edges e JOIN l{i - 1} l ON e.dst = l.doc_id GROUP BY e.src),"
    for i in range(1, 2 * PROP_ROUNDS))}
l{2 * PROP_ROUNDS} AS (SELECT e.src AS doc_id, min(l.label) AS label
       FROM edges e JOIN l{2 * PROP_ROUNDS - 1} l ON e.dst = l.doc_id
       GROUP BY e.src)
SELECT doc_id, label AS cluster_id FROM l{2 * PROP_ROUNDS}
"""


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the dedup pipeline: per-document keep/drop decision.

    MinHash-LSH pairs -> fixpoint connected components -> keep exactly
    one representative per near-dup cluster.  The component label IS the
    minimum doc_id of the component (min-label propagation invariant), so
    ``keep = (doc_id == cluster_id)`` — no extra ranking pass; cluster
    sizes come from one k-row count agg joined back N:1.  This is the
    frame a 100 TB ingest semi-joins against before training."""
    labels = dedup_clusters_fixpoint(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size",
                    (F.col("doc_id") == F.col("cluster_id"))
                    .cast("int").alias("keep")))


DEDUP_KEEP_LIST_SQL = f"""
WITH RECURSIVE pairs AS ({MINHASH_LSH_PAIRS_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs
  UNION ALL SELECT doc_id AS src, doc_id AS dst FROM documents
),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id AS label FROM documents
  UNION
  SELECT e.src AS doc_id, r.label
  FROM edges e JOIN reach r ON e.dst = r.doc_id
),
labels AS (
  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id
),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size,
       CASE WHEN l.doc_id = l.cluster_id THEN 1 ELSE 0 END AS keep
FROM labels l JOIN sizes s ON s.cluster_id = l.cluster_id
"""


# ---------------------------------------------------------------------------
# representative selection — keep the BEST member of each near-dup cluster
# ---------------------------------------------------------------------------

# Production dedup does not keep the lowest doc_id — it keeps the
# highest-QUALITY member of each near-duplicate cluster (RefinedWeb,
# FineWeb both select representatives by quality signals).  Composed
# from dedup_clusters_fixpoint (the pointer-doubling components) and
# textstats.quality_classifier's integer logit; ties break to the
# smallest doc_id so the verdict is total and engine-exact.


def dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cluster assignment + the quality-argmax
    representative verdict.

    Plan shape at 100 TB: the fixpoint component plan (O(log d)
    pointer-doubling rounds over star edges) + the classifier's one
    token hash-agg, then ONE per-cluster max agg and ONE broadcast-able
    join back (cluster dim: one row per cluster).  The argmax is
    max(best_logit) + a min(doc_id) tie-break — never a per-cluster
    sort of the members.
    """
    from . import textstats as _textstats
    clusters = dedup_clusters_fixpoint(spark, sf_dir)
    qual = _textstats.quality_classifier(spark, sf_dir) \
        .select("doc_id", "logit")
    # j feeds three consumers (best, rep, the final select) — one narrow
    # (doc_id, cluster_id, logit) row per doc, materialized once so the
    # classifier's token agg does not run three times (r9)
    j = clusters.join(qual, "doc_id").localCheckpoint()
    best = (j.groupBy("cluster_id")
            .agg(F.count("*").alias("cluster_size"),
                 F.max("logit").alias("best_logit")))
    rep = (j.join(best, "cluster_id")
           .filter(F.col("logit") == F.col("best_logit"))
           .groupBy("cluster_id")
           .agg(F.min("doc_id").alias("rep_doc_id")))
    return (j.join(best, "cluster_id").join(rep, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size", "logit",
                    "rep_doc_id",
                    (F.col("doc_id") == F.col("rep_doc_id")).cast("int")
                    .alias("is_representative")))


def _dedup_representatives_sql() -> str:
    from . import textstats as _textstats
    return f"""
WITH RECURSIVE pairs AS ({MINHASH_LSH_PAIRS_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs
  UNION ALL SELECT doc_id AS src, doc_id AS dst FROM documents
),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id AS label FROM documents
  UNION
  SELECT e.src AS doc_id, r.label
  FROM edges e JOIN reach r ON e.dst = r.doc_id
),
labels AS (
  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id
),
qual AS ({_textstats.QUALITY_CLASSIFIER_SQL}),
j AS (
  SELECT l.doc_id, l.cluster_id, q.logit
  FROM labels l JOIN qual q ON q.doc_id = l.doc_id
),
best AS (
  SELECT cluster_id, count(*) AS cluster_size,
         max(logit) AS best_logit
  FROM j GROUP BY cluster_id
),
rep AS (
  SELECT j.cluster_id, min(j.doc_id) AS rep_doc_id
  FROM j JOIN best b ON b.cluster_id = j.cluster_id
                    AND j.logit = b.best_logit
  GROUP BY j.cluster_id
)
SELECT j.doc_id, j.cluster_id, b.cluster_size, j.logit, r.rep_doc_id,
       CASE WHEN j.doc_id = r.rep_doc_id THEN 1 ELSE 0 END
         AS is_representative
FROM j
JOIN best b ON b.cluster_id = j.cluster_id
JOIN rep r ON r.cluster_id = j.cluster_id
"""


DEDUP_REPRESENTATIVES_SQL = _dedup_representatives_sql()
