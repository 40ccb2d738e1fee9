"""Scale-property regression tests: plan shape, pruning, skew spreading.

These pin the properties that make the job viable at 100 TB — if a change
reintroduces a scan of all columns, an extra shuffle, or lets jumbo
documents pile into one task, these fail.
"""

import pytest
from pyspark.sql import functions as F

from pdftotext_plus_plus_spark import engine, fixtures


def test_plan_prunes_columns_and_has_single_exchange(spark, pages_df, tmp_path):
    path = str(tmp_path / "pages_wide")
    pages_df.write.parquet(path)
    pages = spark.read.parquet(path)
    out = engine.extract_pages(pages, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # column pruning reaches the scan: only url + html are read
    assert "ReadSchema: struct<url:string,html:binary>" in plan
    # exactly one exchange (the salting repartition), no hidden shuffles
    assert plan.count("Exchange") == 1
    assert "MapInArrow" in plan


def test_salting_spreads_jumbo_documents(spark):
    """With size-bucket salting, the jumbo tail must not serialize into one
    task: no partition may hold more than half of all jumbo kernel time."""
    from pyspark.sql import types as T

    rows = fixtures.build_corpus(64, jumbo_every=4)  # 25% jumbos
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("family", T.StringType()),
    ])
    df = spark.createDataFrame(
        [(r["url"], r["html"], r["family"]) for r in rows], schema)
    out = engine.extract_pages(df, num_partitions=8)
    jumbo = (out.filter(F.col("url").contains("/jumbo/"))
             .groupBy("part_id").agg(F.sum("extract_ms").alias("ms"))
             .collect())
    assert len(jumbo) >= 3  # jumbos spread over several tasks
    total = sum(r["ms"] for r in jumbo)
    assert max(r["ms"] for r in jumbo) < 0.6 * total


def test_broadcast_in_ann_plan(spark):
    """The ANN query must broadcast the small query side, not sort-merge."""
    from pdftotext_plus_plus_spark.datapipe import similarity

    df = similarity.ann_bruteforce_topk(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
