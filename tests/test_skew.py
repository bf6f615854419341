"""Skew handling: the generator plants hot conversations; salted
repartitioning spreads them without changing content (north rule:
'salted repartitioning plus AQE skew-split'; SURVEY.md §7.3 step 5)."""

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.plans.skew import salted_repartition, skew_report
from e_commerce_lakehouse_spark.synth import transcripts_df
from tests.conftest import assert_same_rows


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.withColumn("p", F.spark_partition_id()).groupBy("p").agg(
            F.count("*").alias("n")
        ).collect()
    ]


def test_generator_plants_hot_conversation(spark, tiny_df):
    rep = skew_report(tiny_df, "conv_id", top_n=1)
    assert rep["top_keys"][0]["share"] > 0.05  # one conv holds >5% of turns


def test_salted_repartition_balances_hot_key(spark, tiny_df):
    n_parts = 8
    plain = tiny_df.repartition(n_parts, F.col("conv_id"))
    salted = salted_repartition(tiny_df, "conv_id", n_parts, salt_buckets=16)
    max_plain = max(_partition_sizes(plain))
    max_salted = max(_partition_sizes(salted))
    total = tiny_df.count()
    # hot conv forces one oversized partition without salting
    assert max_salted < max_plain
    assert max_salted < total / n_parts * 1.6
    # content unchanged
    assert_same_rows(tiny_df, salted)


def test_aqe_and_skew_confs_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
