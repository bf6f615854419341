"""applyInPandasWithState operator: per-conversation running stats across
micro-batches, state carried between batches."""

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.streaming.stateful import conversation_stats_stream
from e_commerce_lakehouse_spark.synth import transcripts_df


def test_conversation_stats_stateful(spark, tmp_path):
    df = transcripts_df(spark, 600, seed=11).cache()
    pq_dir = str(tmp_path / "turns_pq")
    # two separate files → at least the data arrives in multiple splits
    df.where(F.col("turn_idx") % 2 == 0).write.parquet(pq_dir + "/b1")
    df.where(F.col("turn_idx") % 2 == 1).write.parquet(pq_dir + "/b2")

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pq_dir + "/*")
    )
    out = conversation_stats_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last update per conv must equal the batch ground truth
    got = spark.sql(
        """
        SELECT conv_id, n_turns, max_turn_idx FROM (
            SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY n_turns DESC) rn
            FROM conv_stats) WHERE rn = 1
        """
    )
    expect = df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_turn_idx")
    )
    diff = got.exceptAll(expect).count() + expect.exceptAll(got).count()
    assert diff == 0
