package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
