package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One reader per fixture table (schemas: /root/repo/FIXTURES.md).
  * Parquet carries the schema; we read as-is and never infer.
  */
object T {
  def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = read(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
