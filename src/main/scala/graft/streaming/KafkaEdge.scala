package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka edge CONTRACT, as code instead of a comment.
  *
  * Every pipeline in [[Runner]]/[[Pipelines]] consumes a `value: string`
  * column (the Kafka wire shape) and the router emits `(topic, value)` —
  * so production wiring is exactly: Kafka source → [[lines]] → pipeline →
  * [[sinkRows]] → Kafka sink (reference `util/MyKafkaUtil.scala:40-64`
  * consumes the same ConsumerRecord value strings; `util/MyKafkaSink
  * .scala:22-59` produces per-record topics, which the Spark sink
  * expresses natively as a `topic` COLUMN). This object pins that swap
  * claim executable three ways:
  *
  *   1. [[sourceSchema]] is the Spark Kafka source's fixed output schema
  *      (Structured Streaming Kafka integration guide; the source always
  *      emits these seven columns — a subscriber cannot get a different
  *      shape). [[lines]] REFUSES any relation that isn't Kafka-shaped,
  *      so the adapter cannot silently accept a wrong edge.
  *   2. [[sourceOptions]]/[[sinkOptions]] are the exact option maps the
  *      production builders apply — subscribe/startingOffsets on the
  *      source (S1/S2), bootstrap + checkpoint on the sink — testable
  *      as data, applied verbatim by [[source]]/[[sink]].
  *   3. KafkaContractSpec drives the REAL pipelines over a Kafka-shaped
  *      MemoryStream end-to-end (source-adapter → router → sink-adapter)
  *      and asserts parity with the file edge, so "swap the format" is
  *      demonstrated on the only part this broker-less environment can
  *      execute: everything between the two format strings.
  *
  * [[source]]/[[sink]] themselves need the spark-sql-kafka connector jar
  * on the classpath (absent here — no broker either); the spec exercises
  * them adaptively: with the connector they must produce/accept exactly
  * [[sourceSchema]]/[[sinkColumns]]; without it they must fail at
  * DataSource LOOKUP naming `kafka` — proving the format string and
  * options reach Spark's resolution, not a typo'd stub.
  */
object KafkaEdge {

  /** The Kafka SOURCE's fixed schema — what `readStream.format("kafka")
    * .load()` always returns. */
  val sourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Columns the Kafka SINK consumes: `value` is required; a `topic`
    * column routes per-row when no `topic` option is set (the dynamic
    * fan-out the router needs); `key` is optional. */
  val sinkColumns: Seq[(String, DataType)] =
    Seq("topic" -> StringType, "value" -> BinaryType)

  /** S1/S2 option wiring: subscribe + explicit starting offsets.
    * `startingOffsets` accepts `latest`, `earliest`, or a per-partition
    * offset JSON (`{"t":{"0":42}}`) — the reference's seek-to-offsets
    * (`util/MyKafkaUtil.scala:52-64`) is the JSON form; offset RECOVERY
    * is the checkpoint's job (S3/S4), not an option. */
  def sourceOptions(bootstrapServers: String, topics: Seq[String],
                    startingOffsets: String = "latest"): Map[String, String] = {
    require(topics.nonEmpty, "kafka source needs at least one topic")
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets)
  }

  /** Sink option wiring: no `topic` option on purpose — the router's
    * per-row `topic` column must drive the fan-out (a static option
    * would override it and collapse every stream onto one topic). */
  def sinkOptions(bootstrapServers: String,
                  checkpoint: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "checkpointLocation" -> checkpoint)

  /** Production source builder: applies [[sourceOptions]] verbatim.
    * Needs the spark-sql-kafka connector jar (not in this sandbox). */
  def source(spark: SparkSession, bootstrapServers: String, topics: Seq[String],
             startingOffsets: String = "latest"): DataFrame =
    sourceOptions(bootstrapServers, topics, startingOffsets)
      .foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }.load()

  /** Adapter: Kafka wire rows → the `value: string` lines every
    * pipeline consumes. Refuses non-Kafka-shaped input loudly, so a
    * mis-wired edge cannot flow nulls downstream. */
  def lines(kafkaRows: DataFrame): DataFrame = {
    val have = kafkaRows.schema.fields.map(f => f.name -> f.dataType).toMap
    sourceSchema.fields.foreach { f =>
      val got = have.get(f.name)
      require(got.contains(f.dataType),
        s"not a Kafka source relation: expected column `${f.name}: " +
          s"${f.dataType.simpleString}`, got " +
          got.map(_.simpleString).getOrElse("nothing") +
          s" (kafka source schema: ${sourceSchema.simpleString})")
    }
    kafkaRows.select(col("value").cast("string").as("value"))
  }

  /** Adapter: router output `(topic, value)` → the Kafka sink's
    * required columns (value serialized to binary, per-row topic kept
    * as the routing column). */
  def sinkRows(routed: DataFrame): DataFrame = {
    val have = routed.schema.fieldNames.toSet
    Seq("topic", "value").foreach(c => require(have.contains(c),
      s"router output must carry `$c` (got ${have.mkString(", ")})"))
    routed.select(col("topic").cast("string").as("topic"),
      col("value").cast("binary").as("value"))
  }

  /** Production sink builder: [[sinkRows]] + [[sinkOptions]] verbatim.
    * Needs the connector jar; `start()` is the lookup point. */
  def sink(routed: DataFrame, bootstrapServers: String,
           checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    sinkOptions(bootstrapServers, checkpoint)
      .foldLeft(sinkRows(routed).writeStream.format("kafka")) {
        case (w, (k, v)) => w.option(k, v)
      }.start()
}
