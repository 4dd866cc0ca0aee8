package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Environment-drift tripwire: the driver regenerates `/root/testdata`
  * between rounds and has already changed a column's physical type under
  * unchanged code (round 9: `events.ts` TIMESTAMP(NANOS) → timestamp[us],
  * which killed 17 queries at analysis time with no test signal). This
  * spec pins every column the graded queries depend on to its TOLERATED
  * type set — exact for columns consumed as-is, a set for columns behind
  * an adaptive reader — so the next drift fails `sbt test` with a message
  * naming the table, the column, and what changed, instead of surfacing
  * as a wall of downstream analysis errors.
  */
class SchemaGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // column -> tolerated Spark types. Integer keys tolerate both widths
  // (query code casts where width matters); doubles, strings and the
  // float32 embedding vector are consumed exactly.
  private val ints: Set[DataType] = Set(IntegerType, LongType)
  private val tsAdaptive: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)
  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> ints, "r_name" -> Set(StringType)),
    "nation" -> Map("n_nationkey" -> ints, "n_name" -> Set(StringType),
      "n_regionkey" -> ints),
    "customer" -> Map("c_custkey" -> ints, "c_name" -> Set(StringType),
      "c_nationkey" -> ints, "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map("s_suppkey" -> ints, "s_name" -> Set(StringType),
      "s_nationkey" -> ints, "s_acctbal" -> Set(DoubleType)),
    "part" -> Map("p_partkey" -> ints, "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> ints, "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map("o_orderkey" -> ints, "o_custkey" -> ints,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map("l_orderkey" -> ints, "l_partkey" -> ints,
      "l_suppkey" -> ints, "l_linenumber" -> ints,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> ts),
    // ts is the one column with a proven drift history: the adaptive
    // reader (Events.withTimeColumns) tolerates raw-nanos long AND both
    // timestamp flavors; anything else needs a new reader branch.
    "events" -> Map("event_id" -> ints, "ts" -> tsAdaptive,
      "user_id" -> ints, "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> ints, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> ints),
    "embeddings" -> Map("vec_id" -> ints,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, true),
        ArrayType(FloatType, false)),
      "label" -> ints))

  test("every graded-table column still carries a tolerated physical type") {
    val drifts = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = Tables(spark, dir, table).schema
      val missing = cols.keySet -- schema.fieldNames.toSet
      val bad = cols.toSeq.sortBy(_._1).collect {
        case (name, ok) if schema.fieldNames.contains(name) &&
            !ok.contains(schema(name).dataType) =>
          s"$table.$name: got ${schema(name).dataType}, tolerated ${ok.mkString("/")}"
      }
      missing.toSeq.map(m => s"$table.$m: column MISSING") ++ bad
    }
    assert(drifts.isEmpty,
      "TESTDATA SCHEMA DRIFT (driver regenerated parquet with new types?):\n  "
        + drifts.mkString("\n  "))
  }

  test("the events reader accepts the current drop and derives canonical time columns") {
    val ev = Events.events(spark, dir)
    assert(ev.schema("ts_utc").dataType == TimestampType)
    assert(ev.schema("ts_us").dataType == LongType)
    assert(ev.schema("ts_sec").dataType == LongType)
    val row = ev.selectExpr("min(ts_us)", "min(ts_sec)").head()
    // 2024+ epoch values in both units, so unit arithmetic is not off
    assert(row.getLong(0) > 1500000000L * 1000000L, row.toString)
    assert(row.getLong(1) > 1500000000L, row.toString)
  }
}
