package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a custom
  * `TypedImperativeAggregate` — the mutable-buffer aggregate shape used
  * for sketches (HLL, quantile digests) in engines at scale.
  *
  * The buffer is the set of the k smallest hash values seen; merge is
  * union+trim, so the sketch is fully mergeable across partitions and the
  * result is independent of row order — which is what makes it
  * oracle-checkable (DuckDB reproduces the k-th smallest hash and the
  * estimator exactly; engine-specific sketches like HLL cannot be
  * compared this way, cf. q26).
  *
  * Input: pre-hashed non-negative longs (the query supplies
  * `conv(substr(md5(x),1,15),16,10)` — a uniform 60-bit hash both engines
  * can compute identically). Output struct:
  *   - `est_distinct`: exact buffer size when fewer than k distinct
  *     hashes were seen, else the KMV estimator (k-1) * 2^60 / kth_min;
  *   - `kth_hash`: the k-th smallest hash (null in the exact regime).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  private val Domain = math.pow(2.0, 60)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("est_distinct", DoubleType, nullable = false),
    StructField("kth_hash", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a BIGINT hash input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf += h
      else if (h < buf.last) { buf += h; if (buf.size > k) buf -= buf.last }
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    a ++= b
    while (a.size > k) a -= a.last
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    if (buf.size < k) {
      new GenericInternalRow(Array[Any](buf.size.toDouble, null))
    } else {
      val kth = buf.last
      val est = (k - 1).toDouble * Domain / kth.toDouble
      new GenericInternalRow(Array[Any](est, kth))
    }
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  /** Register `kmv_distinct(hash_col)` and `kmv_values(hash_col)` for
    * SQL/expr use in this session. Register-if-absent, matching
    * `WordShingles.register` — avoids the per-call "replaced a
    * previously registered function" warning.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        new org.apache.spark.sql.catalyst.FunctionIdentifier("kmv_distinct")))
      registry.createOrReplaceTempFunction("kmv_distinct",
        exprs => KmvDistinct(exprs.head), "built-in")
    if (!registry.functionExists(
        new org.apache.spark.sql.catalyst.FunctionIdentifier("kmv_values")))
      registry.createOrReplaceTempFunction("kmv_values",
        exprs => KmvValues(exprs.head), "built-in")
  }
}

/** The KMV sketch STATE itself as the aggregate result: the sorted
  * bottom-k distinct hash values. This is what makes KMV an ALGEBRA
  * rather than just an estimator — two emitted sketches union by
  * merge-and-trim (plain array ops, no re-scan of the data), and the
  * union sketch estimates |A ∪ B| exactly as a directly-built sketch
  * of A ∪ B would (bottom-k of a union IS the merge of bottom-ks), so
  * inclusion–exclusion and bottom-k Jaccard (Beyer et al., SIGMOD'07)
  * fall out downstream without touching the raw data again. Same
  * mergeable TreeSet buffer discipline as [[KmvDistinct]]; emitting
  * values instead of the estimate is the persisted-sketch shape a
  * 100 TB pipeline stores per partition/source and combines later.
  */
case class KmvValues(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_values expects a BIGINT hash input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf += h
      else if (h < buf.last) { buf += h; if (buf.size > k) buf -= buf.last }
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    a ++= b
    while (a.size > k) a -= a.last
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvValues =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvValues =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_values"
}
