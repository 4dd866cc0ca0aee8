package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the graded query surface (SparkEntry.queries).
  *
  * Oracle-parity note: the driver hash-compares every query result against
  * DuckDB executing `SparkEntry.oracleSql` on the same parquet. Double
  * summation is order-dependent, and Spark/DuckDB aggregate in different
  * orders, so every SUM/AVG over doubles is routed through exact decimal
  * arithmetic (order-independent) and only cast back to double at the end.
  * Both engines then produce bit-identical doubles.
  */
package object ops {

  /** Exact 2-decimal money/ratio cast. All monetary test columns
    * (l_extendedprice, l_discount, l_tax, l_quantity, o_totalprice,
    * c_acctbal, events.value) carry <=2 decimals, so this cast is lossless.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent SUM of a money column, returned as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact revenue term: price * (1 - discount), all in decimal space. */
  def revenueTerm(price: Column, discount: Column): Column =
    dec2(price) * (lit(1) - dec2(discount))

  /** Exact charge term: price * (1 - discount) * (1 + tax). The inner
    * product is narrowed to decimal(18,4) (lossless: scale is exactly 4,
    * values < 1e7) so the second multiply stays within decimal(38,_) in
    * both Spark and DuckDB.
    */
  def chargeTerm(price: Column, discount: Column, tax: Column): Column =
    revenueTerm(price, discount).cast(DecimalType(18, 4)) * (lit(1) + dec2(tax))

  /** Order-independent AVG as double: exact decimal sum / count. */
  def moneyAvg(c: Column): Column =
    sum(dec2(c)).cast("double") / count(lit(1))
}
