package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key)` against a pre-built [[BloomFilter]] — the
  * runtime-filter primitive behind [[graft.operators.ScaleOps.bloomSemiJoin]].
  *
  * The filter is built once on the driver from the join's small side
  * (`df.stat.bloomFilter`, itself a distributed aggregate) and travels to
  * executors as a codegen reference object, NOT as a per-row join input: a
  * 1M-key / 1% fpp filter is ~1.2 MB — two orders of magnitude below the
  * hashed-relation broadcast of the same keys — so the fact side of a
  * semi-join can be cut to `matches + fpp·|fact|` rows BEFORE its shuffle.
  * No false negatives, so a residual exact join restores exact semantics;
  * false positives only cost those rows riding the shuffle.
  *
  * Mirrors Spark's own `spark.sql.optimizer.runtime.bloomFilter` injection
  * (which only fires on shuffle-join stages the optimizer can see through);
  * this is the explicit, caller-controlled version for operators that build
  * the filter from a frame the optimizer can't correlate (e.g. a
  * decontamination reference corpus prepared in a previous job).
  *
  * Keys are `long` (`mightContainLong` — no per-row boxing or UTF8String
  * hashing detour); callers hash wider keys to 64 bits first
  * ([[Hashing.stableHash]]).
  */
final case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // One deserialization per task (the transient lazy re-runs after ship),
  // probes after that are two hash mults + bitset reads.
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // BloomFilterImpl is Serializable, so the DESERIALIZED filter rides the
    // generated class's reference array — executors never re-parse the bytes.
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(key: Column, bloom: BloomFilter): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    Bridge.column(BloomMightContain(Bridge.expression(key), bytes))
  }
}
