package graft.functions

import org.apache.spark.broadcast.Broadcast
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
  * (`df.stat.bloomFilter`, itself a distributed aggregate) and travels as a
  * TORRENT BROADCAST: the expression serializes with only the broadcast
  * handle (~bytes), executors fetch the filter bitset once each, and every
  * task on the executor probes the same deserialized instance. A 1M-key /
  * 1% fpp filter is ~1.2 MB — two orders of magnitude below the
  * hashed-relation broadcast of the same keys — and even a 1B-key / 1.2 GB
  * filter ships once per executor, never per task, which is what makes the
  * pattern survive a 1000-executor fact scan. No false negatives, so a
  * residual exact join restores exact semantics; false positives only cost
  * those rows riding the shuffle.
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
final case class BloomMightContain(child: Expression,
    bloomBcast: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // One broadcast fetch per executor (torrent); probes after that are two
  // hash mults + bitset reads against the shared instance.
  @transient private lazy val bloom: BloomFilter = bloomBcast.value

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the reference array carries the HANDLE; the filter itself is resolved
    // from the executor-local broadcast cache once per generated-class
    // instance (mutable state init), not per row and not per task ship
    val bcastRef = ctx.addReferenceObj("bloomBcast", bloomBcast,
      classOf[Broadcast[_]].getName)
    val bloomCls = classOf[BloomFilter].getName
    val bloomVar = ctx.addMutableState(bloomCls, "bloomFilter",
      v => s"$v = ($bloomCls) $bcastRef.value();")
    defineCodeGen(ctx, ev, c => s"$bloomVar.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(key: Column, bcast: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), bcast))
}
