package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftext.ColumnBridge

/** Whole-operator extension tier (SURVEY.md §2.2 ladder (c)): a
  * custom LogicalPlan + SparkStrategy + SparkPlan for top-k-per-group,
  * registered through SparkSessionExtensions.
  *
  * Why a physical operator: the declarative forms — window
  * `row_number() ≤ k` (q46/q80) or LATERAL LIMIT (q66) — shuffle and
  * sort EVERY row of every group. This operator plans two phases like
  * partial aggregation: a map-side pass prunes each partition to ≤ k
  * rows per group with a bounded heap (O(n log k), no sort), so the
  * shuffle carries at most k·groups·partitions rows instead of the
  * corpus; the reduce-side pass (EnsureRequirements inserts the
  * exchange to satisfy its ClusteredDistribution) merges to the exact
  * global top-k. At 100 TB with k=5 the shuffle shrinks by ~n/(5·g) —
  * the difference between a re-shuffle of the dataset and a metadata-
  * sized exchange.
  */
case class TopKPerGroup(
    groupCols: Seq[Attribute],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(groupCols.nonEmpty && k > 0)
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per group. `partial=true` runs map-side on
  * whatever distribution the child has (a superset of the answer);
  * `partial=false` demands clustering on the group key and is exact.
  *
  * Memory guard (`spark.graft.topKPerGroup.maxRetainedBytesPerTask`,
  * default 256 MB of retained UnsafeRow bytes per task): the partial
  * phase FLUSHES its heaps downstream and restarts accumulation when
  * the cap is hit — the union of chunk-wise top-k is still a superset
  * of the per-group answer, so correctness is unchanged and map-side
  * memory is bounded for ANY group cardinality. The final phase must
  * see a whole group at once, so exceeding the cap there fails loudly
  * with the remediation spelled out (more shuffle partitions, or the
  * window row_number form, which spills via external sort) instead of
  * dying on an executor OOM.
  */
case class TopKPerGroupExec(
    groupCols: Seq[Attribute],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupCols) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val maxRetained = session.sessionState.conf.getConfString(
      TopKPerGroupExec.MaxRetainedKey, (256L << 20).toString).toLong
    val isPartial = partial
    val kk = k
    child.execute().mapPartitions { iter =>
      val toUnsafe = UnsafeProjection.create(output, output)
      val groupProj = UnsafeProjection.create(groupCols, output)
      // ord.compare(a, b) < 0 ⇔ a sorts before b (a is "better")
      val ord = GenerateOrdering.generate(ordering, output)
      // min-heap on "badness": head = worst row currently kept
      val heapCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      import scala.jdk.CollectionConverters._
      new Iterator[InternalRow] {
        private val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        private var retained = 0L
        private var out: Iterator[InternalRow] = Iterator.empty
        /** Accumulate until the cap or input exhaustion, then expose
          * the heap contents as `out` (a flush in the partial phase,
          * the finished answer otherwise).
          */
        private def refill(): Unit = {
          heaps.clear(); retained = 0L
          while (iter.hasNext && (retained <= maxRetained || !isPartial)) {
            val row = toUnsafe(iter.next())
            val key = groupProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, heapCmp)
              val keyCopy = key.copy()
              heaps.put(keyCopy, heap)
              retained += keyCopy.getSizeInBytes
            }
            if (heap.size < kk) {
              heap.add(row.copy()); retained += row.getSizeInBytes
            } else if (ord.compare(row, heap.peek()) < 0) {
              retained -= heap.poll().getSizeInBytes
              heap.add(row.copy()); retained += row.getSizeInBytes
            }
            if (!isPartial && retained > maxRetained)
              throw new IllegalStateException(
                s"TopKPerGroup final phase exceeded ${TopKPerGroupExec.MaxRetainedKey}" +
                  s"=$maxRetained bytes (k=$kk, ${heaps.size} groups in this task). " +
                  "Raise the cap, raise spark.sql.shuffle.partitions to spread " +
                  "groups, or use the window row_number form, which spills.")
          }
          out = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
        }
        override def hasNext: Boolean = {
          while (!out.hasNext && iter.hasNext) refill()
          out.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Retained-bytes cap per task (see TopKPerGroupExec scaladoc). */
  val MaxRetainedKey = "spark.graft.topKPerGroup.maxRetainedBytesPerTask"

  /** True iff the type contains float/double ANYWHERE — top-level or
    * nested in struct/array/map (DataType.existsRecursively is
    * private[spark], so the walk is spelled out; same coverage as
    * Catalyst's NormalizeFloatingNumbers.needNormalize).
    */
  def containsFloat(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | FloatType    => true
      case ArrayType(et, _)          => containsFloat(et)
      case MapType(kt, vt, _)        => containsFloat(kt) || containsFloat(vt)
      case StructType(fields)        => fields.exists(f => containsFloat(f.dataType))
      case udt: UserDefinedType[_]   => containsFloat(udt.sqlType)
      case _                         => false
    }
  }
}

/** User-facing constructor (names → resolved attributes against the
  * frame's analyzed plan; all order columns descending — pass enough
  * of them for a total order, ties at the k boundary are otherwise
  * planner-dependent).
  */
object TopKPerGroup {
  def topK(df: DataFrame, groupCols: Seq[String], orderDescCols: Seq[String],
      k: Int): DataFrame = {
    // the strategy ships via GraftExtensions; for sessions built
    // without extensions, the public experimental hook registers it
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    // group keys CONTAINING float/double anywhere (top-level or nested
    // in struct/array/map) are rejected: the exec groups by raw row
    // bytes and Catalyst's NormalizeFloatingNumbers rule does not
    // cover custom nodes, so -0.0 vs 0.0 (and NaN payloads) would
    // split one logical group where the window form would not
    groupCols.foreach { c =>
      val dt = analyzed.output.find(_.name == c).map(_.dataType)
      if (dt.exists(TopKPerGroupExec.containsFloat))
        throw new IllegalArgumentException(
          s"TopKPerGroup: group column $c contains floating-point data " +
            "(un-normalized -0.0/NaN byte patterns would split groups); " +
            "cast to a decimal/string key or use the window form")
    }
    def resolve(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(",")}"))
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(resolve),
        orderDescCols.map(c => SortOrder(resolve(c),
          org.apache.spark.sql.catalyst.expressions.Descending)),
        k, analyzed))
  }
}
