package graft.observe

import java.util.concurrent.ConcurrentHashMap

/** Tracing facade (U7's second half) — the engine analog of the
  * reference's pluggable tracer (`lib/deimos/tracing/provider.rb`:
  * start / finish / set_error / active_span / set_tag / get_tag, with
  * datadog and mock implementations). Spans wrap driver-side units of
  * work (a batch consume, an outbox sweep); executor-side work is
  * already attributed by Spark's own event timeline, which is why the
  * Spark-native provider maps spans onto job groups/descriptions — the
  * span then shows up against every Spark job it spawned in the UI and
  * event logs, no agent required.
  */
final class Span(val name: String, val resource: String,
    val startedAtNanos: Long) {
  private val tags = new ConcurrentHashMap[String, String]()
  @volatile var error: Option[Throwable] = None
  @volatile var finishedAtNanos: Long = -1L
  def setTag(tag: String, value: String): Unit = tags.put(tag, value)
  def getTag(tag: String): Option[String] = Option(tags.get(tag))
  def durationNanos: Long =
    if (finishedAtNanos < 0) -1L else finishedAtNanos - startedAtNanos
}

trait Tracing extends Serializable {
  /** Start a span and make it the active span (reference `start`). */
  def start(spanName: String, resource: String = ""): Span
  /** Finish the span (reference `finish`). */
  def finish(span: Span): Unit
  /** Record an error on the span (reference `set_error`). */
  def setError(span: Span, e: Throwable): Unit =
    span.error = Some(e)
  /** The currently active span, if any (reference `active_span`). */
  def activeSpan: Option[Span]
  /** Tag the given span, or the active one (reference `set_tag`). */
  def setTag(tag: String, value: String, span: Option[Span] = None): Unit =
    span.orElse(activeSpan).foreach(_.setTag(tag, value))
  /** Read a tag off the active span (reference `get_tag`). */
  def getTag(tag: String): Option[String] =
    activeSpan.flatMap(_.getTag(tag))

  /** Span-scoped execution: finish always runs, failures are recorded
    * on the span before propagating — the reference's `_with_span` +
    * `_error` shape (`consumer.rb:27-35,46-54`) as one combinator. */
  def withSpan[T](spanName: String, resource: String = "")(body: => T): T = {
    val span = start(spanName, resource)
    try body
    catch {
      case e: Throwable => setError(span, e); throw e
    } finally finish(span)
  }
}

object Tracing {
  val noop: Tracing = new Tracing {
    def start(spanName: String, resource: String): Span =
      new Span(spanName, resource, System.nanoTime())
    def finish(span: Span): Unit = ()
    def activeSpan: Option[Span] = None
  }

  /** In-memory recorder (reference `Tracing::Mock`): finished spans are
    * inspectable; a per-thread span STACK makes nesting compose —
    * finishing an inner span restores its parent as the active span,
    * so withSpan-inside-withSpan tags keep landing on the right span. */
  class InMemory extends Tracing {
    val finished = new java.util.concurrent.ConcurrentLinkedQueue[Span]()
    private val stack: ThreadLocal[java.util.ArrayDeque[Span]] =
      ThreadLocal.withInitial(() => new java.util.ArrayDeque[Span]())
    def start(spanName: String, resource: String): Span = {
      val s = new Span(spanName, resource, System.nanoTime())
      stack.get().push(s)
      s
    }
    def finish(span: Span): Unit = {
      span.finishedAtNanos = System.nanoTime()
      finished.add(span)
      stack.get().remove(span) // tolerate out-of-order finishes
    }
    def activeSpan: Option[Span] = Option(stack.get().peek())
    def finishedSpans: Seq[Span] = {
      val out = scala.collection.mutable.ArrayBuffer[Span]()
      finished.forEach(s => out += s)
      out.toSeq
    }
  }

  /** Spark-native provider: a span sets the job group + description for
    * the driver thread, so every Spark job launched inside the span is
    * attributed to it in the UI, the history server and event logs —
    * the closest native analog of an APM trace for a Spark engine.
    * Cancellation comes free: `sc.cancelJobGroup(span.name)` kills all
    * of a span's jobs. Nested spans restore the PARENT's job group on
    * finish (not a bare clear), so an outer span's remaining jobs stay
    * attributed after an inner span ends. */
  class SparkUi(spark: org.apache.spark.sql.SparkSession) extends Tracing {
    private val stack: ThreadLocal[java.util.ArrayDeque[Span]] =
      ThreadLocal.withInitial(() => new java.util.ArrayDeque[Span]())
    private def attribute(s: Span): Unit =
      spark.sparkContext.setJobGroup(s.name,
        if (s.resource.isEmpty) s.name else s"${s.name} [${s.resource}]")
    def start(spanName: String, resource: String): Span = {
      val s = new Span(spanName, resource, System.nanoTime())
      stack.get().push(s)
      attribute(s)
      s
    }
    def finish(span: Span): Unit = {
      span.finishedAtNanos = System.nanoTime()
      val st = stack.get()
      st.remove(span)
      Option(st.peek()) match {
        case Some(parent) => attribute(parent)
        case None => spark.sparkContext.clearJobGroup()
      }
    }
    def activeSpan: Option[Span] = Option(stack.get().peek())
  }
}
