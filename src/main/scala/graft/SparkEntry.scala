package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries q1–q12 are SURVEY.md §2.8's operator-coverage inventory, each
  * expressed through the engine's operator library and hash-matched
  * against the DuckDB oracle SQL below. b* are headline analytic queries
  * (Catalyst-supplied per §2.9); x* are the [EXT] training-data-pipeline
  * operators (dedup / similarity / text / multimodal).
  *
  * Conventions shared with the oracle:
  *  - timestamps are emitted as epoch milliseconds (BIGINT) — avoids
  *    ns-vs-µs parquet timestamp unit skew between engines;
  *  - computed doubles are either exact (integer-valued sums, single
  *    int/int divisions) or money sums done in exact cents (BIGINT);
  *  - every query has a total deterministic ORDER BY;
  *  - `events` is the keyed stream stand-in: key=user_id, offset=event_id,
  *    tombstone ⇔ event_type='error' (deterministic convention).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    // resolution memoized per (session, dir, name): re-inferring the
    // parquet schema per call costs ~150-300 ms — the round-15 bench
    // tail's uniform constant (see TableCache)
    TableCache.resolve(spark, dir, name) {
      if (name == "events")
        // older testdata generations wrote events.ts as TIMESTAMP(NANOS)
        // parquet, unreadable by Spark's vectorized reader as a timestamp;
        // this conf reads that unit as nanos-since-epoch BIGINT. Set here
        // so it also holds on the driver's own smoke-check session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // the engine's event-time convention is nanos-since-epoch BIGINT
      // (exact integer arithmetic; no tz ambiguity). Newer testdata
      // generations write ts as TIMESTAMP(MICROS) — normalize at the scan
      // (session tz is UTC everywhere, matching the oracle's epoch_ns()).
      if (name == "events" &&
          df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
        df.withColumn("ts",
          expr("unix_micros(cast(ts as timestamp)) * 1000"))
      else df
    }

  /** Tombstone convention for the events stream. */
  private val tomb: Column = col("event_type") === "error"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_materialize")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- q1-q12

  private def q1(s: SparkSession, dir: String): DataFrame =
    Pipeline.schemaProject(t(s, dir, "events"),
      Seq("event_id", "user_id", "event_type", "value", "not_a_column"))
      .orderBy(col("user_id"), col("event_id"))

  private def q2(s: SparkSession, dir: String): DataFrame = {
    // fused P6 coercion: one regex walk per row yields both columns
    // (value-identical to the single-column forms — PipelineSpec pins
    // the equivalence; the oracle keeps the two-extract formulation)
    val (kInt, kDbl) = Pipeline.coerceNumericPair(col("props"))
    // spreadScan: parallelize the regex coercion walk (guide §2.5;
    // identity on a many-split corpus)
    operators.Scale.spreadScan(t(s, dir, "events"), col("event_id")).select(
      col("event_id"),
      kInt.as("k_int"),
      kDbl.as("k_dbl"),
      floor(col("value")).cast("long").as("value_floor"),
      (col("value").isNotNull && col("value") =!= 0.0).as("flag"))
      .orderBy(col("event_id"))
  }

  private def q3(s: SparkSession, dir: String): DataFrame =
    Compaction.lastWins(t(s, dir, "events"), Seq("user_id"), col("event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))

  private def q4(s: SparkSession, dir: String): DataFrame =
    Compaction.withWave(t(s, dir, "events"), Seq("user_id"), col("event_id"))
      .select(col("event_id"), col("wave"))
      .orderBy(col("event_id"))

  private def q5(s: SparkSession, dir: String): DataFrame =
    Materialize.applyEvents(t(s, dir, "events"), Seq("user_id"),
      col("event_id"), tomb)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type"), col("value"))
      .orderBy(col("user_id"))

  private val q6From = "1995-06-01 00:00:00"
  private val q6To = "1996-06-01 00:00:00"

  private def q6(s: SparkSession, dir: String): DataFrame =
    Poller.timeBasedScan(t(s, dir, "orders"),
      col("o_orderdate"), col("o_orderkey"),
      to_timestamp(lit(q6From)), lit(1000L), to_timestamp(lit(q6To)))
      .select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"))

  private def q7(s: SparkSession, dir: String): DataFrame = {
    val wAsc = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wDesc = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    t(s, dir, "events")
      .withColumn("prev_event_id", lag(col("event_id"), 1).over(wAsc))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wAsc))
      .withColumn("prev_value", lag(col("value"), 1).over(wAsc))
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") === 1 && (col("prev_event_id").isNull ||
        col("event_type") =!= col("prev_type") ||
        col("value") =!= col("prev_value")))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("prev_event_id"))
      .orderBy(col("user_id"))
  }

  private def q8(s: SparkSession, dir: String): DataFrame =
    Outbox.pendingMetrics(
      t(s, dir, "events").withColumnRenamed("event_type", "topic")
        .withColumnRenamed("ts", "created_at"))
      .select(col("topic"), col("pending_count"),
        expr("min_created_at div 1000000").as("min_ts_ms"))
      .orderBy(col("topic"))

  private def q9(s: SparkSession, dir: String): DataFrame =
    Outbox.drainBatch(
      t(s, dir, "events").withColumnRenamed("event_type", "topic"),
      topicCol = "topic", idCol = "event_id", keyCol = "user_id",
      compactAll = true, batchSize = 1000)
      .select(col("event_id"), col("topic"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
      .limit(1000)

  private def q10(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
    val (_, exploded) = Materialize.fanOut(orders, li, "o_orderkey",
      "l_orderkey", Seq("l_linenumber", "l_quantity"))
    exploded.orderBy(col("o_orderkey"), col("l_linenumber"))
  }

  private def q11(s: SparkSession, dir: String): DataFrame =
    Pipeline.autoFields(
      t(s, dir, "events").select(col("event_id"), col("ts")),
      idCol = "message_id", tsCol = "ts",
      surrogate = _ => Pipeline.deterministicSurrogate("evt",
        Seq(col("event_id"))),
      now = col("ts"))
      .select(col("event_id"), col("message_id"),
        expr("ts div 1000000").as("ts_ms"))
      .orderBy(col("event_id"))

  private def q12(s: SparkSession, dir: String): DataFrame =
    Compaction.lastWins(t(s, dir, "lineitem"),
      Seq("l_orderkey", "l_linenumber"),
      struct(col("l_suppkey"), col("l_partkey")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** P8/P9 via the proto backend (reference `proto_local.rb:12-20`):
    * full wire-format round-trip over real rows. The oracle reads the
    * plain columns, so any encode/decode divergence (varint, zigzag,
    * length-delimited, default handling) surfaces as a hash mismatch —
    * the codec itself is under test, not mirrored in the oracle. */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import graft.schema.ProtoBackend
    import graft.schema.ProtoWire._
    val msg = ProtoMessage("OrderMsg", Seq(
      ProtoField("o_orderkey", 1, PInt64),
      ProtoField("o_custkey", 2, PSInt64), // exercises zigzag
      ProtoField("o_orderstatus", 3, PString),
      ProtoField("price_cents", 4, PInt64)))
    val backend = new ProtoBackend(msg)
    // Total-order-first (the q18 shape): sort the NARROW scan columns
    // by the unique key, then run the codec chain ABOVE the sort — a
    // trailing orderBy would sample+re-execute the codec, and AQE
    // would coalesce its tiny exchange to one partition
    // (repartitionByRange with explicit numPartitions is never
    // coalesced). Same rows, same order.
    val src = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .repartitionByRange(s.sparkContext.defaultParallelism,
        col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
    src.select(backend.encodeExpr(struct(src.columns.map(col).toIndexedSeq: _*)).as("bin"))
      .select(backend.decodeExpr(col("bin")).as("p"))
      .select("p.*")
  }

  /** Registry schema-id dispatch (the reference's avro_schema_registry
    * decode semantics): one binary column carries frames from TWO
    * writer schema versions — even keys framed with writer v1 (id 1,
    * no price field), odd keys with writer v2 (id 2, adds
    * price_cents) — and a single dispatching reader resolves each
    * frame's writer by its embedded id against a reader schema whose
    * new field defaults to -1. The oracle recomputes the expected rows
    * from `orders` with a CASE on key parity, independent of the whole
    * encode→frame→dispatch→resolve chain under test. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import graft.schema.RegistryFramedBackend
    val v1Json =
      """{"type":"record","name":"OrderEvt","fields":[
        | {"name":"o_orderkey","type":"long"},
        | {"name":"o_orderstatus","type":"string"}]}""".stripMargin
    val v2Json =
      """{"type":"record","name":"OrderEvt","fields":[
        | {"name":"o_orderkey","type":"long"},
        | {"name":"o_orderstatus","type":"string"},
        | {"name":"price_cents","type":"long"}]}""".stripMargin
    val readerJson =
      """{"type":"record","name":"OrderEvt","fields":[
        | {"name":"o_orderkey","type":"long"},
        | {"name":"o_orderstatus","type":"string"},
        | {"name":"price_cents","type":"long","default":-1}]}""".stripMargin
    // The full client path (round 9): producer generations REGISTER
    // their writer schemas; the consumer, on a separate client over
    // the same registry, resolves the topic's writer ids and builds
    // the dispatching reader — the oracle-gated query now exercises
    // the registry client end-to-end, not a caller-built id map.
    // Driver-side planning only: resolved schemas are baked into the
    // codegen'd expressions, executors never see the registry.
    import graft.schema.{InMemoryRegistryTransport, SchemaRegistryClient}
    val registry = new InMemoryRegistryTransport
    val producer = new SchemaRegistryClient(registry)
    val w1 = producer.framedBackend("orders-value", v1Json)
    val w2 = producer.framedBackend("orders-value", v2Json)
    val reader = new SchemaRegistryClient(registry)
      .framedBackend("orders-value", readerJson,
        writerIds = Seq(w1.schemaId, w2.schemaId))
    // total-order-first, the q18/q13 shape: codec above the sort
    val src = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .repartitionByRange(s.sparkContext.defaultParallelism,
        col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
    src.select(
      when(col("o_orderkey") % 2 === 0,
        w1.encodeExpr(struct(col("o_orderkey"), col("o_orderstatus"))))
        .otherwise(w2.encodeExpr(struct(col("o_orderkey"),
          col("o_orderstatus"), col("price_cents"))))
        .as("bin"))
      .select(reader.decodeExpr(col("bin")).as("p"))
      .select("p.*")
  }

  /** S9/S10 CDC as a snapshot diff (`Cdc.snapshotDiff`): two synthetic
    * table versions are derived from `orders` by key-arithmetic
    * (prev = keys not divisible by 7; curr = keys not divisible by 5,
    * with prices bumped on keys divisible by 3), and the diff must
    * classify every key as added / deleted / changed. The oracle
    * recomputes the classification from the key arithmetic alone —
    * independent of the full-outer-join diff machinery under test. */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    val prev = base.filter(col("o_orderkey") % 7 =!= 0)
    val curr = base.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("price_cents",
        when(col("o_orderkey") % 3 === 0, col("price_cents") + 100)
          .otherwise(col("price_cents")))
    Cdc.snapshotDiff(prev, curr, Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** SCD2 history build over the event stream (`Cdc.scd2History`):
    * per-user effective-dated state intervals from the raw event log,
    * consecutive same-state events collapsed, open intervals carrying
    * a null eff_to. The oracle re-derives the intervals with the same
    * declarative window spec in DuckDB (the x17-sessions discipline:
    * all time arithmetic in epoch-ms so ns→ms flooring agrees). */
  private def q16(s: SparkSession, dir: String): DataFrame =
    Cdc.scd2History(
      t(s, dir, "events").withColumn("ts_ms", expr("ts div 1000000")),
      "user_id", "event_type", "ts_ms", "event_id")
      .orderBy(col("user_id"), col("version"))

  /** Proto registry per-frame writer-id dispatch (the proto mirror of
    * q14's Avro semantics; reference `proto_schema_registry.rb`): one
    * binary column carries frames from TWO proto writers — even keys
    * framed by v1 (id 11), which declares price_cents as SINT64
    * (zigzag!), odd keys by v2 (id 12), which declares it plain INT64
    * and adds o_custkey. The dispatching reader must decode each frame
    * with ITS writer's descriptor — interpreting v1's zigzag bytes
    * with the reader descriptor alone would silently corrupt every
    * even-key price — then resolve by field number, defaulting the
    * field v1 never wrote. The oracle recomputes the rows from
    * `orders` with a CASE on key parity. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import graft.schema.ProtoRegistryFramedBackend
    import graft.schema.ProtoWire._
    val v1 = ProtoMessage("OrderEvt", Seq(
      ProtoField("o_orderkey", 1, PInt64),
      ProtoField("o_orderstatus", 2, PString),
      ProtoField("price_cents", 3, PSInt64)))
    val v2 = ProtoMessage("OrderEvt", Seq(
      ProtoField("o_orderkey", 1, PInt64),
      ProtoField("o_orderstatus", 2, PString),
      ProtoField("price_cents", 3, PInt64),
      ProtoField("o_custkey", 4, PInt64)))
    val w1 = new ProtoRegistryFramedBackend(v1, schemaId = 11)
    val w2 = new ProtoRegistryFramedBackend(v2, schemaId = 12)
    val reader = new ProtoRegistryFramedBackend(v2, schemaId = 12,
      writerMessages = Map(11 -> v1, 12 -> v2))
    // total-order-first, the q18/q13 shape: codec above the sort
    val src = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"),
      col("o_custkey"))
      .repartitionByRange(s.sparkContext.defaultParallelism,
        col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
    src.select(
      when(col("o_orderkey") % 2 === 0,
        w1.encodeExpr(struct(col("o_orderkey"), col("o_orderstatus"),
          col("price_cents"))))
        .otherwise(w2.encodeExpr(struct(col("o_orderkey"),
          col("o_orderstatus"), col("price_cents"), col("o_custkey"))))
        .as("bin"))
      .select(reader.decodeExpr(col("bin")).as("p"))
      .select("p.*")
  }

  /** Dead-letter split under the oracle gate (round 9 — T6 at record
    * grain, `Pipeline.partitionDecodable`): every order row is
    * registry-framed, then frames for keys divisible by 7 are
    * truncated to the 5-byte header (magic + id, empty Avro body —
    * deterministic poison: decoding a record from zero bytes is an
    * EOF on every input). The lenient decode must quarantine exactly
    * those and decode the rest; the oracle re-derives the
    * classification from key arithmetic alone, independent of the
    * whole encode→corrupt→lenient-decode machinery under test. */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    import graft.schema.RegistryFramedBackend
    val avroJson =
      """{"type":"record","name":"OrderEvt","fields":[
        | {"name":"o_orderkey","type":"long"},
        | {"name":"o_orderstatus","type":"string"}]}""".stripMargin
    val b = new RegistryFramedBackend(avroJson, schemaId = 21)
    // Total-order-first shape (round-17): a trailing orderBy both
    // SAMPLES its child (RangePartitioner) and re-executes it, so the
    // codec chain below it would run twice; and AQE coalesces a tiny
    // final range exchange to one partition, which would serialize a
    // codec placed above a plain orderBy. repartitionByRange with an
    // EXPLICIT partition count (AQE never coalesces
    // REPARTITION_BY_NUM) + sortWithinPartitions establishes the
    // identical total order over the NARROW scan columns; the
    // encode→corrupt→lenient-decode chain is projected ABOVE the sort
    // — computed exactly once, in parallel. Same rows, same order.
    val src = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .repartitionByRange(s.sparkContext.defaultParallelism,
        col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
    val framed = src
      .select(col("o_orderkey"),
        b.encodeExpr(struct(col("o_orderkey"), col("o_orderstatus")))
          .as("bin0"))
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0,
          substring(col("bin0"), 1, 5)).otherwise(col("bin0")).as("bin"))
      .drop("bin0")
    // Round-17 fusion (guide §1.2 "don't compute things twice"): the
    // original ok∪dead union evaluated the partitionDecodable legs as
    // two SEPARATE plans, so every row paid encode+lenient-decode
    // TWICE (once per union branch — measured cpu/wall ≈ 2 on a
    // 32-core box: two single-task branches). One decode pass plus a
    // projection produces the identical row multiset: quarantined ⇔
    // undecodable, status = payload field on the decoded side. The
    // two-frame partitionDecodable API is unchanged (ConsumerSpec /
    // the streaming side-split pin it); this query keeps exercising
    // the same decodeLenientExpr + undecodable classification it
    // always did.
    val decoded = framed.withColumn("payload",
      when(col("bin").isNotNull, b.decodeLenientExpr(col("bin"))))
    val poison = Pipeline.undecodable(col("bin"), col("payload"))
    // order established below the codec (repartitionByRange + sort on
    // the unique key); the projections preserve it row-for-row
    decoded.select(col("o_orderkey"), poison.as("quarantined"),
      when(!poison, col("payload.o_orderstatus")).as("status"))
  }

  /** Kafka message headers end-to-end under the oracle gate (round
    * 14): per-row headers attached at produce (reference
    * `producer.rb:82,110-118`) ride BESIDE the Avro-encoded value in
    * Spark's Kafka wire shape (`message.rb:71-78` — never inside the
    * payload), decode back to the headers hash on consume
    * (`message.rb:79-88`), and the `:headers` payload-log style
    * (`logging.rb:84`) shapes the logged frame. The oracle recomputes
    * every header value straight from `orders`, independent of the
    * whole map→wire-entries→map machinery under test — a dropped,
    * reordered, or byte-mangled header surfaces as a hash mismatch. */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    import graft.model.PayloadLog
    import graft.observe.Observe
    import graft.produce.Producer
    import graft.schema.AvroBackend
    import graft.streaming.Streams
    val avroJson =
      """{"type":"record","name":"OrderHdr","fields":[
        | {"name":"o_orderkey","type":"long"},
        | {"name":"o_orderstatus","type":"string"},
        | {"name":"message_id","type":["null","string"],"default":null},
        | {"name":"timestamp","type":["null","string"],"default":null}]}""".stripMargin
    val backend = new AvroBackend(avroJson)
    val cfg = graft.model.TopicConfig("orders-hdr", "OrderHdr")
    // total-order-first, the q18/q13 shape: the final order key is
    // trace = "t-"||o_orderkey (unique), which is pure input
    // arithmetic — establish the order on the NARROW scan columns and
    // run the whole produce→wire→consume→log chain (projections only,
    // order-preserving) above it, once, in parallel
    val traceKey = concat(lit("t-"), col("o_orderkey").cast("string"))
    val src = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .repartitionByRange(s.sparkContext.defaultParallelism, traceKey)
      .sortWithinPartitions(traceKey)
      .withColumn("message_id", lit(null).cast("string"))
      .withColumn("timestamp", lit(null).cast("string"))
    val hdrs = map(
      lit("trace"), concat(lit("t-"), col("o_orderkey")),
      lit("src"), col("o_orderstatus"))
    val (framed, _) =
      Producer.produceFrame(src, cfg, backend, headers = Some(hdrs))
    val consumed = Streams.fromKafkaFrame(framed, backend)
    val logged = Observe.payloadLogFrame(
      consumed.select(col(graft.model.MessageCols.Headers)),
      PayloadLog.Headers, Nil)
    logged.select(
      element_at(col("payload_headers"), "trace").as("trace"),
      element_at(col("payload_headers"), "src").as("src"),
      size(col("payload_headers")).as("n_headers"))
    // order established below the codec chain (repartitionByRange +
    // sort on the unique trace key); projections preserve it
  }

  /** `save_associations_first` under the oracle gate (round 14 — M5's
    * assoc-first direction, reference `mass_updater.rb:93-131`): each
    * order row carries a nested association struct (its customer
    * profile); the association batch is extracted and deduped first,
    * a deterministic stand-in for the store's pk assignment numbers
    * it (dense order over the attributes — in production the store's
    * autoincrement does this), and the foreign key is filled back
    * onto every primary. The oracle recomputes the profile ids and
    * the fk join straight from `orders`, independent of the surrogate
    * staging machinery under test — a dropped, duplicated, or
    * mis-keyed fill-back surfaces as a mismatch.
    *
    * The dense ids come from [[Scale.denseIds]] (range-partitioned
    * two-level scan), not `row_number().over(Window.orderBy(...))`:
    * the unpartitioned window was this bench's only single-task
    * global sort (round-14 verdict item 3) — bounded here (the frame
    * is the DEDUPED dim-sized association batch, never the fact
    * table), but the whole point of the stand-in is to model the
    * pattern a reader should imitate, and at 100 TB that pattern must
    * not serialize a frame through one task. PlanPinsR15Spec asserts
    * no unpartitioned WindowExec remains in this plan. */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val prim = t(s, dir, "orders").select(
      col("o_orderkey"),
      struct(col("o_custkey").as("cust_id"),
        col("o_orderpriority").as("prio")).as("cust_ref"))
    val (assocBatch, staged) =
      Materialize.extractAssociationsFirst(prim, "cust_ref")
    // partitions=8: the deduped association frame is dim-sized (~65k
    // rows at sf0.1) — at 32 range partitions the three id-assignment
    // jobs pay more task overhead than they buy in parallelism
    // (measured: 1.37s @32 vs 1.25s @8 at sf0.1); a fact-sized frame
    // would pass the default instead
    val saved = Scale.denseIds(assocBatch,
      Seq(col("cust_id"), col("prio")), "id", partitions = 8)
    // explicit broadcast: denseIds' RDD hop erases size stats (Scan
    // ExistingRDD), so the dim-sized saved frame must be hinted or the
    // fill-back regresses to a fact-side SortMergeJoin
    Materialize.fillForeignKeys(staged, broadcast(saved),
      pkCol = "id", fkCol = "cust_profile_id", assocCol = "cust_ref")
      .select(col("o_orderkey"), col("cust_profile_id"))
      .orderBy(col("o_orderkey"))
  }

  // ------------------------------------------------------------- headline

  /** TPC-H Q1-style pricing summary. Money sums in exact cents so the
    * aggregate is order-independent and engine-exact. */
  private def b1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("base_cents"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("disc_cents"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Star join: broadcast the small dimension, shuffle the fact once. */
  private def b2(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val orders = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("rev_cents"))
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("rev_cents")).as("revenue_cents"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q3-style shipping priority: 3-way join, filtered both
    * sides, exact-cents revenue, top-10. */
  private def b3(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val cutoff = to_timestamp(lit("1995-03-15 00:00:00"))
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("rev_cents"))
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"))
      .agg(sum(col("rev_cents")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Sketch aggregates (HLL distinct, approximate quantiles) — the
    * approx layer Catalyst supplies. Raw sketch values never
    * hash-match another engine, so (round 9, ex rows-only) the row is
    * oracle-gated through what IS deterministic cross-engine: the
    * exact count-distinct each sketch estimates, plus booleans
    * pinning each sketch inside a slack band far outside its
    * guarantee (approx_count_distinct rsd 0.05 → checked at ±15%;
    * percentile_approx accuracy 1000 → rank error 1e-3, checked at
    * ±5% rank via tie-robust rank counts). The exact columns are the
    * verification harness — production callers keep the sketch
    * columns alone; a broken sketch flips a boolean and the driver
    * hash catches it. `ApproxBoundsSpec` additionally asserts the
    * raw sketch errors, tighter. */
  private def b4(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_returnflag"),
      col("l_partkey"), col("l_extendedprice"))
    // pass 1: sketches + the exact anchor, per flag (3-row frame)
    val sk = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
        .as("p50a"),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))
        .as("p99a"),
      count(lit(1)).as("n"))
    // pass 2: the RANK of each sketch value, as codegen'd filter
    // counts over a broadcast of the 3-row frame — never an exact
    // percentile aggregate (a per-group value→count map is the one
    // shape that does not survive 100 TB; a second scan does). A
    // value v is an acceptable p-quantile iff
    // count(<v) ≤ (p+slack)·n AND count(≤v) ≥ (p−slack)·n — the
    // tie-robust interval form (degenerate all-equal groups pass).
    val ranks = li.join(
        broadcast(sk.select(col("l_returnflag").as("rf"),
          col("p50a"), col("p99a"))),
        col("l_returnflag") === col("rf"))
      .groupBy(col("l_returnflag")).agg(
        sum(when(col("l_extendedprice") < col("p50a"), 1L)
          .otherwise(0L)).as("lt50"),
        sum(when(col("l_extendedprice") <= col("p50a"), 1L)
          .otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") < col("p99a"), 1L)
          .otherwise(0L)).as("lt99"),
        sum(when(col("l_extendedprice") <= col("p99a"), 1L)
          .otherwise(0L)).as("le99"))
    sk.join(ranks, "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts").cast("double") * 0.15).as("approx_parts_ok"),
        (col("lt50").cast("double") <= col("n") * 0.55 &&
          col("le50").cast("double") >= col("n") * 0.45)
          .as("p50_in_bounds"),
        (col("lt99").cast("double") <= col("n") * 0.999 &&
          col("le99").cast("double") >= col("n") * 0.95)
          .as("p99_in_bounds"))
      .orderBy(col("l_returnflag"))
  }

  // ------------------------------------------------------------------ API

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b3_top_orders" -> (b3 _),
    "b4_approx_agg" -> (b4 _),
    "q1_project" -> (q1 _),
    "q2_coerce" -> (q2 _),
    "q3_compact" -> (q3 _),
    "q4_slice" -> (q4 _),
    "q5_materialize" -> (q5 _),
    "q6_poll_scan" -> (q6 _),
    "q7_watched" -> (q7 _),
    "q8_pending" -> (q8 _),
    "q9_drain" -> (q9 _),
    "q10_fanout" -> (q10 _),
    "q11_autofields" -> (q11 _),
    "q12_compound_key" -> (q12 _),
    "q13_proto_codec" -> (q13 _),
    "q14_registry_evolution" -> (q14 _),
    "q15_snapshot_diff" -> (q15 _),
    "q16_scd2_history" -> (q16 _),
    "q17_proto_registry" -> (q17 _),
    "q18_dead_letter" -> (q18 _),
    "q19_headers" -> (q19 _),
    "q20_assoc_first" -> (q20 _),
    "b1_pricing" -> (b1 _),
    "b2_star_join" -> (b2 _),
  ) ++ ExtQueries.queries

  def oracleSql: Map[String, String] = Map(
    "q1_project" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY user_id, event_id""".stripMargin,
    "q2_coerce" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '-?\d+', 0) AS BIGINT) AS k_int,
        |  CAST(regexp_extract(props, '-?\d+(\.\d+)?', 0) AS DOUBLE) AS k_dbl,
        |  CAST(FLOOR(value) AS BIGINT) AS value_floor,
        |  (value IS NOT NULL AND value <> 0) AS flag
        |FROM events ORDER BY event_id""".stripMargin,
    "q3_compact" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q4_slice" ->
      """SELECT event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS wave
        |FROM events ORDER BY event_id""".stripMargin,
    "q5_materialize" ->
      """SELECT user_id, last_event_id, event_type, value FROM (
        |  SELECT user_id, event_id AS last_event_id, event_type, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |) WHERE event_type <> 'error' ORDER BY user_id""".stripMargin,
    "q6_poll_scan" ->
      s"""SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS o_date_ms
         |FROM orders
         |WHERE ((o_orderdate = TIMESTAMP '$q6From' AND o_orderkey > 1000)
         |       OR o_orderdate > TIMESTAMP '$q6From')
         |  AND o_orderdate <= TIMESTAMP '$q6To'
         |ORDER BY o_orderdate, o_orderkey LIMIT 1000""".stripMargin,
    "q7_watched" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT a.user_id, a.event_id AS last_event_id, b.event_id AS prev_event_id
        |FROM r a LEFT JOIN r b ON a.user_id = b.user_id AND b.rn = 2
        |WHERE a.rn = 1 AND (b.event_id IS NULL OR a.event_type <> b.event_type
        |  OR a.value <> b.value)
        |ORDER BY a.user_id""".stripMargin,
    "q8_pending" ->
      """SELECT event_type AS topic, COUNT(*) AS pending_count,
        |  epoch_ms(MIN(ts)) AS min_ts_ms
        |FROM events GROUP BY event_type ORDER BY topic""".stripMargin,
    "q9_drain" ->
      """WITH lim AS (
        |  SELECT event_id, event_type AS topic, user_id, value FROM events
        |  QUALIFY row_number() OVER (PARTITION BY event_type
        |    ORDER BY event_id) <= 1000)
        |SELECT event_id, topic, user_id, value FROM lim
        |QUALIFY row_number() OVER (PARTITION BY topic, user_id
        |  ORDER BY event_id DESC) = 1
        |ORDER BY event_id LIMIT 1000""".stripMargin,
    "q10_fanout" ->
      """SELECT o_orderkey, o_custkey, l_linenumber, l_quantity
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    "q11_autofields" ->
      """SELECT event_id,
        |  md5('evt|' || CAST(event_id AS VARCHAR)) AS message_id,
        |  epoch_ms(ts) AS ts_ms
        |FROM events ORDER BY event_id""".stripMargin,
    "q12_compound_key" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber
        |  ORDER BY l_suppkey DESC, l_partkey DESC) = 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q13_proto_codec" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q14_registry_evolution" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 2 = 0 THEN CAST(-1 AS BIGINT)
        |       ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |  END AS price_cents
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q15_snapshot_diff" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'added'
        |       WHEN o_orderkey % 5 = 0 THEN 'deleted'
        |       ELSE 'changed' END AS status
        |FROM orders
        |WHERE (o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0)
        |   OR (o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0)
        |   OR (o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0
        |       AND o_orderkey % 3 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "q16_scd2_history" ->
      // change detection via IS DISTINCT FROM + an explicit first-row
      // marker, mirroring the operator's null-safe <=> semantics: a
      // NULL state following a non-null one IS a change, and a NULL
      // state's prev_state being NULL does not mark a change by itself
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
        |    lag(event_type) OVER w0 AS prev_state,
        |    row_number() OVER w0 AS rn
        |  FROM events
        |  WINDOW w0 AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |chg AS (
        |  SELECT user_id, event_id, event_type, ts_ms
        |  FROM e WHERE rn = 1 OR event_type IS DISTINCT FROM prev_state)
        |SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_type,
        |  ts_ms AS eff_from,
        |  lead(ts_ms) OVER w AS eff_to
        |FROM chg
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |ORDER BY user_id, version""".stripMargin,
    // the oracle recomputes the expected decode from plain columns:
    // the whole encode→frame→dispatch→writer-decode→resolve chain is
    // under test, incl. v1's zigzag price and v2's added field
    "q17_proto_registry" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 0
        |       ELSE o_custkey END AS o_custkey
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the DLQ classification re-derived from key arithmetic alone —
    // independent of the encode→corrupt→lenient-decode chain under test
    "q18_dead_letter" ->
      """SELECT o_orderkey,
        |  (o_orderkey % 7 = 0) AS quarantined,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |       ELSE o_orderstatus END AS status
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // headers recomputed straight from the table — the produce→wire→
    // consume→log-style chain under test never touches the oracle
    "q19_headers" ->
      """SELECT 't-' || CAST(o_orderkey AS VARCHAR) AS trace,
        |  o_orderstatus AS src,
        |  CAST(2 AS INTEGER) AS n_headers
        |FROM orders ORDER BY trace""".stripMargin,
    // assoc-first fk fill recomputed without the surrogate staging:
    // distinct profiles numbered densely, joined back on the attrs
    "q20_assoc_first" ->
      """WITH assoc AS (
        |  SELECT DISTINCT o_custkey AS cust_id, o_orderpriority AS prio
        |  FROM orders
        |), saved AS (
        |  SELECT cust_id, prio,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cust_id, prio) AS BIGINT) AS id
        |  FROM assoc
        |)
        |SELECT o.o_orderkey, s.id AS cust_profile_id
        |FROM orders o
        |JOIN saved s ON o.o_custkey = s.cust_id
        |            AND o.o_orderpriority = s.prio
        |ORDER BY o.o_orderkey""".stripMargin,
    "b1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS base_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS disc_cents,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b2_star_join" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "b3_top_orders" ->
      """SELECT o_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin,
    // b4's sketch values are engine-specific; the oracle checks the
    // exact distinct count and asserts the engine-side bounded-error
    // booleans came out TRUE (they are deterministic given the data —
    // Spark's HLL and KLL sketches are deterministic — and sit far
    // inside their guarantees at every SF).
    "b4_approx_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS approx_parts_ok, TRUE AS p50_in_bounds,
        |  TRUE AS p99_in_bounds
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  ) ++ ExtQueries.oracleSql
}
