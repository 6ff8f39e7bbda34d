package graft.sources

import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions
import org.apache.spark.sql.types._

/** GENERATED PARTITION COLUMNS (Delta's generation expressions, the
  * partitioning face): a table records
  * `graft.generatedCol.<col> = <generator>(<baseCol>)` and gets
  *
  *   - WRITE-SIDE POPULATION: a commit whose frame lacks `<col>`
  *     computes it from the base column before the partition layout —
  *     callers ingest raw event frames and the table partitions itself;
  *   - WRITE-SIDE ENFORCEMENT: a frame that DOES carry `<col>` is
  *     validated against the generator on the staged batch (the
  *     constraints pass — one columnar scan), so a caller cannot commit
  *     rows whose partition value disagrees with their data;
  *   - PREDICATE-DERIVED PRUNING: a query or DML predicate on the BASE
  *     column derives partition-column conjuncts — implied bounds for
  *     file pruning, and EXACT replacements (period-boundary literals,
  *     monotone generators) that make `DELETE WHERE ts < '2024-03-01'`
  *     a METADATA-ONLY partition drop even though `ts` is not the
  *     partition column. That is the retention-delete shape of the
  *     reference's hourly loads (`dags/retail_hourly_etl.py` batches by
  *     `loaded_at`): users think in event time, the layout lives in
  *     derived periods.
  *
  * Supported generators (the Delta-documented set restricted to forms
  * whose result the partition pruner canonicalizes — DATE and INT):
  * `date(c)`, `year(c)`, `month(c)`, `day(c)`, `hour(c)`,
  * `trunc(c, 'year')`, `trunc(c, 'month')`. `date`/`year`/`trunc` are
  * MONOTONE in the base column, so range predicates derive range
  * bounds; `month`/`day`/`hour` extracts are cyclic — equality/IN only.
  *
  * 100 TB note: derivation is O(conjuncts) driver-side plan analysis —
  * zero data cost — and population/enforcement ride existing passes
  * (the projection before the staged write; the constraints scan). */
object GeneratedCols {

  /** Table-property prefix; the suffix is the generated column's
    * LOGICAL name, the value the generator text. Fixed at table birth
    * (`commit(recordProperties = ...)`) like the partition spec. */
  val Prefix = "graft.generatedCol."

  /** The SESSION TIME ZONE the generators were born under, recorded
    * automatically with the first generator-carrying commit. A
    * TimestampType base makes `date(ts)` zone-dependent: values
    * populated under one zone and pruned under another would break the
    * replacement equivalence (a LA-evening row lands in yesterday's UTC
    * partition) — so writes against a zone-sensitive generator REQUIRE
    * the recorded zone, and the derivation sites silently skip
    * zone-sensitive generators under a mismatched session (falling back
    * to the row road / stats pruning, which stay correct). Date and
    * TIMESTAMP_NTZ bases are zone-free and unaffected. */
  val ZoneProp = "graft.generatedColZone"

  /** StructField-metadata marker [[populate]] stamps on columns IT
    * computed: the enforcement pass skips marked columns (correct by
    * construction — re-scanning them verifies a tautology), while a
    * CALLER-built column (no marker; `withColumn` drops metadata, so an
    * UPDATE that touches the column also re-arms the check) is verified
    * against the generator on the staged scan. */
  val PopulatedKey = "graft.generated.populated"

  private val FnRe =
    """(?i)^\s*(date|year|month|day|hour)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$""".r
  private val TruncRe =
    """(?i)^\s*trunc\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*'(year|month)'\s*\)\s*$""".r

  /** One parsed generator: `col = kind(base)`. `text` is the recorded
    * property value — already valid Spark SQL, reused verbatim for the
    * enforcement expression. */
  final case class Generator(kind: String, base: String, text: String) {
    /** The generator text against a RENAMED base column (renameColumn
      * follows references the way the partition property does). */
    def render(newBase: String): String = kind match {
      case "trunc_year"  => s"trunc($newBase, 'year')"
      case "trunc_month" => s"trunc($newBase, 'month')"
      case k             => s"$k($newBase)"
    }
    /** Monotone non-decreasing in the base column — range predicates on
      * the base derive range bounds on the generated column. */
    def monotone: Boolean = kind == "date" || kind == "year" ||
      kind == "trunc_year" || kind == "trunc_month"

    def resultType: DataType = kind match {
      case "date" | "trunc_year" | "trunc_month" => DateType
      case _ => IntegerType
    }

    /** The generation expression over the base column (write-side
      * population). */
    def expr(c: Column): Column = kind match {
      case "date"        => functions.to_date(c)
      case "year"        => functions.year(c)
      case "month"       => functions.month(c)
      case "day"         => functions.dayofmonth(c)
      case "hour"        => functions.hour(c)
      case "trunc_year"  => functions.trunc(c, "year")
      case "trunc_month" => functions.trunc(c, "month")
    }

    /** `f(literal)` computed at PLAN TIME: the base-column literal of a
      * conjunct mapped into the generated column's domain. Timestamps
      * resolve through `zone` (the session time zone — the same clock
      * `expr` uses executing). None = unsupported literal type. */
    def applyLiteral(l: Literal, zone: ZoneId): Option[Literal] =
      toLdt(l, zone).map { ldt =>
        kind match {
          case "date" =>
            Literal(ldt.toLocalDate.toEpochDay.toInt, DateType)
          case "year"  => Literal(ldt.getYear, IntegerType)
          case "month" => Literal(ldt.getMonthValue, IntegerType)
          case "day"   => Literal(ldt.getDayOfMonth, IntegerType)
          case "hour"  => Literal(ldt.getHour, IntegerType)
          case "trunc_year" =>
            Literal(LocalDate.of(ldt.getYear, 1, 1).toEpochDay.toInt, DateType)
          case "trunc_month" =>
            Literal(ldt.toLocalDate.withDayOfMonth(1).toEpochDay.toInt, DateType)
        }
      }

    /** Is the literal EXACTLY the first instant of its generator period?
      * Then `base < L ⟺ gen < f(L)` and `base >= L ⟺ gen >= f(L)` (f
      * monotone, L a period boundary) — the conjunct may be REPLACED,
      * not just implied, and the metadata-only drop road can decide it. */
    def isPeriodStart(l: Literal, zone: ZoneId): Boolean =
      monotone && toLdt(l, zone).exists { ldt =>
        val midnight = ldt.toLocalTime == java.time.LocalTime.MIDNIGHT
        kind match {
          case "date" => midnight
          case "year" | "trunc_year" => midnight && ldt.getDayOfYear == 1
          case "trunc_month" => midnight && ldt.getDayOfMonth == 1
          case _ => false
        }
      }
  }

  /** Literal → wall-clock LocalDateTime in `zone`. Timestamp literals
    * are Catalyst micros; date literals epoch days (midnight). */
  private def toLdt(l: Literal, zone: ZoneId): Option[LocalDateTime] =
    Option(l.value).flatMap { v =>
      l.dataType match {
        case TimestampType =>
          val micros = v.asInstanceOf[Long]
          val secs = Math.floorDiv(micros, 1000000L)
          val ns = Math.floorMod(micros, 1000000L) * 1000L
          Some(java.time.Instant.ofEpochSecond(secs, ns)
            .atZone(zone).toLocalDateTime)
        case TimestampNTZType =>
          val micros = v.asInstanceOf[Long]
          val secs = Math.floorDiv(micros, 1000000L)
          val ns = Math.floorMod(micros, 1000000L) * 1000L
          Some(java.time.Instant.ofEpochSecond(secs, ns)
            .atZone(ZoneOffset.UTC).toLocalDateTime)
        case DateType =>
          Some(LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).atStartOfDay)
        case _ => None
      }
    }

  /** Parse every `graft.generatedCol.*` property: generated column
    * (logical name) → generator. An unparseable value fails LOUDLY —
    * silently ignoring it would commit unpartitioned-as-intended data. */
  def of(props: Map[String, String]): Map[String, Generator] =
    props.collect { case (k, v) if k.startsWith(Prefix) =>
      val col = k.stripPrefix(Prefix)
      require(col.nonEmpty, s"empty generated-column name in property $k")
      val gen = v match {
        case FnRe(fn, base) => Generator(fn.toLowerCase, base, v)
        case TruncRe(base, unit) => Generator("trunc_" + unit.toLowerCase, base, v)
        case _ => throw new IllegalArgumentException(
          s"unsupported generator for $k: '$v' (supported: date(c), year(c), " +
            "month(c), day(c), hour(c), trunc(c, 'year'|'month'))")
      }
      col -> gen
    }

  /** The single population point (every commit road calls it;
    * idempotent): a frame lacking a generated column computes it from
    * the base and stamps [[PopulatedKey]] metadata so enforcement can
    * tell self-computed from caller-provided. `strict = false` skips a
    * missing base silently (the append road — its schema gate produces
    * the right error); strict fails loudly naming the generator.
    *
    * The ZONE PIN lives HERE, at the moment a value is actually
    * computed: populating a TimestampType base under a session zone
    * other than `bornZone` would land the same event in a different
    * partition than the table's standing rows — refused loudly. Frames
    * that already carry the column (any zone: they hold STORED values)
    * and zone-free bases (date / timestamp_ntz) pass. */
  def populate(
      df: org.apache.spark.sql.DataFrame,
      gens: Map[String, Generator],
      strict: Boolean = true,
      bornZone: Option[String] = None,
      sessionZone: String = ""): org.apache.spark.sql.DataFrame =
    gens.foldLeft(df) { case (d, (c, g)) =>
      if (d.columns.exists(_.equalsIgnoreCase(c))) d
      else if (!d.columns.exists(_.equalsIgnoreCase(g.base))) {
        require(!strict,
          s"generated column $c = ${g.text} needs base column ${g.base} " +
            "in the frame")
        d
      } else {
        val zoneSensitive = d.schema
          .find(_.name.equalsIgnoreCase(g.base))
          .exists(_.dataType == TimestampType)
        bornZone.foreach { born =>
          require(!zoneSensitive || sessionZone.isEmpty || born == sessionZone,
            s"generated column $c = ${g.text} was born under session " +
              s"time zone $born; this session runs $sessionZone — a " +
              "TimestampType base would populate into different " +
              s"partitions. Set spark.sql.session.timeZone=$born to write")
        }
        val meta = new MetadataBuilder()
          .putBoolean(PopulatedKey, true).build()
        d.withColumn(c, g.expr(functions.col(g.base)).as(c, meta))
      }
    }

  /** Is this field a [[populate]]-stamped column? */
  def isPopulated(f: StructField): Boolean =
    f.metadata.contains(PopulatedKey) && f.metadata.getBoolean(PopulatedKey)

  // ---- STORED GENERATED COLUMNS (expression face) --------------------------

  /** Table-property prefix of a STORED generated column (Delta's
    * `GENERATED ALWAYS AS (expr)` beyond the partition face): the suffix
    * is the column's logical name, the value an arbitrary DETERMINISTIC
    * Spark-SQL expression over the frame's other columns. Unlike the
    * partition generators, these derive no pruning — they are
    * computed-and-stored values with write-side population (frame lacks
    * the column → compute it) and write-side enforcement (frame carries
    * it → verified `col <=> (expr)` on the staged scan, the same
    * constraints pass the partition generators ride). Fixed at table
    * birth like every generator. */
  val ExprPrefix = "graft.generatedExpr."

  /** Parse every `graft.generatedExpr.*` property: column → expression
    * text (validated to parse at population time, loudly). */
  def exprsOf(props: Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith(ExprPrefix) =>
      val col = k.stripPrefix(ExprPrefix)
      require(col.nonEmpty, s"empty generated-column name in property $k")
      col -> v
    }

  /** [[populate]]'s twin for expression columns: a frame lacking the
    * column computes it — cast to the table's recorded type when given,
    * so the stored type never drifts from the schema the table was born
    * with — and stamps [[PopulatedKey]]; a frame carrying it is enforced
    * by the commit's constraints pass instead. Parse errors surface with
    * the generator named; resolution errors (a base column missing from
    * the frame) surface through the analyzer, which names the column. */
  def populateExprs(
      df: org.apache.spark.sql.DataFrame,
      exprs: Map[String, String],
      types: Map[String, DataType] = Map.empty)
      : org.apache.spark.sql.DataFrame =
    exprs.toSeq.sortBy(_._1).foldLeft(df) { case (d, (c, text)) =>
      if (d.columns.exists(_.equalsIgnoreCase(c))) d
      else {
        val computed0 =
          try functions.expr(text)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"generated column $c = $text does not parse: ${e.getMessage}", e)
          }
        val computed = types.find(_._1.equalsIgnoreCase(c))
          .map { case (_, t) => computed0.cast(t) }.getOrElse(computed0)
        val meta = new MetadataBuilder()
          .putBoolean(PopulatedKey, true).build()
        d.withColumn(c, computed.as(c, meta))
      }
    }

  // ---- IDENTITY COLUMNS ----------------------------------------------------

  /** Table-property prefix of an IDENTITY column (Delta's `GENERATED BY
    * DEFAULT AS IDENTITY`): the suffix is the column's logical name, the
    * value `<start>,<step>`. A frame lacking the column gets values
    * allocated above the recorded high-water mark; a frame carrying it
    * keeps its explicit values (the BY DEFAULT semantics — population is
    * presence-keyed like every generator here). */
  val IdentityPrefix = "graft.identityCol."

  /** Per-column allocation high-water mark — the LAST VALUE handed out,
    * advanced transactionally by the commit that allocated (the Delta
    * identity highWaterMark). Never set directly; the commit roads
    * re-validate it inside the publish claim so two concurrent
    * allocating writers cannot both advance from the same basis. */
  val IdentityHighPrefix = "graft.identityHigh."

  final case class Identity(col: String, start: Long, step: Long) {
    require(step != 0L, s"identity column $col needs a non-zero step")
    def highProp: String = IdentityHighPrefix + col
  }

  /** Parse every `graft.identityCol.*` property. An unparseable value
    * fails loudly — silently ignoring it would commit null ids. */
  def identitiesOf(props: Map[String, String]): Map[String, Identity] =
    props.collect { case (k, v) if k.startsWith(IdentityPrefix) =>
      val col = k.stripPrefix(IdentityPrefix)
      require(col.nonEmpty, s"empty identity-column name in property $k")
      val parts = v.split(',').map(_.trim)
      require(parts.length == 2 && parts.forall(_.toLongOption.isDefined),
        s"identity property $k must be '<start>,<step>', got '$v'")
      col -> Identity(col, parts(0).toLong, parts(1).toLong)
    }

  /** DENSE identity allocation over a staged batch: rows take
    * `last + step, last + 2·step, …` in batch order, where `last` is the
    * recorded high-water (or `start - step` for the first allocation).
    * One `zipWithIndex` pass serves every missing identity column — an
    * extra O(batch) counting job, never O(table), and the ids come out
    * unique, monotone in commit order, and dense; gaps appear only when
    * a commit aborts after allocating, which the identity contract
    * permits. Returns the populated frame, per populated column
    * (recorded basis raw value, new high) — the commit records the
    * advance in the SAME version and re-validates the basis inside its
    * publish claim, so concurrent allocators serialize through the
    * store's linearization point instead of colliding — and a RELEASE
    * thunk freeing the pin's storage blocks: the commit roads call it
    * once the attempt that allocated is decided (published or
    * superseded by an OCC retry), so retry loops don't accumulate one
    * pinned batch per lost race.
    *
    * The batch is evaluated twice (count + assignment), the standard
    * Spark zip contract: the frame must recompute deterministically, as
    * every staged write here already assumes. */
  def populateIdentity(
      df: org.apache.spark.sql.DataFrame,
      idents: Map[String, Identity],
      props: Map[String, String])
      : (org.apache.spark.sql.DataFrame,
         Map[String, (Option[String], Long)], () => Unit) = {
    val missing = idents.values
      .filter(i => !df.columns.exists(_.equalsIgnoreCase(i.col)))
      .toSeq.sortBy(_.col)
    if (missing.isEmpty) return (df, Map.empty, () => ())
    val spark = df.sparkSession
    val basisLast: Seq[(Identity, Option[String], Long)] = missing.map { i =>
      val basis = props.get(i.highProp)
      val last = basis.flatMap(_.toLongOption).getOrElse(i.start - i.step)
      (i, basis, last)
    }
    val meta = new MetadataBuilder().putBoolean(PopulatedKey, true).build()
    val outSchema = StructType(df.schema.fields ++ basisLast.map { case (i, _, _) =>
      StructField(i.col, LongType, nullable = false, metadata = meta)
    })
    val lastStep = basisLast.map { case (i, _, last) => (last, i.step) }
    val rdd = df.rdd.zipWithIndex().map { case (r, idx) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq ++
        lastStep.map { case (last, step) => last + step * (idx + 1) })
    }
    // EAGER local checkpoint pins the row→id mapping to ONE evaluation:
    // the commit writes this frame at least twice (change feed + data),
    // and a join-derived batch (a merge's insert image) does NOT
    // recompute with a stable row order under AQE — without the pin,
    // the feed could record ids the table never stored. The cost is one
    // O(batch) materialization (MEMORY_AND_DISK), bounded by the staged
    // batch the commit writes anyway — and it ABSORBS the count job the
    // advance needs (counting checkpointed blocks is metadata-fast).
    // Checkpoint (lineage TRUNCATED — a lost block fails loudly instead
    // of silently re-zipping to different ids) on OUR RDD handle, not
    // Dataset.localCheckpoint whose internal RDD the caller cannot
    // reach: the returned release thunk unpersists it, so an OCC retry
    // loop frees each superseded attempt's blocks instead of leaking
    // one pinned batch per lost race.
    rdd.localCheckpoint()
    val n = rdd.count()
    val out = spark.createDataFrame(rdd, outSchema)
    // an EMPTY batch still gets the columns (schema gates downstream)
    // but records no advance — a zero-row commit must not invent a
    // high-water below start or force conflicts on concurrent allocators
    val advances =
      if (n == 0L) Map.empty[String, (Option[String], Long)]
      else basisLast.map { case (i, basis, last) =>
        i.col -> (basis, last + i.step * n)
      }.toMap
    (out, advances, () => { rdd.unpersist(blocking = false); () })
  }

  private def attrOf(e: Expression): Option[String] = TableStats.attrName(e)

  private def genAttr(name: String, g: Generator): Expression =
    AttributeReference(name, g.resultType)()

  /** Generators keyed by their BASE column (lowercased) for conjunct
    * matching; a base feeding several generated columns derives for
    * each. */
  private def byBase(gens: Map[String, Generator])
      : Map[String, Seq[(String, Generator)]] =
    gens.toSeq.groupBy(_._2.base.toLowerCase)

  /** EXACT replacement for `conj`, when one exists: a conjunct on a
    * generator's base column provably EQUIVALENT to a conjunct on the
    * generated column (period-boundary `<`/`>=` under a monotone
    * generator; IS [NOT] NULL under any — the generators are
    * null-preserving both ways). The metadata-only drop road substitutes
    * these so a retention predicate in EVENT TIME decides whole
    * partitions. When several generated columns share the base, the
    * first replaceable one wins (any is sufficient — equivalence). */
  def replacementFor(
      conj: Expression, gens: Map[String, Generator], zone: ZoneId)
      : Option[Expression] = {
    if (gens.isEmpty) return None
    val bb = byBase(gens)
    def cands(a: Expression): Seq[(String, Generator)] =
      attrOf(a).map(n => bb.getOrElse(n.toLowerCase, Nil)).getOrElse(Nil)
    def bound(a: Expression, l: Literal, lt: Boolean): Option[Expression] =
      cands(a).flatMap { case (name, g) =>
        if (!g.isPeriodStart(l, zone)) None
        else g.applyLiteral(l, zone).map { fl =>
          if (lt) LessThan(genAttr(name, g), fl)
          else GreaterThanOrEqual(genAttr(name, g), fl)
        }
      }.headOption
    conj match {
      case LessThan(a, l: Literal) => bound(a, l, lt = true)
      case GreaterThan(l: Literal, a) => bound(a, l, lt = true)
      case GreaterThanOrEqual(a, l: Literal) => bound(a, l, lt = false)
      case LessThanOrEqual(l: Literal, a) => bound(a, l, lt = false)
      case IsNull(a) => cands(a).headOption.map { case (n, g) =>
        IsNull(genAttr(n, g)) }
      case IsNotNull(a) => cands(a).headOption.map { case (n, g) =>
        IsNotNull(genAttr(n, g)) }
      case _ => None
    }
  }

  /** IMPLIED conjuncts for `conj`: sound consequences on the generated
    * column(s), appended (never substituted) so the file pruner can
    * skip partitions from a base-column predicate. Monotone generators
    * derive from ranges (strict bounds relax — `base < L ⟹ gen ≤
    * f(L)`); every generator derives from equality/IN. */
  def impliedFor(
      conj: Expression, gens: Map[String, Generator], zone: ZoneId)
      : Seq[Expression] = {
    if (gens.isEmpty) return Nil
    val bb = byBase(gens)
    def cands(a: Expression): Seq[(String, Generator)] =
      attrOf(a).map(n => bb.getOrElse(n.toLowerCase, Nil)).getOrElse(Nil)
    def mapped(a: Expression, l: Literal, monotoneOnly: Boolean)(
        mk: (Expression, Literal) => Expression): Seq[Expression] =
      cands(a).flatMap { case (name, g) =>
        if (monotoneOnly && !g.monotone) None
        else g.applyLiteral(l, zone).map(fl => mk(genAttr(name, g), fl))
      }
    conj match {
      case EqualTo(a, l: Literal) => mapped(a, l, monotoneOnly = false)(EqualTo)
      case EqualTo(l: Literal, a) => mapped(a, l, monotoneOnly = false)(EqualTo)
      case EqualNullSafe(a, l: Literal) if l.value != null =>
        mapped(a, l, monotoneOnly = false)(EqualTo)
      case LessThan(a, l: Literal) =>
        mapped(a, l, monotoneOnly = true)(LessThanOrEqual)
      case GreaterThan(l: Literal, a) =>
        mapped(a, l, monotoneOnly = true)(LessThanOrEqual)
      case LessThanOrEqual(a, l: Literal) =>
        mapped(a, l, monotoneOnly = true)(LessThanOrEqual)
      case GreaterThan(a, l: Literal) =>
        mapped(a, l, monotoneOnly = true)(GreaterThanOrEqual)
      case LessThan(l: Literal, a) =>
        mapped(a, l, monotoneOnly = true)(GreaterThanOrEqual)
      case GreaterThanOrEqual(a, l: Literal) =>
        mapped(a, l, monotoneOnly = true)(GreaterThanOrEqual)
      case LessThanOrEqual(l: Literal, a) =>
        mapped(a, l, monotoneOnly = true)(GreaterThanOrEqual)
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        cands(a).flatMap { case (name, g) =>
          val fls = vs.map { case l: Literal => g.applyLiteral(l, zone) }
          if (fls.contains(None)) None
          else Some(In(genAttr(name, g), fls.flatten))
        }
      case IsNull(a) => cands(a).map { case (n, g) => IsNull(genAttr(n, g)) }
      case IsNotNull(a) => cands(a).map { case (n, g) => IsNotNull(genAttr(n, g)) }
      case _ => Nil
    }
  }
}
