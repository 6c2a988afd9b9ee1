package graft.schema

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}

/** Schema-class source generator — the engine's version of the
  * reference's schema-class generator
  * (`lib/generators/deimos/schema_class_generator.rb:11-120` +
  * templates): walk an Avro schema, emit one Scala source per named
  * type — `final case class` per record (nullable-union fields become
  * `Option[T] = None`), `sealed trait` + case objects per enum — plus
  * the embedded schema JSON, so producers/consumers get typed payload
  * classes and `Dataset[T]` encoders line up with the wire schema.
  *
  * Like the reference (`IGNORE_DEFAULTS`), `message_id`/`timestamp`
  * never get schema defaults — the pipeline auto-fills them (P5).
  */
object SchemaClassGen {

  private val IgnoreDefaults = Set("message_id", "timestamp")

  /** (className, source) for every named type reachable from the
    * schema, main record first, nested types in discovery order. */
  def generate(schemaJson: String): Seq[(String, String)] = {
    // lenient NAME validation only (defaults stay validated): the
    // reference ecosystem carries hyphenated namespaces like
    // `com.my-namespace` (its own fixture suite does), which Avro's
    // Java parser rejects by default — the generator accepts them and
    // emits backtick-quoted package segments instead. Wire codecs
    // (AvroBackend) keep the strict parser.
    val root = new AvroSchema.Parser(org.apache.avro.NameValidator.NO_VALIDATION)
      .parse(schemaJson)
    // named-type identity is the FULL name (Avro's own rule) — keying
    // on simple names would silently drop the second of two same-named
    // records in different namespaces and mis-type its references
    val discovered = scala.collection.mutable.LinkedHashMap[String, AvroSchema]()
    def walk(s: AvroSchema): Unit = s.getType match {
      case AvroSchema.Type.RECORD =>
        if (!discovered.contains(s.getFullName)) {
          discovered(s.getFullName) = s
          s.getFields.asScala.foreach(f => walk(f.schema))
        }
      case AvroSchema.Type.ENUM =>
        discovered.getOrElseUpdate(s.getFullName, s); ()
      case AvroSchema.Type.UNION => s.getTypes.asScala.foreach(walk)
      case AvroSchema.Type.ARRAY => walk(s.getElementType)
      case AvroSchema.Type.MAP => walk(s.getValueType)
      case _ => ()
    }
    walk(root)
    // generated sources reference types by simple name within their
    // own packages; a simple-name collision across namespaces would
    // still generate, but writeTo's one-file-per-simple-name layout
    // (and unqualified references) would clash — fail loudly
    val collisions = discovered.values.toSeq.groupBy(_.getName)
      .filter(_._2.size > 1)
    require(collisions.isEmpty,
      "colliding simple names across namespaces: " +
        collisions.values.flatten.map(_.getFullName).mkString(", "))
    discovered.values.toSeq.map {
      case s if s.getType == AvroSchema.Type.RECORD => s.getName -> recordSource(s)
      case s => s.getName -> enumSource(s)
    }
  }

  /** Key-record class for a `key_config field:` topic — pairs with
    * [[AvroBackend.keySchemaJson]] the way the reference generates the
    * key class alongside (`schema_class_generator.rb:58-66`). */
  def generateKeyClass(backend: AvroBackend, field: String): (String, String) =
    generate(backend.keySchemaJson(field)).head

  /** Write each generated source as `<dir>/<Name>.scala`. */
  def writeTo(dir: java.nio.file.Path, schemaJson: String): Seq[java.nio.file.Path] = {
    java.nio.file.Files.createDirectories(dir)
    generate(schemaJson).map { case (name, src) =>
      java.nio.file.Files.write(dir.resolve(s"$name.scala"),
        src.getBytes("UTF-8"))
    }
  }

  /** Emit the CREATE TABLE migration for a value schema — the
    * reference's `active_record_generator` surface (it writes a Rails
    * migration per consumed schema) re-aimed at a plain SQL file:
    * `<dir>/V<version>__create_<table>.sql` with the DDL from
    * [[AvroBackend.createTableSql]]. */
  def writeMigration(dir: java.nio.file.Path, backend: AvroBackend,
      table: String, keyCols: Seq[String],
      version: Int = 1): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve(f"V$version%03d__create_$table.sql"),
      (backend.createTableSql(table, keyCols) + ";\n").getBytes("UTF-8"))
  }

  /** Reference to a named type from code living in package
    * `fromPkg`: simple name within the same package, fully-qualified
    * (sanitized) otherwise — cross-namespace references (e.g. a union
    * of records in a sub-namespace) must compile without imports. */
  private def typeRef(s: AvroSchema, fromPkg: String): String = {
    val pkg = pkgName(Option(s.getNamespace))
    if (pkg == fromPkg) sanitize(s.getName)
    else s"$pkg.${sanitize(s.getName)}"
  }

  private def scalaType(s: AvroSchema, fromPkg: String): String = s.getType match {
    case AvroSchema.Type.INT => "Int"
    case AvroSchema.Type.LONG => "Long"
    case AvroSchema.Type.FLOAT => "Float"
    case AvroSchema.Type.DOUBLE => "Double"
    case AvroSchema.Type.BOOLEAN => "Boolean"
    case AvroSchema.Type.STRING => "String"
    case AvroSchema.Type.BYTES | AvroSchema.Type.FIXED => "Array[Byte]"
    case AvroSchema.Type.ARRAY => s"Seq[${scalaType(s.getElementType, fromPkg)}]"
    case AvroSchema.Type.MAP => s"Map[String, ${scalaType(s.getValueType, fromPkg)}]"
    case AvroSchema.Type.RECORD => typeRef(s, fromPkg)
    case AvroSchema.Type.ENUM => typeRef(s, fromPkg) + ".Value"
    case AvroSchema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != AvroSchema.Type.NULL)
      val nullable = s.getTypes.size != nonNull.size
      val inner =
        if (nonNull.size == 1) scalaType(nonNull.head, fromPkg)
        else
          // multi-branch union: mirror the Catalyst member0/member1
          // struct convention (AvroConverters.toSparkType) as a tuple
          // of Options — exactly one member is populated
          nonNull.map(t => s"Option[${scalaType(t, fromPkg)}]")
            .mkString("(", ", ", ")")
      if (nullable) s"Option[$inner]" else inner
    case AvroSchema.Type.NULL => "Null"
  }

  private def defaultFor(f: AvroSchema.Field, fromPkg: String): Option[String] = {
    if (IgnoreDefaults.contains(f.name)) {
      if (f.schema.getType == AvroSchema.Type.UNION &&
        f.schema.getTypes.asScala.exists(_.getType == AvroSchema.Type.NULL))
        Some("None")
      else None
    } else if (f.schema.getType == AvroSchema.Type.UNION &&
      f.schema.getTypes.asScala.headOption
        .exists(_.getType == AvroSchema.Type.NULL))
      Some("None")
    else if (!f.hasDefaultValue) None
    else {
      val d = AvroSchema.Field.NULL_DEFAULT_VALUE
      val v = f.defaultVal()
      (f.schema.getType, v) match {
        case (_, `d`) => Some("None")
        case (AvroSchema.Type.STRING, s: String) => Some("\"" + s + "\"")
        case (AvroSchema.Type.INT, n: java.lang.Integer) => Some(n.toString)
        case (AvroSchema.Type.LONG, n: java.lang.Number) => Some(s"${n.longValue}L")
        case (AvroSchema.Type.FLOAT, n: java.lang.Number) => Some(s"${n.floatValue}f")
        case (AvroSchema.Type.DOUBLE, n: java.lang.Number) => Some(n.doubleValue.toString)
        case (AvroSchema.Type.BOOLEAN, b: java.lang.Boolean) => Some(b.toString)
        case (AvroSchema.Type.ENUM, s: String) =>
          Some(s"${typeRef(f.schema, fromPkg)}.${sanitize(s)}")
        case _ => None
      }
    }
  }

  /** Namespace → Scala package: segments that are keywords or not
    * valid identifiers (the reference's fixtures use hyphenated
    * namespaces like `com.my-namespace`) are backtick-quoted so the
    * emitted file still compiles. */
  private def pkgName(ns: Option[String]): String =
    ns.filter(_.nonEmpty).getOrElse("generated")
      .split('.').map(seg =>
        if (seg.matches("[A-Za-z_][A-Za-z0-9_]*") && !ScalaKeywords(seg)) seg
        else s"`$seg`")
      .mkString(".")

  private def recordSource(s: AvroSchema): String = {
    val pkg = pkgName(Option(s.getNamespace))
    val fields = s.getFields.asScala.map { f =>
      val t = scalaType(f.schema, pkg)
      val default = defaultFor(f, pkg).map(" = " + _).getOrElse("")
      s"  ${sanitize(f.name)}: $t$default"
    }
    val doc = Option(s.getDoc).map(d => s"/** $d */\n").getOrElse("")
    s"""package $pkg
       |
       |${doc}final case class ${sanitize(s.getName)}(
       |${fields.mkString(",\n")})
       |
       |object ${sanitize(s.getName)} {
       |  /** Writer/reader schema this class was generated from. */
       |  val SchemaJson: String =
       |    \"\"\"${s.toString}\"\"\"
       |}
       |""".stripMargin
  }

  private def enumSource(s: AvroSchema): String = {
    val pkg = pkgName(Option(s.getNamespace))
    val symbols = s.getEnumSymbols.asScala
    s"""package $pkg
       |
       |/** Generated from enum ${s.getFullName}. */
       |object ${sanitize(s.getName)} extends Enumeration {
       |${symbols.map(sym => s"  val ${sanitize(sym)}: Value = Value(\"$sym\")").mkString("\n")}
       |}
       |""".stripMargin
  }

  private val ScalaKeywords = Set("type", "class", "object", "def", "val",
    "var", "new", "match", "case", "if", "else", "for", "while", "return",
    "import", "package", "sealed", "final", "implicit", "lazy", "override")

  /** Backtick-quote anything that is not a plain Scala identifier —
    * keywords AND invalid simple names (the lenient Avro parser above
    * admits hyphenated record/field names, which must emit as
    * `` `my-record` ``, never bare). */
  private def sanitize(name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*") && !ScalaKeywords(name)) name
    else s"`$name`"
}
