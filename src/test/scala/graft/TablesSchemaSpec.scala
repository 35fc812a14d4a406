package graft

import org.apache.spark.sql.types._

/** Fixture-schema canary: pins the LOGICAL schema the engine expects for
  * every harness table at sf0.001, so a silent testdata regeneration fails
  * HERE with one readable message instead of as a dozen confusing
  * DATATYPE_MISMATCH analysis errors scattered across query suites
  * (round-6 postmortem: `events.ts` flipped TIMESTAMP(NANOS) →
  * timestamp[us] and took out 46 queries + 13 tests before anything named
  * the root cause).
  *
  * On mismatch the failure message prints the full observed schema of the
  * offending table — that IS the diagnosis.
  */
class TablesSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def check(name: String, df: org.apache.spark.sql.DataFrame,
      expected: Map[String, Set[DataType]]): Unit = {
    val observed = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val problems = expected.flatMap { case (colName, okTypes) =>
      observed.get(colName) match {
        case None => Some(s"missing column `$colName` (expected one of ${okTypes.mkString("/")})")
        case Some(dt) if !okTypes.contains(dt) =>
          Some(s"column `$colName` is $dt, expected one of ${okTypes.mkString("/")}")
        case _ => None
      }
    }
    assert(problems.isEmpty,
      s"\nFIXTURE SCHEMA DRIFT in `$name` at $sf:\n  " + problems.mkString("\n  ") +
        s"\nFull observed schema:\n${df.schema.treeString}" +
        "\nIf the harness regenerated the fixture with a new encoding, adapt the" +
        " loader in Tables.scala (one place), not the downstream queries.")
  }

  test("events physical schema (raw scan) is a known encoding") {
    val raw = Tables.load(spark, sf, "events")
    // `ts` has shipped as TIMESTAMP(NANOS)→Long (nanosAsLong) and as
    // timestamp[us]→TIMESTAMP_NTZ; both are adapted in Tables.events.
    check("events(raw)", raw, Map(
      "event_id"   -> Set[DataType](LongType),
      "ts"         -> Set[DataType](LongType, TimestampType, TimestampNTZType),
      "user_id"    -> Set[DataType](LongType),
      "event_type" -> Set[DataType](StringType),
      "value"      -> Set[DataType](DoubleType),
      "props"      -> Set[DataType](StringType)))
  }

  test("events loader always yields canonical ts_ms/ts_utc clocks") {
    val ev = Tables.events(spark, sf)
    check("events(loader)", ev, Map(
      "ts_ms"  -> Set[DataType](LongType),
      "ts_utc" -> Set[DataType](TimestampType)))
    // Sanity on values, not just types: ms clock must be the µs clock/1000.
    import org.apache.spark.sql.functions._
    val bad = ev.filter(expr("ts_ms != unix_micros(ts_utc) div 1000")).count()
    assert(bad == 0L, "ts_ms and ts_utc disagree — clock derivation broken")
  }

  // Timestamp-bearing relational columns: the fixtures store timestamp[us];
  // depending on inferTimestampNTZ either TimestampType or NTZ arrives —
  // queries are verified green under both, so both are "known".
  private val tsTypes = Set[DataType](TimestampType, TimestampNTZType)

  test("relational tables keep their expected key/measure types") {
    check("lineitem", Tables.lineitem(spark, sf), Map(
      "l_orderkey"      -> Set[DataType](LongType),
      "l_partkey"       -> Set[DataType](LongType),
      "l_suppkey"       -> Set[DataType](LongType),
      "l_quantity"      -> Set[DataType](DoubleType),
      "l_extendedprice" -> Set[DataType](DoubleType),
      "l_discount"      -> Set[DataType](DoubleType),
      "l_returnflag"    -> Set[DataType](StringType),
      "l_shipdate"      -> tsTypes))
    check("orders", Tables.orders(spark, sf), Map(
      "o_orderkey"  -> Set[DataType](LongType),
      "o_custkey"   -> Set[DataType](LongType),
      "o_orderdate" -> tsTypes))
    // Dim keys are int32 in the fixtures (nation/region cardinality);
    // fact-side keys are int64 — joins cast implicitly, both are "known".
    check("customer", Tables.customer(spark, sf), Map(
      "c_custkey"   -> Set[DataType](LongType),
      "c_nationkey" -> Set[DataType](IntegerType, LongType)))
    check("supplier", Tables.supplier(spark, sf), Map(
      "s_suppkey"   -> Set[DataType](LongType),
      "s_nationkey" -> Set[DataType](IntegerType, LongType)))
    check("part", Tables.part(spark, sf), Map(
      "p_partkey" -> Set[DataType](LongType)))
    check("nation", Tables.nation(spark, sf), Map(
      "n_nationkey" -> Set[DataType](IntegerType, LongType),
      "n_regionkey" -> Set[DataType](IntegerType, LongType)))
    check("region", Tables.region(spark, sf), Map(
      "r_regionkey" -> Set[DataType](IntegerType, LongType)))
  }

  test("documents and embeddings keep their expected shapes") {
    check("documents", Tables.documents(spark, sf), Map(
      "doc_id"  -> Set[DataType](LongType),
      "text"    -> Set[DataType](StringType),
      "lang"    -> Set[DataType](StringType),
      "source"  -> Set[DataType](StringType),
      "n_chars" -> Set[DataType](LongType)))
    check("embeddings", Tables.embeddings(spark, sf), Map(
      "vec_id"    -> Set[DataType](LongType),
      "label"     -> Set[DataType](IntegerType, LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false))))
  }
}
