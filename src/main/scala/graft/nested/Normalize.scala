package graft.nested

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive JSON normalization (SURVEY §2.5 N1-N5) — the reference's core
  * competency, re-expressed schema-first.
  *
  * The reference (`ct_utils.py:54-180`) decides what to explode by scanning
  * every CELL of the frame (`applymap(type) == list`), then runs a 4-step
  * explode → dropna → json_normalize → index-join dance per list column, in a
  * fixpoint loop until only scalars remain ("form suitable for DWH",
  * `ct_utils.py:164-166`).
  *
  * Here the fixpoint recurses over `df.schema` — O(#fields) driver-side
  * metadata, zero data scans — and emits standard `explode_outer` + flatten
  * `select`s, which Catalyst then optimizes as one plan:
  *   - ArrayType column  → `explode_outer` (null/empty arrays survive as a
  *     null row, matching the reference's dropna + left-join-back trick,
  *     `ct_utils.py:83-93`, in a single primitive)
  *   - StructType column → one flattening projection per nesting level,
  *     children renamed `parent__child` (the reference's
  *     `json_normalize(...).add_prefix(col + "__")`, `ct_utils.py:86`)
  *   - exclusion list (N5, `ct_utils.py:59-61`): caller-named columns are
  *     never exploded/flattened — the reference's cardinality-control knob —
  *     and can optionally be serialized to JSON strings for scalar-only sinks.
  *
  * Scale: each `explode_outer` multiplies rows but stays narrow (no shuffle);
  * flattening is pure projection. For adversarially deep schemas the emitted
  * plan grows linearly in total field count; `maxRounds` caps runaway
  * recursion and `checkpointEvery` (optional) bounds Catalyst plan size for
  * very deep documents (SURVEY §7.3).
  */
object Normalize {

  /** N1 — list-column detector, schema-driven: names of top-level ArrayType
    * columns minus exclusions. The reference's full-frame type scan
    * (`ct_utils.py:54-68`) becomes O(#columns) metadata.
    */
  def listColumns(df: DataFrame, exclude: Set[String] = Set.empty): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] && !exclude(f.name) => f.name
    }.toSeq

  /** Top-level StructType columns minus exclusions. */
  def structColumns(df: DataFrame, exclude: Set[String] = Set.empty): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[StructType] && !exclude(f.name) => f.name
    }.toSeq

  /** N3 — flatten every top-level struct one level, `parent__child` naming.
    * Non-struct columns pass through untouched. Pure projection — no shuffle.
    */
  def flattenOnce(df: DataFrame, exclude: Set[String] = Set.empty, sep: String = "__"): DataFrame = {
    // collision-safe naming: a flattened `parent__child` may collide with an
    // existing column (source data may legitimately contain `__` in names);
    // an ambiguous duplicate would poison every later select. Deterministic
    // uniquification: append `_2`, `_3`, ... in field order.
    val taken = scala.collection.mutable.HashSet[String](df.columns: _*)
    df.schema.fields.foreach(f => if (f.dataType.isInstanceOf[StructType] && !exclude(f.name))
      taken -= f.name) // struct parents disappear after the flatten
    def unique(name: String): String = {
      var cand = name
      var i = 2
      while (taken(cand)) { cand = s"${name}_$i"; i += 1 }
      taken += cand
      cand
    }
    val cols: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType if !exclude(f.name) =>
          st.fields.toSeq.map(sf =>
            col(s"`${f.name}`.`${sf.name}`").alias(unique(s"${f.name}$sep${sf.name}")))
        case _ => Seq(col(s"`${f.name}`"))
      }
    }
    df.select(cols: _*)
  }

  /** N2 — null-preserving explode of one array column (replaces the
    * reference's explode/dropna/normalize/index-join/left-join pipeline,
    * `ct_utils.py:71-99`, with the single built-in `explode_outer`).
    */
  def explodeColumn(df: DataFrame, column: String): DataFrame =
    df.withColumn(column, explode_outer(col(s"`$column`")))

  /** N2 legacy — inner explode (rows with null/empty arrays are DROPPED),
    * the behavior of the legacy generation's concat path
    * (`commercetools_utils.py:72`). Kept for back-compat parity.
    */
  def explodeColumnInner(df: DataFrame, column: String): DataFrame =
    df.withColumn(column, explode(col(s"`$column`")))

  /** N4 — recursive normalize-to-flat fixpoint (`ct_utils.py:161-180`):
    * explode + flatten until the schema holds only scalars (excluded columns
    * aside). Deterministic and data-independent because it is schema-driven.
    *
    * MapType contract: maps are deliberately NOT structurally flattened —
    * their keys are DATA, not schema (N7's `element_at`/`check_for_key` is
    * the access path), so a schema-driven fixpoint cannot expand them
    * deterministically. A frame containing maps therefore only satisfies
    * [[isFlat]] when `serializeExcluded = true` (maps become JSON strings,
    * like excluded arrays/structs) — pass it whenever a strictly scalar
    * DWH-shaped output is required.
    *
    * @param serializeExcluded if true, surviving complex columns (excluded
    *        arrays/structs, and all maps) are `to_json`-serialized so the
    *        output is strictly scalar (DWH-shaped)
    */
  def normalize(
      df: DataFrame,
      exclude: Set[String] = Set.empty,
      sep: String = "__",
      maxRounds: Int = 50,
      serializeExcluded: Boolean = false
  ): DataFrame = {
    var cur = df
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      changed = false
      // explode all current array columns (one at a time: each explode is a
      // Generate node; successive Generates chain fine in one stage)
      val arrays = listColumns(cur, exclude)
      if (arrays.nonEmpty) {
        arrays.foreach(c => cur = explodeColumn(cur, c))
        changed = true
      }
      // flatten all current struct columns one level
      if (structColumns(cur, exclude).nonEmpty) {
        cur = flattenOnce(cur, exclude, sep)
        changed = true
      }
      round += 1
    }
    if (serializeExcluded) {
      val stillComplex = cur.schema.fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType])
      stillComplex.foldLeft(cur)((d, f) => d.withColumn(f.name, to_json(col(s"`${f.name}`"))))
    } else cur
  }

  /** True iff the frame is flat (no array/struct/map outside `exclude`) —
    * the reference's loop condition (`ct_utils.py:164-166`).
    */
  def isFlat(df: DataFrame, exclude: Set[String] = Set.empty): Boolean =
    df.schema.fields.forall { f =>
      exclude(f.name) || (f.dataType match {
        case _: ArrayType | _: StructType | _: MapType => false
        case _                                          => true
      })
    }
}
