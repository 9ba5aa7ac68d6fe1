package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compound-particle full-name splitting (reference `separar_nombres`,
  * capital_sendas.py:277-315).
  *
  * The reference walks tokens left-to-right, gluing the particles
  * DE / DEL / LA / LOS onto the FOLLOWING token ("MARIA DE LA CRUZ
  * PEREZ" → [MARIA, "DE LA CRUZ", PEREZ]), then maps part-count to
  * (nombre1, nombre2, apellido1, apellido2). A trailing particle run
  * has no following token and is dropped.
  *
  * Re-expressed as pure Column regex/array expressions (codegen'd, no
  * UDF): particles are glued with a marker char via a few passes of a
  * global regexp_replace (pass N handles particle-runs of length N —
  * the engine can't rescan a consumed separator), the glued string is
  * split on spaces, and the part-count dispatch is a CASE over array
  * slices. Runs longer than 4 particles are not glued further (the
  * reference's real data tops out at 2).
  */
object Names {

  private val P = "(DE|DEL|LA|LOS)"
  private val Glue = "#"

  /** Particle-glued parts array for an upper-case full name. */
  def nameParts(name: Column): Column = {
    // 1. drop a trailing particle run (reference leaves it pending)
    val t1 = regexp_replace(name, s"( $P)+$$", "")
    val t2 = when(t1.rlike(s"^$P( $P)*$$"), lit("")).otherwise(t1)
    // 2. glue particles to the following token; 4 passes handle runs ≤ 4
    val glued = (1 to 4).foldLeft(t2) { (s, _) =>
      regexp_replace(s, s"(^| |$Glue)$P ", s"$$1$$2$Glue")
    }
    filter(split(glued, " "), p => p =!= "")
  }

  private def partAt(parts: Column, i: Column): Column =
    translate(element_at(parts, i), Glue, " ")

  /** (nombre1, nombre2, apellido1, apellido2) as a 4-field struct.
    * Dispatch matches the reference exactly for n ∈ {1,2,3,4,>4}; an
    * all-particle / empty name yields four empty strings (the
    * reference would throw — we degrade gracefully). */
  def splitFullName(name: Column): Column = {
    val parts = nameParts(name)
    val n = size(parts)
    val joinMid = // parts[1:-2] joined by spaces (n > 4 case)
      translate(array_join(slice(parts, lit(2), greatest(n - 3, lit(0))), " "),
        Glue, " ")
    val empty = lit("")
    struct(
      when(n >= 1, partAt(parts, lit(1))).otherwise(empty).as("nombre1"),
      when(n === 4, partAt(parts, lit(2)))
        .when(n > 4, joinMid).otherwise(empty).as("nombre2"),
      when(n === 2, partAt(parts, lit(2)))
        .when(n === 3, partAt(parts, lit(2)))
        .when(n >= 4, partAt(parts, n - 1)).otherwise(empty).as("apellido1"),
      when(n === 3, partAt(parts, lit(3)))
        .when(n >= 4, partAt(parts, n)).otherwise(empty).as("apellido2"))
  }
}
