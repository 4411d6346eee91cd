package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Great-circle geo scalars, reference-parity.
  *
  * Reproduces the reference connector's two scalar functions as native
  * (codegen-friendly) column expressions rather than UDFs:
  *  - initial bearing: reference `calculateBearing` (task.ts:14-27) —
  *    `atan2(sinΔλ·cosφ₂, cosφ₁·sinφ₂ − sinφ₁·cosφ₂·cosΔλ)` in degrees,
  *    normalised `(b+360)%360` into [0, 360);
  *  - haversine distance in meters: reference `calculateDistance`
  *    (task.ts:37-50) with Earth radius R = 6371000 m.
  *
  * Being plain expression trees, these participate in whole-stage codegen
  * and common-subexpression elimination (the reference recomputes the
  * radian conversions in both functions; Catalyst dedupes them for free —
  * SURVEY.md §4.1).
  */
object Geo {
  /** Earth radius in meters, exactly as the reference (task.ts:38). */
  val EarthRadiusM = 6371000.0

  /** Initial great-circle bearing in degrees ∈ [0, 360). */
  def initialBearing(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLon = radians(lon2 - lon1)
    val y = sin(dLon) * cos(radians(lat2))
    val x = cos(radians(lat1)) * sin(radians(lat2)) -
      sin(radians(lat1)) * cos(radians(lat2)) * cos(dLon)
    pmod(degrees(atan2(y, x)) + 360, lit(360))
  }

  /** Haversine great-circle distance in meters. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val halfDLat = radians(lat2 - lat1) / 2
    val halfDLon = radians(lon2 - lon1) / 2
    val a = sin(halfDLat) * sin(halfDLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(halfDLon) * sin(halfDLon)
    lit(2 * EarthRadiusM) * atan2(sqrt(a), sqrt(lit(1) - a))
  }
}
