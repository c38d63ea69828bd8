package graft.model

/** Global engine settings — parity with the reference's `settings` object
  * (config.py:8-28).
  *
  *  - `shapesGeometryEncoding`: default GeoParquet geometry encoding when
  *    writing shapes ("WKB" or "geoarrow"), consumed as the default of
  *    `RefStoreWriter.write`.
  *  - `largeChunkThresholdBytes`: chunk sizes above this trigger a loud
  *    warning at raster write (models.py:357-399
  *    `_check_chunk_size_not_too_large`): oversized chunks cause low
  *    performance, memory pressure, and compression errors (int32 frame
  *    limits — c-blosc caps frames at 2^31-1 bytes, and our own blosc
  *    header uses int32 sizes). Raise it to suppress the warning.
  *
  * Mutable process-wide knobs, mirroring the reference's dataclass.
  */
object Settings {
  @volatile var shapesGeometryEncoding: String = "WKB"
  @volatile var largeChunkThresholdBytes: Long = Int.MaxValue
}
