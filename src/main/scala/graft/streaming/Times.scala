package graft.streaming

import java.sql.Timestamp

/** The one µs ⇄ Timestamp conversion pair for the streaming package —
  * keyed state, replay sorting, and chunk staging all reason in epoch
  * micros, and a precision fix must hit every user at once or the
  * replay bit-parity gate reports a phantom engine divergence.
  *
  * `tsFromMicros` keeps full µs fidelity: `new Timestamp(us / 1000)`
  * would truncate to ms, so seconds go through the ctor and the
  * sub-second part through setNanos (which replaces the whole field).
  * Closures use these via static module access — nothing is captured. */
private[streaming] object Times {
  def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
