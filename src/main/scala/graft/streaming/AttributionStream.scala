package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Click→purchase attribution as a NATIVE stream-stream interval join —
  * the one Structured Streaming join shape the rest of the streaming tier
  * does not exercise (Sessions/DedupStream/ScdStream/BurstStream are all
  * `flatMapGroupsWithState`; SearchStream is stream-STATIC). Two live
  * event streams join on user with an event-time range condition; Spark
  * buffers each side's tail in watermark-bounded join state and emits a
  * pair the moment both halves exist — no custom state code at all.
  *
  * Semantics are pinned to [[graft.ops.TemporalJoin.rangeJoin]]: emit
  * (purchase, click) pairs with equal `user_id` and click `c_ts` in
  * `[p_ts − horizon, p_ts)` — half-open, so an exactly-simultaneous click
  * does NOT match (it could not have caused the purchase). StreamingSpec
  * pins the drained stream's pair set == the batch rangeJoin rows.
  *
  * Scale shape: state per side is bounded by horizon × arrival rate (the
  * watermark lets Spark evict clicks older than any future purchase's
  * window and purchases past their own window), and the join itself is
  * key-partitioned on `user_id` — the standard distributed shape. The
  * last-touch reduction (latest matching click per purchase) is the batch
  * q245 composition's job; the stream emits the raw within-horizon pairs.
  *
  * Reference behavior analogue: the reference's indexer reacts to store
  * changes as they arrive (`Indexer/Calls.cs` interval scheduling); a
  * live join between two arriving feeds is its two-feed generalization.
  */
object AttributionStream {

  /** `clicks`: (user_id: Long, c_ts: Timestamp, channel: Long);
    * `purchases`: (user_id: Long, p_ts: Timestamp, cents: Long).
    * Returns (user_id, p_ts, cents, c_ts, channel) pairs, append mode.
    * `horizonSec` is both the join window and the watermark delay.
    */
  def pairs(clicks: DataFrame, purchases: DataFrame,
            horizonSec: Long): DataFrame = {
    require(horizonSec > 0, s"horizonSec must be positive, got $horizonSec")
    val c = clicks
      .select(col("user_id").as("c_user"), col("c_ts"), col("channel"))
      .withWatermark("c_ts", s"$horizonSec seconds")
    val p = purchases.withWatermark("p_ts", s"$horizonSec seconds")
    p.join(c,
        col("c_user") === col("user_id") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizonSec SECONDS") &&
          col("c_ts") < col("p_ts"))
      .select(col("user_id"), col("p_ts"), col("cents"),
        col("c_ts"), col("channel"))
  }
}
