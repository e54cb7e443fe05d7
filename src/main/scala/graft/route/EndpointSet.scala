package graft.route

import graft.dedup.Hashes

/** Endpoint-selection policies — the reference's multi-endpoint transport
  * methods re-expressed for a batch engine, where an "endpoint" is one of
  * several equivalent output locations for a sink and selection happens
  * per batch, not per payload:
  *
  *   - `failover` (`lc-lib/publisher/method_failover.go:47-115`):
  *     strictly ordered list, first *healthy* endpoint takes all traffic;
  *   - `loadbalance` (`method_loadbalance.go:32-96`): spread batches
  *     across all healthy endpoints (least-loaded → round-robin by batch
  *     ordinal, since batch loads are uniform here);
  *   - `random` (`method_random.go`, the reference default): pick one
  *     deterministically-seeded endpoint and stick with it until it
  *     fails, then re-pick.
  *
  * Health is supplied by the caller (a batch engine learns failure from
  * the write attempt); selection itself is pure and deterministic so a
  * resumed run re-derives identical routing.
  */
final case class EndpointSet(endpoints: Seq[String], method: String = "random") {
  require(endpoints.nonEmpty, "at least one endpoint required")
  require(Set("failover", "loadbalance", "random").contains(method),
    s"unknown method: $method")

  def pick(batchId: Long, healthy: String => Boolean = _ => true): Option[String] = {
    val live = endpoints.filter(healthy)
    if (live.isEmpty) return None
    method match {
      case "failover" =>
        // highest-priority live endpoint (list order = priority)
        Some(live.head)
      case "loadbalance" =>
        Some(live((batchId % live.length).toInt))
      case "random" =>
        // deterministic "random": seeded hash of the endpoint set; sticky
        // until the picked endpoint is unhealthy (it is then absent from
        // `live` and the next in hash order takes over)
        val ranked = live.sortBy(e => Hashes.mix64(Hashes.fnv64(e)))
        Some(ranked.head)
    }
  }
}
