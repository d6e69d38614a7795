package graft.feed

import graft.feed.BinlogFeedGen._
import graft.model.Op

import scala.collection.mutable

/** Independent single-threaded replay oracle.
  *
  * Computes the expected final table state by folding the (deterministic)
  * feed in offset order with one state map — exactly the reference's
  * effective semantics: one consumer thread per table applying events in
  * seqId order (reference:
  * client/akkaSystem/SingleTableBinlogClientActor.java:83-91;
  * server/infoPersistent/BinlogDataStorageWithLevelDB.java:156-260).
  *
  * It shares only the *pure generator functions* with the engine-side feed
  * (so images match byte-for-byte) — none of the engine's dedup/merge code,
  * which is what makes it an oracle. Duplicated replay files in the feed
  * collapse naturally: each global index is folded once.
  */
object ReplayOracle {

  final case class OracleRow(
      repo: String, path: String, commit: String, lang: String,
      content: String, size: Option[Long],
      offsetFileIdx: Long, offsetPos: Long, offsetRowIdx: Long,
      /** raw evolved-column values, keyed by SOURCE column name */
      extras: Map[String, String] = Map.empty)

  /** Final state of one table after a full replay.
    * @param forDecoyTable fold the decoy (second watched) table's events
    *   instead — the multi-table routing oracle (D1)
    * @param eventFilter extra per-event accept predicate — the F4 oracle;
    *   receives (op, before-image, after-image), both images nullable */
  def finalStateFor(cfg: FeedConfig,
      excludedCols: Set[String] = Set("commit"),
      forDecoyTable: Boolean = false,
      eventFilter: (String, Option[graft.model.RepoFile], Option[graft.model.RepoFile]) => Boolean =
        (_, _, _) => true): Vector[OracleRow] = {
    val verOf = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val state = mutable.Map.empty[(String, String), OracleRow]
    var i = 0L
    while (i < cfg.nEvents) {
      if (!cfg.ddlAt.contains(i)) {
        val decoy = isDecoy(cfg, i)
        val kid = if (decoy) keyId(cfg, i) + cfg.nKeys else keyId(cfg, i)
        val ver = verOf(kid) + 1
        verOf(kid) = ver
        if (decoy == forDecoyTable) { // F1: the other table's events drop
          val op = opOf(cfg, kid, ver)
          val before = if (ver > 1 && op != Op.Insert) Some(image(cfg, kid, ver - 1)) else None
          val after = if (op != Op.Delete) Some(image(cfg, kid, ver)) else None
          if (eventFilter(op, before, after)) { // F4
            val key = (repoOf(kid), pathOf(kid))
            val off = offsetOf(cfg, i)
            op match {
              case Op.Delete => state.remove(key)
              case _ =>
                // F3: suppression compares base images minus excluded cols,
                // for ANY excluded set. Between consecutive versions of one
                // key, repo/path/lang never differ, commit ALWAYS differs,
                // and content differs iff the generator's no-op draw says
                // so — hence: suppressed ⇔ UPDATE whose differing columns
                // ⊆ excluded. Extras-carrying events are NEVER suppressed
                // (no before-image exists for evolved columns, so the
                // engine cannot prove them no-ops — FeedReader.isNoop).
                val suppressed = op == Op.Update && excludedCols.contains("commit") &&
                  (excludedCols.contains("content") || isNoop(cfg, kid, ver)) &&
                  extrasOf(cfg, kid, ver, i).isEmpty
                if (!suppressed) {
                  // decoy-table events carry no extras (buildEvent parity)
                  val extras =
                    if (decoy) Map.empty[String, String]
                    else extrasOf(cfg, kid, ver, i).getOrElse(Map.empty)
                  state(key) = OracleRow(key._1, key._2,
                    commitOf(cfg, kid, ver), langOf(kid),
                    contentOf(cfg, kid, ver), extras.get("size").map(_.toLong),
                    off.fileIdx, off.pos, off.rowIdx, extras)
                }
            }
          }
        }
      }
      i += 1
    }
    state.values.toVector.sortBy(r => (r.repo, r.path))
  }

  def finalState(cfg: FeedConfig,
      excludedCols: Set[String] = Set("commit")): Vector[OracleRow] =
    finalStateFor(cfg, excludedCols)

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
