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
      offsetFileIdx: Long, offsetPos: Long, offsetRowIdx: Long)

  def finalState(cfg: FeedConfig,
      excludedCols: Set[String] = Set("commit")): Vector[OracleRow] = {
    val verOf = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val state = mutable.Map.empty[(String, String), OracleRow]
    var i = 0L
    while (i < cfg.nEvents) {
      if (!cfg.ddlAt.contains(i)) {
        val decoy = isDecoy(cfg, i)
        val kid = if (decoy) keyId(cfg, i) + cfg.nKeys else keyId(cfg, i)
        val ver = verOf(kid) + 1
        verOf(kid) = ver
        if (!decoy) { // F1: unwatched table dropped
          val op = opOf(cfg, kid, ver)
          val key = (repoOf(kid), pathOf(kid))
          val off = offsetOf(cfg, i)
          op match {
            case Op.Delete => state.remove(key)
            case _ =>
              // F3: suppression compares base images minus excluded cols —
              // with excluded = {commit}, that is exactly the generator's
              // isNoop (content/lang/repo/path unchanged).
              val suppressed = op == Op.Update && excludedCols == Set("commit") &&
                isNoop(cfg, kid, ver)
              if (!suppressed) {
                val size = sizeExtraOf(cfg, kid, ver, i).map(_("size").toLong)
                state(key) = OracleRow(key._1, key._2,
                  commitOf(cfg, kid, ver), langOf(kid),
                  contentOf(cfg, kid, ver), size,
                  off.fileIdx, off.pos, off.rowIdx)
              }
          }
        }
      }
      i += 1
    }
    state.values.toVector.sortBy(r => (r.repo, r.path))
  }

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
