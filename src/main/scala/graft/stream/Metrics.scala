package graft.stream

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Per-microbatch lineage/metrics log (north rule: "per-partition
  * lineage/metrics (events applied, dedup drops, merge latency) emitted per
  * microbatch"). Scalars + per-bucket applied counts land in the snapshot
  * JSON (GraftLake.Snapshot.metrics); this is the flat append-only job log,
  * one JSON line per batch, under `<lakeRoot>/_metrics.jsonl`. */
object Metrics {
  def append(lakeRoot: String, m: BatchMetrics): Unit = synchronized {
    val line =
      s"""{"batchId":${m.batchId},"eventsIn":${m.eventsIn},""" +
      s""""watchedRows":${m.watchedRows},"noopDrops":${m.noopDrops},""" +
      s""""dedupDrops":${m.dedupDrops},"applied":${m.applied},""" +
      s""""ddls":${m.ddls},"mergeLatencyMs":${m.mergeLatencyMs},""" +
      s""""affectedBuckets":${m.affectedBuckets},""" +
      s""""statsMs":${m.statsMs},"countMs":${m.countMs},""" +
      s""""writeMs":${m.writeMs},"commitMs":${m.commitMs},""" +
      s""""replayedSkip":${m.replayedSkip}}""" + "\n"
    Files.writeString(Paths.get(lakeRoot, "_metrics.jsonl"), line,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
