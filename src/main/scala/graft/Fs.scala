package graft

import java.nio.file.{Files, Path}

/** Filesystem helpers shared by the staging paths (the wave tier's
  * staged pair artifacts in `TextOps.stagedPairScan` and the Z-order
  * layout staging in `ScaleOps.stageZorderedLineitem`). */
private[graft] object Fs {

  /** Recursive delete. Uses `Files.walk` with an explicit close so
    * repeated staging runs don't leak a directory handle per level
    * (`Files.list` returns a stream backed by an open DirectoryStream
    * that must be closed). Deepest-first via reverse path order. */
  def rmTree(p: Path): Unit = if (Files.exists(p)) {
    val s = Files.walk(p)
    try
      s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach((f: Path) => Files.delete(f))
    finally s.close()
  }
}
