package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Shared parquet footer opener (r19). `ParquetFileReader.open(file)`
  * without options builds its ParquetReadOptions over a FRESH
  * `new Configuration()` — which lazily re-reads core-default.xml &
  * co out of the hadoop jar (inflate + StAX parse, ~10-20 ms) on
  * EVERY footer open. The driver's metadata plane opens footers
  * constantly (withKeyEnvs, merge envelopes, row counts, fsck), so the
  * engine-wide rule is: always open with the session's Configuration
  * threaded through HadoopReadOptions. JobProbe's gap profile showed
  * the XML parse as the single largest attributable driver-gap frame
  * on the write gates.
  */
object Footers {
  def open(conf: Configuration, p: Path): ParquetFileReader =
    ParquetFileReader.open(HadoopInputFile.fromPath(p, conf),
      org.apache.parquet.HadoopReadOptions.builder(conf, p).build())
}
