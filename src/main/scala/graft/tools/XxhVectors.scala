package graft.tools

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Ground-truth vector dump for the bit-exact DuckDB XXH64 mirror in
  * [[graft.queries.Oracle]] (t04's oracle): prints `hashLong` results for
  * 40 seeded random (value, seed) pairs and `hashUnsafeBytes` (seed 42)
  * for fixed strings, covering the <32-byte tail path and one >=32-byte
  * four-lane input. Re-run after any Spark upgrade and re-check the SQL
  * mirror against the output (tools/check_oracle.py does the end-to-end
  * check; this pins the kernel itself). */
object XxhVectors {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val sb = new StringBuilder
    for (_ <- 0 until 40) {
      val v = rnd.nextLong(); val s = rnd.nextLong()
      sb.append(s"L $v $s ${XXH64.hashLong(v, s)}\n")
    }
    for (t <- Seq("", "a", "hello", "hello world", "0123456789abcdef0123456789abcdef0123",
                  "the quick brown fox jumps over the lazy dog")) {
      val u = UTF8String.fromString(t)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      sb.append(s"B ${java.util.Base64.getEncoder.encodeToString(t.getBytes("UTF-8"))} $h\n")
    }
    print(sb.toString)
  }
}
