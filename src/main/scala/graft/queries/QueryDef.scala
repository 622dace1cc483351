package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability.
  *
  * @param name   stable key — shows up in CORRECTNESS/BENCH json
  * @param build  DataFrame builder; `dir` is an sf directory such as
  *               `/root/testdata/sf0.01`
  * @param oracle equivalent DuckDB SQL over the same parquet tables
  *               (table names = file stems). `None` → the driver records a
  *               weaker rows-only check (used for ops whose semantics are
  *               not expressible in portable SQL, e.g. mapPartitions-based
  *               feature extraction).
  *
  * Determinism contract (SURVEY §2.3): every float output is ROUNDed, every
  * result set carries a total ORDER BY, LIMIT only after a total order, and
  * column names match the oracle exactly (the driver sorts columns by name
  * before hashing).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])
