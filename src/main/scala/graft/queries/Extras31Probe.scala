package graft.queries
// scratch access shim for ProfTmp — NOT committed
import org.apache.spark.sql.DataFrame
object Extras31Probe {
  def aHash(df: DataFrame): DataFrame = Extras31.aHash60(df)
  def mut = Extras31.mutMidChar
}
