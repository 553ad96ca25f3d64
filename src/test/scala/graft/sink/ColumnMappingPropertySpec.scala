package graft.sink

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Model-based randomized property for the schema-surgery surface:
  * a random interleaving of append / rename / drop / re-add /
  * checkpoint ops is applied both to the real table and to a pure
  * in-memory model; after every op the logical read must equal the
  * model (columns, order, and multiset of rows), and at the end every
  * recorded version must time-travel back to its model snapshot.
  * Names are drawn from a SMALL pool so drop-then-re-add (the
  * tombstone/fresh-slot path) and rename chains occur constantly.
  */
class ColumnMappingPropertySpec extends SparkSpec {

  private type ModelRow = Map[String, Option[Long]]
  // model: ordered column names + row multiset
  private case class Model(cols: Vector[String], rows: Vector[ModelRow])

  private val pool = Vector("a", "b", "c", "d", "e", "f")

  private def readBack(t: String, v: Option[Long] = None): Model = {
    val df = TxLogTable.read(spark, t, v)
    val cols = df.columns.toVector
    val rows = df.collect().toVector.map { r =>
      cols.map(c => c -> (if (r.isNullAt(r.fieldIndex(c))) None
        else Some(r.getLong(r.fieldIndex(c))))).toMap
    }
    Model(cols, rows)
  }

  private def sortedRows(m: Model): Vector[String] =
    m.rows.map(r => r.toSeq.sortBy(_._1).mkString("|")).sorted

  private def assertSame(actual: Model, model: Model, ctx: String): Unit = {
    assert(actual.cols == model.cols, s"$ctx: column order diverged")
    assert(sortedRows(actual) == sortedRows(model), s"$ctx: rows diverged")
  }

  private def runSeed(seed: Int): Unit = {
    val rnd = new Random(seed)
    val t = Files.createTempDirectory(s"colmap_prop$seed").resolve("t").toString
    var nextId = 0L
    def freshRows(cols: Vector[String], n: Int): Vector[ModelRow] =
      Vector.fill(n) {
        val r = cols.map { c =>
          c -> (if (rnd.nextInt(4) == 0) None else { nextId += 1; Some(nextId) })
        }.toMap
        r
      }
    def appendRows(cols: Vector[String], rows: Vector[ModelRow]): Unit = {
      val schema = StructType(cols.map(c => StructField(c, LongType, nullable = true)))
      val data = rows.map(r => Row.fromSeq(cols.map(c => r(c).map(Long.box).orNull)))
      TxLogTable.append(spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema), t)
    }

    // seed table
    var model = Model(Vector("a", "b"), Vector.empty)
    val first = freshRows(model.cols, 3)
    model = model.copy(rows = first)
    appendRows(model.cols, first)
    val history = scala.collection.mutable.ArrayBuffer(
      (TxLogTable.versions(spark, t).max, model))

    (1 to 22).foreach { step =>
      val free = pool.filterNot(model.cols.contains)
      val op = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => "append"
        case 4 | 5 => if (model.cols.size > 1) "rename" else "append"
        case 6 => if (model.cols.size > 1) "drop" else "append"
        case 7 | 8 => if (free.nonEmpty) "add" else "rename"
        case 9 => "checkpoint"
      }
      op match {
        case "append" =>
          val rows = freshRows(model.cols, 1 + rnd.nextInt(3))
          appendRows(model.cols, rows)
          model = model.copy(rows = model.rows ++ rows)
        case "rename" =>
          val from = model.cols(rnd.nextInt(model.cols.size))
          if (free.isEmpty) () else {
            val to = free(rnd.nextInt(free.size))
            TxLogTable.renameColumn(spark, t, from, to)
            model = Model(model.cols.map(c => if (c == from) to else c),
              model.rows.map(r => (r - from) + (to -> r(from))))
          }
        case "drop" =>
          val victim = model.cols(rnd.nextInt(model.cols.size))
          TxLogTable.dropColumn(spark, t, victim)
          model = Model(model.cols.filterNot(_ == victim),
            model.rows.map(_ - victim))
        case "add" =>
          val name = free(rnd.nextInt(free.size))
          TxLogTable.addColumns(spark, t,
            StructType(Seq(StructField(name, LongType))))
          model = Model(model.cols :+ name,
            model.rows.map(_ + (name -> None)))
        case "checkpoint" =>
          TxLogTable.checkpoint(spark, t)
      }
      if (op != "checkpoint") {
        assertSame(readBack(t), model, s"seed $seed step $step after $op")
        history += ((TxLogTable.versions(spark, t).max, model))
      }
    }

    // every recorded version time-travels back to its model snapshot
    rnd.shuffle(history.toVector).take(6).foreach { case (v, m) =>
      assertSame(readBack(t, Some(v)), m, s"seed $seed time travel v$v")
    }
  }

  test("random rename/drop/re-add/append interleavings match the model (seed 11)") {
    runSeed(11)
  }

  test("random rename/drop/re-add/append interleavings match the model (seed 42)") {
    runSeed(42)
  }
}
