package graft.plans

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._

/** NOT NULL / CHECK / DEFAULT constraints on snapshot tables — the engine
  * analog of Hive's enforced constraint surface (NOT NULL, CHECK, DEFAULT)
  * and informational PK/FK/UNIQUE declarations (RELY NOVALIDATE).
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def sql(q: String) = Engine.sql(spark, sfDir, q)

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"n$i", i * 10.0)).toDF("id", "name", "amount")

  test("CHECK rejects violating appends, accepts valid ones, NULL passes") {
    val root = scratch("graft_cons_")
    val t = Snapshots.create(spark, root, rows(0, 10))
    t.addCheck("amount_nonneg", "amount >= 0")
    t.append(rows(10, 15)) // valid
    val e = intercept[Snapshots.ConstraintViolationException] {
      t.append(Seq((99L, "bad", -5.0)).toDF("id", "name", "amount"))
    }
    assert(e.getMessage.contains("amount_nonneg"))
    assert(t.read().count() === 15) // nothing staged from the rejected batch
    // SQL CHECK semantics: NULL is not a violation
    t.append(Seq((100L, "nullamt", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "name", "amount"))
    assert(t.read().count() === 16)
  }

  test("adding a CHECK that existing rows violate fails and is not published") {
    val root = scratch("graft_cons_")
    val t = Snapshots.create(spark, root, rows(0, 10))
    intercept[Snapshots.ConstraintViolationException] {
      t.addCheck("id_small", "id < 5")
    }
    assert(t.constraints().checks.isEmpty)
    t.append(Seq((999L, "big", 1.0)).toDF("id", "name", "amount")) // unconstrained
  }

  test("NOT NULL blocks null writes; setNotNull validates existing data") {
    val root = scratch("graft_cons_")
    val t = Snapshots.create(spark, root, rows(0, 5))
    t.setNotNull("name")
    intercept[Snapshots.ConstraintViolationException] {
      t.append(Seq((9L, null.asInstanceOf[String], 1.0))
        .toDF("id", "name", "amount"))
    }
    // existing nulls block the declaration
    val t2 = Snapshots.create(spark, scratch("graft_cons_"),
      Seq((1L, null.asInstanceOf[String], 1.0)).toDF("id", "name", "amount"))
    intercept[Snapshots.ConstraintViolationException] { t2.setNotNull("name") }
    assert(t2.constraints().notNull.isEmpty)
  }

  test("UPDATE and MERGE post-images are validated; DELETE is exempt") {
    val root = scratch("graft_cons_")
    val t = Snapshots.create(spark, root, rows(0, 10))
    t.addCheck("amount_nonneg", "amount >= 0")
    intercept[Snapshots.ConstraintViolationException] {
      t.updateWhere(col("id") === 3, Map("amount" -> lit(-1.0)))
    }
    assert(t.read().filter($"id" === 3).head.getDouble(2) === 30.0)
    intercept[Snapshots.ConstraintViolationException] {
      t.updateWhereMergeOnRead(col("id") === 3, Map("amount" -> lit(-1.0)))
    }
    intercept[Snapshots.ConstraintViolationException] {
      t.merge(Seq((100L, "m", -4.0)).toDF("id", "name", "amount"), "id", "id")
    }
    t.deleteWhere(col("id") === 9) // fine
    assert(t.read().count() === 9)
    t.merge(Seq((100L, "m", 4.0)).toDF("id", "name", "amount"), "id", "id")
    assert(t.read().count() === 10)
  }

  test("SQL surface: CREATE with constraints, DEFAULT fill, ALTER/DROP, SHOW CREATE") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cons_sql_").toString
    sql(s"""CREATE TABLE cons_t (
           |  id BIGINT NOT NULL,
           |  name STRING,
           |  amount DOUBLE DEFAULT 7.5,
           |  CONSTRAINT amt_ok CHECK (amount >= 0))
           |USING snapshot LOCATION '$dir/t'""".stripMargin)
    val t = Snapshots.table(spark, s"$dir/t")
    assert(t.constraints().notNull === Seq("id"))
    assert(t.constraints().checks === Map("amt_ok" -> "amount >= 0"))
    assert(t.constraints().defaults === Map("amount" -> "7.5"))

    // DEFAULT applies to OMITTED columns in a column-list INSERT
    sql("INSERT INTO cons_t (id, name) VALUES (1, 'a'), (2, 'b')")
    assert(sql("SELECT amount FROM cons_t").as[Double].collect().toSet === Set(7.5))
    // enforced NOT NULL via SQL
    val e1 = intercept[Snapshots.ConstraintViolationException] {
      sql("INSERT INTO cons_t (name) VALUES ('noid')")
    }
    assert(e1.getMessage.contains("NOT NULL"))
    // enforced CHECK via SQL
    intercept[Snapshots.ConstraintViolationException] {
      sql("INSERT INTO cons_t (id, name, amount) VALUES (3, 'c', -1.0)")
    }

    // ALTER COLUMN SET DEFAULT / DROP DEFAULT, SET NOT NULL / DROP NOT NULL
    sql("ALTER TABLE cons_t ALTER COLUMN name SET DEFAULT 'unnamed'")
    sql("INSERT INTO cons_t (id) VALUES (4)")
    assert(sql("SELECT name FROM cons_t WHERE id = 4").head.getString(0) === "unnamed")
    sql("ALTER TABLE cons_t ALTER COLUMN name DROP DEFAULT")
    sql("INSERT INTO cons_t (id) VALUES (5)")
    assert(sql("SELECT name FROM cons_t WHERE id = 5").head.isNullAt(0))
    sql("ALTER TABLE cons_t ALTER COLUMN id DROP NOT NULL")
    sql("INSERT INTO cons_t (name) VALUES ('noid')") // now fine
    sql("DELETE FROM cons_t WHERE id IS NULL")
    sql("ALTER TABLE cons_t ALTER COLUMN id SET NOT NULL")

    // ADD / DROP CONSTRAINT
    sql("ALTER TABLE cons_t ADD CONSTRAINT id_pos CHECK (id > 0)")
    intercept[Snapshots.ConstraintViolationException] {
      sql("INSERT INTO cons_t (id, name) VALUES (-1, 'neg')")
    }
    sql("ALTER TABLE cons_t DROP CONSTRAINT id_pos")
    sql("INSERT INTO cons_t (id, name) VALUES (-1, 'neg')")

    // informational PK + DESCRIBE + SHOW CREATE TABLE
    sql("ALTER TABLE cons_t ADD CONSTRAINT pk_id PRIMARY KEY (id)")
    val desc = sql("DESCRIBE TABLE cons_t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(desc.contains(("id", "NOT NULL", "enforced")))
    assert(desc.contains(("amt_ok", "CHECK (amount >= 0)", "enforced")))
    assert(desc.contains(("pk_id", "PRIMARY KEY (id)", "informational")))
    val stmt = sql("SHOW CREATE TABLE cons_t").head.getString(0)
    assert(stmt.contains("id BIGINT NOT NULL"))
    assert(stmt.contains("CONSTRAINT amt_ok CHECK (amount >= 0)"))
    assert(stmt.contains("CONSTRAINT pk_id PRIMARY KEY (id)"))
    assert(stmt.contains("USING snapshot"))
    NamedTables.drop("cons_t")
  }

  test("SHOW CREATE TABLE for a registered parquet path") {
    val path = scratch("graft_cons_pq_")
    rows(0, 5).write.parquet(path)
    NamedTables.registerPath("cons_pq", path)
    val stmt = sql("SHOW CREATE TABLE cons_pq").head.getString(0)
    assert(stmt.contains("CREATE TABLE cons_pq"))
    assert(stmt.contains("USING parquet"))
    assert(stmt.contains(path))
    NamedTables.drop("cons_pq")
  }

  test("constraint referencing a dropped column is skipped, not fatal") {
    val root = scratch("graft_cons_")
    val t = Snapshots.create(spark, root, rows(0, 5))
    t.addCheck("amount_nonneg", "amount >= 0")
    t.dropColumn("amount")
    t.append(Seq((7L, "g")).toDF("id", "name")) // no amount column anymore
    assert(t.read().count() === 6)
    // DROP COLUMN cascaded: the unenforceable check is gone from the sidecar
    assert(t.constraints().checks.isEmpty)
  }

  test("differently-cased and qualified CHECK spellings still enforce") {
    val root = scratch("graft_cons_")
    val t = Snapshots.create(spark, root, rows(0, 5))
    t.addCheck("upper_spelling", "AMOUNT >= 0") // column is 'amount'
    intercept[Snapshots.ConstraintViolationException] {
      t.append(Seq((9L, "bad", -1.0)).toDF("id", "name", "amount"))
    }
    t.dropCheck("upper_spelling")
    // a qualified spelling cannot resolve against the table frame — it is
    // rejected LOUDLY at declaration, never stored as a silent no-op
    intercept[Exception] { t.addCheck("qualified", "t.amount >= 0") }
    assert(t.constraints().checks.isEmpty)
  }

  test("a zero-row write to a constrained table is a clean no-op") {
    val root = scratch("graft_cons_")
    val t = Snapshots.create(spark, root, rows(0, 5))
    t.addCheck("amount_nonneg", "amount >= 0")
    t.setNotNull("id")
    t.append(rows(0, 5).filter(lit(false))) // empty batch: no NPE, no reject
    assert(t.read().count() === 5)
  }

  test("RENAME COLUMN carries NOT NULL, CHECK, and DEFAULT along") {
    val root = scratch("graft_cons_")
    val t = Snapshots.create(spark, root, rows(0, 5))
    t.setNotNull("amount")
    t.addCheck("amount_nonneg", "amount >= 0")
    t.setDefault("amount", "1.5")
    t.renameColumn("amount", "price")
    val c = t.constraints()
    assert(c.notNull === Seq("price"))
    assert(c.defaults.keySet === Set("price"))
    assert(c.checks("amount_nonneg").toLowerCase.contains("price"))
    // and the rewritten check still ENFORCES on the new name
    intercept[Snapshots.ConstraintViolationException] {
      t.append(Seq((9L, "bad", -1.0)).toDF("id", "name", "price"))
    }
    t.append(Seq((9L, "ok", 2.0)).toDF("id", "name", "price"))
    assert(t.read().count() === 6)
  }
}
