package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: scratchpad (not part of the driver contract). Edit
  * freely; keep out of SparkEntry.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("scripting.enabled = " +
      spark.conf.getOption("spark.sql.scripting.enabled"))
    graft.util.Tables.lineitem(spark, d).createOrReplaceTempView("li_script")
    val r = spark.sql(
      """BEGIN
        |  DECLARE thr BIGINT DEFAULT 10;
        |  DECLARE err_flag BIGINT DEFAULT 0;
        |  BEGIN
        |    DECLARE EXIT HANDLER FOR SQLEXCEPTION
        |    BEGIN
        |      SET err_flag = 1;
        |    END;
        |    SELECT 1 DIV 0;
        |  END;
        |  WHILE (SELECT count(*) FROM li_script WHERE l_quantity >= thr)
        |      > (SELECT count(*) DIV 4 FROM li_script) DO
        |    SET thr = thr + 5;
        |  END WHILE;
        |  IF thr > 100 THEN
        |    SET thr = 100;
        |  END IF;
        |  SELECT l_returnflag, thr AS thr_used, err_flag,
        |    count(*) AS n
        |  FROM li_script WHERE l_quantity >= thr
        |  GROUP BY l_returnflag ORDER BY l_returnflag;
        |END""".stripMargin)
    r.show(20, false)
    spark.stop()
  }
}
