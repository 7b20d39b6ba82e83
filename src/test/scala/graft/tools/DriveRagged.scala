package graft.tools
import graft.GraftSession
object DriveRagged {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("drive-ragged")
    spark.sql(
      """SELECT cosine_similarity(array(1.0f,2.0f,3.0f), array(1.0f,2.0f)) AS ragged,
        |       cosine_similarity(array(1.0f,2.0f), array(1.0f,2.0f)) AS ok""".stripMargin).show()
    spark.stop()
  }
}
