package graft.serializers

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.engine.FeatureSchema

/** Browser-facing HTML rendering (F6, geoservices/html.py:37-307): service
  * directory, layer page, and query-result table — the `f=html`
  * content-negotiation branch. Pure string templating over the same
  * metadata/rows every other serializer gets; no engine impact.
  */
object HtmlRenderer {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def page(title: String, body: String): String =
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title></head>
       |<body><h1>${esc(title)}</h1>$body</body></html>""".stripMargin

  /** Service directory: layer list with ids (html.py directory page). */
  def serviceDirectory(serviceName: String, layers: Seq[FeatureSchema]): String = {
    val items = layers.zipWithIndex.map { case (l, i) =>
      s"""<li><a href="$i">${esc(l.table)}</a> (${
        esc(l.geometryType.getOrElse("table"))}, max ${l.maxRecordCount})</li>"""
    }.mkString
    page(s"$serviceName (FeatureServer)", s"<ul>$items</ul>")
  }

  /** Layer metadata page: fields table + query link. */
  def layerPage(schema: FeatureSchema, layerId: Int): String = {
    val rows = schema.fields.map(f =>
      s"<tr><td>${esc(f.name)}</td><td>${esc(f.dataType)}</td></tr>").mkString
    page(s"Layer $layerId: ${schema.table}",
      s"""<p>Geometry: ${esc(schema.geometryType.getOrElse("none"))},
         | SRID ${schema.srid}, id field ${esc(schema.idField.getOrElse("__oid"))}</p>
         |<table border="1"><tr><th>field</th><th>type</th></tr>$rows</table>
         |<p><a href="query?where=1%3D1&f=html">query</a></p>""".stripMargin)
  }

  /** Query result table (html.py result page): header from the schema,
    * binary cells rendered as &lt;wkb n bytes&gt;. */
  def resultTable(rows: Seq[Row], schema: StructType, fs: FeatureSchema,
      count: Option[Long]): String = {
    val header = schema.fieldNames.map(n => s"<th>${esc(n)}</th>").mkString
    val body = rows.map { r =>
      val cells = schema.fields.indices.map { i =>
        val v = r.get(i) match {
          case null => ""
          case b: Array[Byte] => s"&lt;wkb ${b.length} bytes&gt;"
          case other => esc(String.valueOf(other))
        }
        s"<td>$v</td>"
      }.mkString
      s"<tr>$cells</tr>"
    }.mkString
    page(s"Query: ${fs.table}",
      s"""<p>${rows.size} rows${count.map(c => s" of $c").getOrElse("")}</p>
         |<table border="1"><tr>$header</tr>$body</table>""".stripMargin)
  }
}
