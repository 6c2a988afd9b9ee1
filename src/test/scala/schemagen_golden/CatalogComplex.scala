package com.`acme-labs`.catalog

/** Map, bytes, fixed, keyword-named field, hyphenated namespace */
final case class CatalogComplex(
  sku: String,
  attrs: Map[String, Long],
  thumbnail: Array[Byte],
  checksum: Array[Byte],
  `type`: ItemKind.Value = ItemKind.PHYSICAL,
  variants: Seq[Variant])

object CatalogComplex {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"CatalogComplex","namespace":"com.acme-labs.catalog","doc":"Map, bytes, fixed, keyword-named field, hyphenated namespace","fields":[{"name":"sku","type":"string"},{"name":"attrs","type":{"type":"map","values":"long"}},{"name":"thumbnail","type":"bytes"},{"name":"checksum","type":{"type":"fixed","name":"Md5","size":16}},{"name":"type","type":{"type":"enum","name":"ItemKind","symbols":["PHYSICAL","DIGITAL"]},"default":"PHYSICAL"},{"name":"variants","type":{"type":"array","items":{"type":"record","name":"Variant","fields":[{"name":"variant_id","type":"string"},{"name":"price_cents","type":"long","default":100}]}}}]}"""
}
