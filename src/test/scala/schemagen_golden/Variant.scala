package com.`acme-labs`.catalog

final case class Variant(
  variant_id: String,
  price_cents: Long = 100L)

object Variant {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"Variant","namespace":"com.acme-labs.catalog","fields":[{"name":"variant_id","type":"string"},{"name":"price_cents","type":"long","default":100}]}"""
}
