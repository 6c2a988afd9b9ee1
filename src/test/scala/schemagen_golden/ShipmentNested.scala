package com.acme.shop

/** Nested record plus array and optional leaf */
final case class ShipmentNested(
  shipment_id: String,
  weight_kg: Float,
  tags: Seq[String],
  destination: Address,
  history: Seq[ShipmentEvent])

object ShipmentNested {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"ShipmentNested","namespace":"com.acme.shop","doc":"Nested record plus array and optional leaf","fields":[{"name":"shipment_id","type":"string"},{"name":"weight_kg","type":"float"},{"name":"tags","type":{"type":"array","items":"string"}},{"name":"destination","type":{"type":"record","name":"Address","fields":[{"name":"street","type":"string"},{"name":"zip","type":"string"},{"name":"unit","type":["null","int"],"default":null}]}},{"name":"history","type":{"type":"array","items":{"type":"record","name":"ShipmentEvent","fields":[{"name":"at_ms","type":"long"},{"name":"note","type":["null","string"],"default":null}]}}}]}"""
}
