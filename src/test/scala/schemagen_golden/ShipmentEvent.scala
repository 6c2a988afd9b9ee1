package com.acme.shop

final case class ShipmentEvent(
  at_ms: Long,
  note: Option[String] = None)

object ShipmentEvent {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"ShipmentEvent","namespace":"com.acme.shop","fields":[{"name":"at_ms","type":"long"},{"name":"note","type":["null","string"],"default":null}]}"""
}
