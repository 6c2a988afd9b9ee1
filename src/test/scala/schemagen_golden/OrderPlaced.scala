package com.acme.shop

/** A placed order, flat shape with defaults and an enum */
final case class OrderPlaced(
  order_id: String = "",
  amount_cents: Long = 0L,
  discount: Option[Double] = None,
  status: OrderStatus.Value = OrderStatus.PLACED,
  message_id: Option[String] = None,
  timestamp: Option[String] = None)

object OrderPlaced {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"OrderPlaced","namespace":"com.acme.shop","doc":"A placed order, flat shape with defaults and an enum","fields":[{"name":"order_id","type":"string","default":""},{"name":"amount_cents","type":"long","default":0},{"name":"discount","type":["null","double"],"default":null},{"name":"status","type":{"type":"enum","name":"OrderStatus","symbols":["PLACED","SHIPPED","CANCELLED"]},"default":"PLACED"},{"name":"message_id","type":["null","string"],"default":null},{"name":"timestamp","type":["null","string"],"default":null}]}"""
}
