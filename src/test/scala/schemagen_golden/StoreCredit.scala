package com.acme.pay.methods

final case class StoreCredit(
  voucher_ids: Seq[String])

object StoreCredit {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"StoreCredit","namespace":"com.acme.pay.methods","fields":[{"name":"voucher_ids","type":{"type":"array","items":"string"},"default":[]}]}"""
}
