package com.acme.pay.methods

final case class CardPayment(
  card_last4: String = "",
  expiry_month: Int = 0)

object CardPayment {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"CardPayment","namespace":"com.acme.pay.methods","fields":[{"name":"card_last4","type":"string","default":""},{"name":"expiry_month","type":"int","default":0}]}"""
}
