package com.acme.pay

/** Multi-branch union of records under a nullable union */
final case class PaymentEvent(
  event_id: String = "",
  amount: Option[Long] = None,
  method: Option[(Option[com.acme.pay.methods.CardPayment], Option[com.acme.pay.methods.BankTransfer], Option[com.acme.pay.methods.StoreCredit])] = None)

object PaymentEvent {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"PaymentEvent","namespace":"com.acme.pay","doc":"Multi-branch union of records under a nullable union","fields":[{"name":"event_id","type":"string","default":""},{"name":"amount","type":["null","long"],"default":null},{"name":"method","type":["null",{"type":"record","name":"CardPayment","namespace":"com.acme.pay.methods","fields":[{"name":"card_last4","type":"string","default":""},{"name":"expiry_month","type":"int","default":0}]},{"type":"record","name":"BankTransfer","namespace":"com.acme.pay.methods","fields":[{"name":"iban_hash","type":"string","default":""}]},{"type":"record","name":"StoreCredit","namespace":"com.acme.pay.methods","fields":[{"name":"voucher_ids","type":{"type":"array","items":"string"},"default":[]}]}],"default":null}]}"""
}
