package com.acme.pay.methods

final case class BankTransfer(
  iban_hash: String = "")

object BankTransfer {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"BankTransfer","namespace":"com.acme.pay.methods","fields":[{"name":"iban_hash","type":"string","default":""}]}"""
}
