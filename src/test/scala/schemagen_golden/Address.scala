package com.acme.shop

final case class Address(
  street: String,
  zip: String,
  unit: Option[Int] = None)

object Address {
  /** Writer/reader schema this class was generated from. */
  val SchemaJson: String =
    """{"type":"record","name":"Address","namespace":"com.acme.shop","fields":[{"name":"street","type":"string"},{"name":"zip","type":"string"},{"name":"unit","type":["null","int"],"default":null}]}"""
}
