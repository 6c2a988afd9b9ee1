package com.`acme-labs`.catalog

/** Generated from enum com.acme-labs.catalog.ItemKind. */
object ItemKind extends Enumeration {
  val PHYSICAL: Value = Value("PHYSICAL")
  val DIGITAL: Value = Value("DIGITAL")
}
