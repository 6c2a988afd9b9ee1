package com.acme.shop

/** Generated from enum com.acme.shop.OrderStatus. */
object OrderStatus extends Enumeration {
  val PLACED: Value = Value("PLACED")
  val SHIPPED: Value = Value("SHIPPED")
  val CANCELLED: Value = Value("CANCELLED")
}
