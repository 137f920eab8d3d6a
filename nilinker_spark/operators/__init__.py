"""Distributed operators of the entity-resolution pipeline + corpus ops."""
