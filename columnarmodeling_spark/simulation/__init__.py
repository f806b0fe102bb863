"""Iterative solver tier (SURVEY §3 E3): the 4D-LSM time loop as
DataFrame micro-batches."""
