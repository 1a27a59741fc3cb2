"""Deterministic synthetic corpus + KB generators and Arrow schemas."""
