"""End-to-end pipeline composition."""
