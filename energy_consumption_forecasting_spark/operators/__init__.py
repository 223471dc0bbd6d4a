"""Reusable DataFrame operators (composed Spark primitives)."""
