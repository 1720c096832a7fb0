"""Operators: star-schema toolkit (reference parity), dedup family and
similarity search (north-star LLM-pipeline surface)."""
