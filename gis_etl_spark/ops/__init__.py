"""Operator packs: relational helpers, dedup, similarity, text analysis."""
