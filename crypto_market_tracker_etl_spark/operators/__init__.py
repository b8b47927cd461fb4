"""Relational + extension operators, each a pure DataFrame→DataFrame function."""
