"""Placeholder — populated in later milestones."""

QUERIES: dict = {}
ORACLE: dict = {}
