"""Relational operator catalog (SURVEY.md §2B).

Each module registers its queries with the central catalog; everything is
expressed through the DataFrame API so Catalyst handles pushdown, pruning,
join selection, and whole-stage codegen.
"""
