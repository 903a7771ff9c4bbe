"""Dataflow operators (SURVEY.md §2) — DataFrame transforms, Catalyst-visible."""
