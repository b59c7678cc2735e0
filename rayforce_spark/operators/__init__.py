"""Query operators (SURVEY §2.2-2.6)."""
