"""Operator library beyond the reference's surface (SURVEY §2.7, §7 step 8-9):
relational helpers (as-of join, range join, top-k), dedup family, similarity
search, text analysis, multimodal plumbing. All pure DataFrame compositions
unless noted."""
