"""Training subsystem (reference L4/L5 — SURVEY.md C15, C17–C19)."""
