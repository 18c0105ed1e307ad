"""Command-line entry points (reference layer L4 — SURVEY.md C18/C20/C22/C23):
``python -m tpudet.cli.train`` / ``.eval`` / ``.detect`` / ``.benchmark``."""
