"""CLI entry points (SURVEY.md SS2.9 task drivers, SS2.11 launch scripts)."""
