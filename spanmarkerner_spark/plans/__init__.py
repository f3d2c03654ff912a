"""Physical-plan concerns: stage tables, lineage, checkpoint-resume."""
