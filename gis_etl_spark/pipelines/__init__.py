"""Reference-pipeline renditions: convert/normalize, diagnostics
(ewkb-stats), compaction (merge-pqs), heatmap — each one Spark DAG
replacing the reference's per-file loops (SURVEY.md §3)."""
