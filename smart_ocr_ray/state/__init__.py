"""Cross-run state: partition manifests, checkpoint/resume."""
