"""Engine operators: index build, scoring, query ops, dedup/ANN, merge, check."""
