"""Config, metrics, logging, profiling, summaries."""
