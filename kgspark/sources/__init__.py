"""Sources/sinks layer (SURVEY §2.1)."""
