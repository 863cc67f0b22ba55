"""Dataset tooling: synthetic benchmark systems and converters."""
