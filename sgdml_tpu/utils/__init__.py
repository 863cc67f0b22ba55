"""Infrastructure: file schemas, hashing, terminal UI."""
