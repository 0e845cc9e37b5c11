"""AAC audio decode (in-build libfaad replacement)."""
