"""Data pipeline: wav IO, filelists, segment sampling (host-side numpy)."""
