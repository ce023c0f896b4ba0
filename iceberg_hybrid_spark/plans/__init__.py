"""Plan inspection and guarding utilities."""
